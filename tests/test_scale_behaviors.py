"""Scale-behavior tests: salting balance on a mega-churned key, widened-type
schema evolution, CLI entry."""

import glob
import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from aiw_i2b2_etl_ray.config import ReplaySpec, out_paths
from aiw_i2b2_etl_ray.pipelines.cdc_replay import replay
from aiw_i2b2_etl_ray.sources.changes import read_changes_table
from aiw_i2b2_etl_ray import oracle
from aiw_i2b2_etl_ray.stages.merge import load_path_dim

from .util import assert_table_eq


def _churned_log(d: str, n: int = 4000):
    """90% of events hit ONE (repo, path) — the mega-churned-key case."""
    rng = np.random.default_rng(7)
    hot = rng.random(n) < 0.9
    t = pa.table(
        {
            "repo": pa.array(np.where(hot, "mega", "small").tolist()),
            "path": pa.array(
                np.where(hot, "hot.c", rng.integers(0, 40, n).astype(str)).tolist()
            ),
            "commit": pa.array([f"c{i}" for i in range(n)]),
            "lang": pa.array(["c"] * n),
            "content": pa.array([f"v{i}" for i in range(n)], pa.large_string()),
            "commit_seq": pa.array(np.arange(n, dtype=np.int64)),
            "op": pa.array(["U"] * n),
        }
    )
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, os.path.join(d, "part-00000.parquet"))
    return d


def test_salting_balances_churned_key(tmp_path):
    """Without salting, the churned key's events pile into one partition;
    with salting they spread across salt_buckets merge groups — and the
    converged state is identical to the oracle either way."""
    d = _churned_log(str(tmp_path / "log"))
    golden = oracle.replay(read_changes_table(d))

    def max_partition_rows(spec):
        replay(d, spec)
        sizes = [
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(spec.out_dir, "change_fact", "*.parquet"))
        ]
        return max(sizes)

    unsalted = ReplaySpec(
        out_dir=str(tmp_path / "u"), num_partitions=8, salt_buckets=1, hot_key_threshold=0
    )
    salted = ReplaySpec(
        out_dir=str(tmp_path / "s"), num_partitions=8, salt_buckets=4, hot_key_threshold=100
    )
    m_u = max_partition_rows(unsalted)
    m_s = max_partition_rows(salted)
    assert m_s < m_u * 0.5, f"salting should split the churned partition ({m_u} -> {m_s})"
    assert_table_eq(load_path_dim(salted.out_dir), golden.path_dim, ["repo", "path"])


def test_widened_type_evolution(tmp_path):
    """A widened column (size int32 -> int64 across log segments) unifies at
    the read and merges cleanly (Arrow cast path of ensure_columns)."""
    d = str(tmp_path / "log")
    os.makedirs(d)
    base = {
        "repo": ["r"], "path": ["p"], "lang": ["py"],
        "op": ["U"],
    }
    t1 = pa.table(
        {
            **{k: pa.array(v) for k, v in base.items()},
            "commit": pa.array(["c1"]),
            "content": pa.array(["v1"], pa.large_string()),
            "commit_seq": pa.array([1], pa.int64()),
            "size": pa.array([10], pa.int32()),  # narrow
        }
    )
    t2 = pa.table(
        {
            **{k: pa.array(v) for k, v in base.items()},
            "commit": pa.array(["c2"]),
            "content": pa.array(["v2"], pa.large_string()),
            "commit_seq": pa.array([2], pa.int64()),
            "size": pa.array([2**40], pa.int64()),  # widened
        }
    )
    pq.write_table(t1, os.path.join(d, "part-00000.parquet"))
    pq.write_table(t2, os.path.join(d, "part-00001.parquet"))
    spec = ReplaySpec(out_dir=str(tmp_path / "out"), num_partitions=2, salt_buckets=1, hot_key_threshold=0)
    replay(d, spec)
    row = load_path_dim(spec.out_dir).to_pandas().iloc[0]
    assert row["size"] == 2**40 and row["last_commit"] == "c2"


def test_cli_replay_and_status(tmp_path, tiny_changes):
    """python -m aiw_i2b2_etl_ray replay/status — the ray-job-submit unit.
    Runs in a subprocess with its own Ray session."""
    out = str(tmp_path / "out")
    env = dict(os.environ, RAY_ADDRESS="local")
    r = subprocess.run(
        [
            sys.executable, "-m", "aiw_i2b2_etl_ray", "replay",
            "--input", tiny_changes, "--out", out,
            "--num-partitions", "4", "--salt-buckets", "1",
        ],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["lineage"]["rows_applied"] > 0
    s = subprocess.run(
        [sys.executable, "-m", "aiw_i2b2_etl_ray", "status", "--out", out],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=120,
    )
    assert s.returncode == 0
    manifest = json.loads(s.stdout.strip().splitlines()[-1])
    assert len(manifest) == 4


def test_state_cap_slicing_identical(tmp_path):
    """Bounded merge state: replaying a partition LARGER than the injected
    state cap (key-hash sliced, streamed row groups) produces identical
    converged tables and lineage as the unbounded merge — including across
    an update run with prior state."""
    import glob
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aiw_i2b2_etl_ray.config import ReplaySpec
    from aiw_i2b2_etl_ray.pipelines.cdc_replay import replay
    from aiw_i2b2_etl_ray.state import manifest as mf

    from .util import assert_table_eq

    def mk(n, seq0):
        return pa.table(
            {
                "repo": pa.array([f"r{i%7}" for i in range(n)]),
                "path": pa.array([f"f{i%50}.c" for i in range(n)]),
                "commit": pa.array([f"c{seq0+i}" for i in range(n)]),
                "lang": pa.array(["c"] * n),
                "content": pa.array([f"b{seq0+i}" for i in range(n)], pa.large_string()),
                "commit_seq": pa.array(np.arange(seq0, seq0 + n, dtype=np.int64)),
                "op": pa.array(["D" if i % 13 == 0 else "U" for i in range(n)]),
            }
        )

    d1, d2 = str(tmp_path / "in1"), str(tmp_path / "in2")
    os.makedirs(d1), os.makedirs(d2)
    pq.write_table(mk(600, 0), os.path.join(d1, "p.parquet"))
    pq.write_table(mk(400, 600), os.path.join(d2, "p.parquet"))

    outs = {}
    for tag, cap in (("nocap", None), ("cap", 100)):
        spec = ReplaySpec(
            out_dir=str(tmp_path / tag), num_partitions=2, salt_buckets=1,
            hot_key_threshold=0, state_cap_rows=cap,
        )
        replay(d1, spec, run_id="s1")
        spec_u = ReplaySpec(
            out_dir=spec.out_dir, num_partitions=2, salt_buckets=1,
            hot_key_threshold=0, mode="update", state_cap_rows=cap,
        )
        replay(d2, spec_u, run_id="s2")
        rd = {}
        for name in ("path_dim", "change_fact", "archive", "repo_dim"):
            files = sorted(glob.glob(os.path.join(spec.out_dir, name, "*.parquet")))
            rd[name] = pa.concat_tables([pq.read_table(f) for f in files]) if files else None
        rd["wm"] = mf.watermarks(spec.out_dir)
        mt = mf.manifest_table(spec.out_dir)
        rd["lineage"] = {c: sum(mt[c].to_pylist()) for c in ("rows_applied", "dups_dropped", "conflicts_resolved")}
        outs[tag] = rd

    # slicing must have actually engaged: the capped run's fact part files
    # carry multiple streamed row groups (one per key-hash slice)
    cap_fact_files = sorted(
        glob.glob(os.path.join(str(tmp_path / "cap"), "change_fact", "*.parquet"))
    )
    assert max(pq.ParquetFile(f).metadata.num_row_groups for f in cap_fact_files) > 1

    a, b = outs["nocap"], outs["cap"]
    assert a["wm"] == b["wm"]
    assert a["lineage"] == b["lineage"], (a["lineage"], b["lineage"])
    assert_table_eq(a["path_dim"].to_pandas(), b["path_dim"].to_pandas(), ["repo", "path"])
    assert_table_eq(
        a["change_fact"].to_pandas(), b["change_fact"].to_pandas(), ["repo", "path", "commit_seq"]
    )
    assert_table_eq(
        a["archive"].to_pandas(), b["archive"].to_pandas(), ["repo", "path", "last_commit_seq"]
    )
    assert_table_eq(a["repo_dim"].to_pandas(), b["repo_dim"].to_pandas(), ["repo"])


def test_dedup_pair_outputs_are_datasets():
    """The pair-producing dedup family must return streaming Datasets, not
    driver DataFrames: verified near-dup pairs are output-sized (billions
    of rows on a duplicate-heavy 100 TB corpus), so a `.to_pandas()` tail
    would be a driver OOM.  Guards the round-2 verdict's last scale-killer
    from regressing."""
    import ray.data as rd

    from aiw_i2b2_etl_ray.pipelines import dedup as dd
    from aiw_i2b2_etl_ray.pipelines.graph_cc import dedup_clusters

    sf = "/root/testdata/sf0.001"
    for fn in (
        dd.dedup_minhash_pairs,
        dd.dedup_ngram_jaccard,
        dd.dedup_embedding,
        dd.dedup_embedding_ivf,
        dedup_clusters,
    ):
        out = fn(sf)
        assert isinstance(out, rd.Dataset), f"{fn.__name__} returned {type(out)}"
        assert {"doc_a", "doc_b", "vec_a", "vec_b", "doc_id"} & set(
            out.schema().names
        ), fn.__name__


def test_verify_pairs_distributed_branch_matches_small_branch():
    """dedup.py's verify has two physical plans around PAIR_GATHER_LIMIT
    (bounded driver pair-dedup + pruned docs vs fully distributed pair
    dedup + full docs side).  Force the distributed branch by dropping the
    limit to 0 and assert the verified pair set is identical — the branch
    only changes placement, never the result."""
    from aiw_i2b2_etl_ray.pipelines import dedup as dd

    sf = "/root/testdata/sf0.001"

    def pairs_df(ds):
        return (
            ds.to_pandas()
            .sort_values(["doc_a", "doc_b"], kind="mergesort")
            .reset_index(drop=True)
        )

    small = pairs_df(dd.dedup_minhash_pairs(sf))
    assert len(small) > 0, "fixture must contain near-duplicate pairs"
    orig = dd.PAIR_GATHER_LIMIT
    dd.PAIR_GATHER_LIMIT = 0
    try:
        big = pairs_df(dd.dedup_minhash_pairs(sf))
    finally:
        dd.PAIR_GATHER_LIMIT = orig
    import pandas as pd

    pd.testing.assert_frame_equal(big, small)


def test_curation_dropset_distributed_branch(monkeypatch):
    """The duplicate drop-set is output-sized on a duplicate-heavy corpus:
    above DROP_GATHER_LIMIT the curation chain must keep it a Dataset —
    no driver collection, no broadcast — and the anti-join plan must
    produce the identical survivor set as the bounded broadcast plan.
    Warm the pair memo first (its bounded small-branch hop is
    legitimate), then force the distributed branch and ban Dataset
    collection plus ray.put broadcasting for the rest of the chain."""
    import numpy as np
    import ray.data as rd

    from aiw_i2b2_etl_ray.pipelines import curation
    from aiw_i2b2_etl_ray.pipelines import dedup as dd
    from aiw_i2b2_etl_ray.pipelines.curation import corpus_filter

    sf = "/root/testdata/sf0.001"
    dd.minhash_pairs_cached(sf)  # warm the shared pair memo
    baseline = (
        corpus_filter(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )

    monkeypatch.setattr(curation, "DROP_GATHER_LIMIT", 0)

    def banned(*a, **k):
        raise AssertionError("driver-side collection inside the curation chain")

    saved = (rd.Dataset.to_pandas, rd.Dataset.take_all, rd.Dataset.to_arrow_refs)
    rd.Dataset.to_pandas = rd.Dataset.take_all = rd.Dataset.to_arrow_refs = banned
    try:
        out = corpus_filter(sf).materialize()
    finally:
        rd.Dataset.to_pandas, rd.Dataset.take_all, rd.Dataset.to_arrow_refs = saved
    got = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got.equals(baseline), "anti-join plan diverged from broadcast plan"
    assert np.array_equal(got["doc_id"].to_numpy(), baseline["doc_id"].to_numpy())


def test_pack_assign_distributes_language_strata(tmp_path):
    """r04 verdict item #3: packing must NOT hand a whole language to one
    task (groupby(lang).map_groups put the entire English stratum into a
    single sequential cumsum).  pack_assign's two-phase prefix sum works
    per sorted block — force one language across MANY blocks and assert
    (a) the sorted layout really does split the language, and (b) the
    chunk assignment equals the sequential single-pass answer."""
    import os

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from aiw_i2b2_etl_ray.pipelines.mixing import pack_assign

    rng = np.random.default_rng(5)
    n = 4000
    t = pa.table(
        {
            "doc_id": pa.array(rng.permutation(n).astype(np.int64)),
            "lang": pa.array(["en"] * (n - 100) + ["fr"] * 100),
            "n_chars": pa.array(rng.integers(40, 4000, n).astype(np.int64)),
        }
    )
    d = str(tmp_path / "pack")
    os.makedirs(d)
    pq.write_table(t, os.path.join(d, "docs.parquet"), row_group_size=250)

    ds = rd.read_parquet(os.path.join(d, "docs.parquet")).repartition(16)
    # layout premise: the dominant language spans several sorted blocks
    import ray

    refs = ds.sort(["lang", "doc_id"]).materialize().to_arrow_refs()
    en_blocks = sum(
        1
        for b in ray.get(refs)
        if len(b) and "lang" in b.schema.names and "en" in set(b["lang"].to_pylist())
    )
    assert en_blocks > 1, "premise broken: 'en' fit one block"

    got = (
        pack_assign(ds, capacity=512)
        .to_pandas()
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
    )
    df = t.to_pandas().sort_values(["lang", "doc_id"]).reset_index(drop=True)
    toks = (df["n_chars"] // 4).astype("int64")
    cum = toks.groupby(df["lang"]).cumsum()
    want = pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "lang": df["lang"],
            "n_tokens": toks,
            "chunk_id": ((cum - toks) // 512).astype("int64"),
        }
    )
    pd.testing.assert_frame_equal(got, want)


def test_minhash_degenerate_bucket_bounded(monkeypatch, tmp_path):
    """A mass-duplicated corpus (one boilerplate text copied thousands of
    times) lands every copy in the SAME LSH band bucket; uncapped, that
    bucket emits O(n^2) candidate pairs into the exchange.  Above
    BAND_BUCKET_CAP the bucket must collapse exact dups by text digest
    and emit the CC-equivalent sparsification: stars inside each digest
    group plus all-pairs across representatives — O(n + g^2) candidates,
    with the identical transitive closure."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aiw_i2b2_etl_ray.pipelines import dedup as dd

    # two near-dup boilerplates, mass-duplicated (1500 + 500 copies)
    a = "the quick brown fox jumps over the lazy dog again and again ok"
    b = "the quick brown fox jumps over the lazy dog again and again yes"
    docs = [a] * 1500 + [b] * 500
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
            "lang": pa.array(["en"] * len(docs)),
            "source": pa.array(["synth"] * len(docs)),
            "n_chars": pa.array([len(d) for d in docs], pa.int64()),
        }
    )
    d = str(tmp_path / "massdup")
    os.makedirs(d)
    pq.write_table(t, os.path.join(d, "documents.parquet"), row_group_size=200)

    monkeypatch.setattr(dd, "BAND_BUCKET_CAP", 64)
    pairs = dd.dedup_minhash_pairs(d).to_pandas()
    # sparsified: 1499 + 499 stars + <=1 verified rep pair — not ~2M
    assert len(pairs) <= 2 * len(docs), f"unbounded expansion: {len(pairs)} pairs"
    assert (pairs["jaccard"] >= dd.JACCARD_TAU).all()
    # transitive closure unchanged: every doc connects into one component
    parent = np.arange(len(docs))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for pa_, pb_ in pairs[["doc_a", "doc_b"]].itertuples(index=False):
        parent[find(int(pa_))] = find(int(pb_))
    roots = {find(i) for i in range(len(docs))}
    assert len(roots) == 1, f"sparsification broke connectivity: {len(roots)} comps"


def test_bucket_pairs_capped_orientation():
    """Regression: the capped path's rep-rep pairs were ordered by text
    DIGEST value, not doc id — a reversed (doc_a > doc_b) pair escapes
    the orientation-sensitive drop_duplicates in verify_candidate_pairs
    and the same logical pair from an uncapped bucket of another band
    double-emits.  All emitted pairs must satisfy doc_a < doc_b."""
    import numpy as np
    import pyarrow as pa

    from aiw_i2b2_etl_ray.pipelines.dedup import bucket_pairs

    # two digest groups where the LOWER digest holds the HIGHER doc ids
    ids = np.array([10, 11, 12, 0, 1, 2], dtype=np.int64)
    digs = np.array([5, 5, 5, 9, 9, 9], dtype=np.int64)
    g = pa.table({"doc_id": pa.array(ids), "dig": pa.array(digs)})
    out = bucket_pairs(g, cap=3).to_pandas()
    assert (out["doc_a"] < out["doc_b"]).all(), out
    # stars: 11->10, 12->10, 1->0, 2->0; rep pair oriented (0, 10)
    assert {(0, 10)} <= set(map(tuple, out[["doc_a", "doc_b"]].to_numpy()))


def test_decontaminate_distributed_branch(monkeypatch):
    """The benchmark shingle set is corpus-proportional under the
    doc_id % BENCH_MOD membership rule, so its driver gather is counted
    first: above BENCH_GATHER_LIMIT the screen must switch to the
    semi-join + groupby plan — no driver collection, no ray.put
    broadcast of the hash set — and produce the identical flag set."""
    import ray.data as rd

    from aiw_i2b2_etl_ray.pipelines import curation
    from aiw_i2b2_etl_ray.pipelines.curation import decontaminate

    sf = "/root/testdata/sf0.001"
    baseline = (
        decontaminate(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert len(baseline) > 0, "fixture must produce flagged docs"

    monkeypatch.setattr(curation, "BENCH_GATHER_LIMIT", 0)

    def banned(*a, **k):
        raise AssertionError("driver-side collection inside decontaminate")

    saved = (rd.Dataset.to_pandas, rd.Dataset.take_all, rd.Dataset.to_arrow_refs)
    rd.Dataset.to_pandas = rd.Dataset.take_all = rd.Dataset.to_arrow_refs = banned
    try:
        out = decontaminate(sf).materialize()
    finally:
        rd.Dataset.to_pandas, rd.Dataset.take_all, rd.Dataset.to_arrow_refs = saved
    got = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got, baseline)


def test_verify_pairs_join_fallback_matches_broadcast():
    """Within the bounded-pair branch there are two text-attach plans:
    broadcast searchsorted lookup (candidate texts fit
    TEXT_BROADCAST_LIMIT) vs two bucketed hash joins.  Force the join
    fallback and assert the verified pair set is identical."""
    import pandas as pd

    from aiw_i2b2_etl_ray.pipelines import dedup as dd

    sf = "/root/testdata/sf0.001"

    def pairs_df(ds):
        return (
            ds.to_pandas()
            .sort_values(["doc_a", "doc_b"], kind="mergesort")
            .reset_index(drop=True)
        )

    broadcast = pairs_df(dd.dedup_minhash_pairs(sf))
    orig = dd.TEXT_BROADCAST_LIMIT
    dd.TEXT_BROADCAST_LIMIT = 0
    try:
        joined = pairs_df(dd.dedup_minhash_pairs(sf))
    finally:
        dd.TEXT_BROADCAST_LIMIT = orig
    pd.testing.assert_frame_equal(joined, broadcast)


def test_mix_temperature_rank_stage_never_sees_a_whole_source(tmp_path):
    """The scale contract of mix_temperature: the exact-rank stage only
    receives the hash-threshold SURVIVORS — O(sqrt(c)) per source — never
    the whole source (a per-batch top-quota combiner cannot guarantee
    this because at scale quota >> rows-per-batch-per-source).  Also pins
    the superset property: the selected set equals the brute-force
    ROW_NUMBER-by-md5-rank answer."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from aiw_i2b2_etl_ray.pipelines import mixing as mx

    n = 20_000
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "source": pa.array(["s0"] * n),
        }
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": t["doc_id"],
                "text": pa.array(["x"] * n),
                "lang": pa.array(["en"] * n),
                "source": t["source"],
                "n_chars": pa.array(np.ones(n, dtype=np.int64)),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    ds = rd.read_parquet(str(tmp_path / "documents.parquet"), columns=["doc_id", "source"])
    counts = mx._source_counts(ds)
    assert counts == {"s0": n}
    quota = int(min(n, np.floor(mx.TEMP_SCALE * np.sqrt(float(n)))))
    survivors = mx._mix_survivors(ds, {"s0": quota}, counts)
    n_surv = survivors.count()
    # superset (>= quota) but sublinear (threshold keeps ~2*quota of 20k)
    assert quota <= n_surv < n // 4, (quota, n_surv, n)

    got = mx.mix_temperature(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    exp = con.sql(
        mx.SQL_MIX_TEMPERATURE.replace(
            "FROM documents", f"FROM read_parquet('{tmp_path}/documents.parquet')"
        )
    ).df()
    got = got.sort_values("pick_rank").reset_index(drop=True)
    exp = exp.sort_values("pick_rank").reset_index(drop=True)
    assert len(got) == quota == len(exp)
    assert (got["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()


def test_source_census_partial_bounds_exchange():
    """source_quality's map-side combiner must collapse a block of ANY
    row count to <= |source x lang| partial rows — the shuffle carries
    group-count-bounded partials, never per-doc rows."""
    import pyarrow as pa

    from aiw_i2b2_etl_ray.pipelines.textops import _source_census_partial

    n = 10_000
    t = pa.table(
        {
            "source": pa.array(["web", "books", "web"] * (n // 3 + 1))[:n],
            "lang": pa.array(["en", "en", "de"] * (n // 3 + 1))[:n],
            "text": pa.array([f"doc {i} body" for i in range(n)], pa.string()),
        }
    )
    out = _source_census_partial(t)
    assert out.num_rows == 3  # |source x lang| groups, not 10k rows
    # exact-integer invariants: per-group doc counts sum back to n
    assert sum(out["pd"].to_pylist()) == n
    assert out.schema.field("pt").type == pa.int64()


def test_scaling_root_respects_tmpfs_capacity(monkeypatch, tmp_path):
    """The scaling legs only use /dev/shm when it can actually hold the
    legs' input+output (Docker's default tmpfs is 64 MB — generating the
    2M-event change log there would ENOSPC every leg and fail the whole
    scaling measurement); a too-small or missing tmpfs falls back to
    disk.  Pins bench._pick_scaling_root's branch logic directly."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    class _St:
        def __init__(self, avail_bytes):
            self.f_bavail = avail_bytes // 4096
            self.f_frsize = 4096

    monkeypatch.setattr(bench.os, "statvfs", lambda p: _St(64 * 1024**2))
    assert bench._pick_scaling_root() == "/tmp/aiw_bench_scaling"

    monkeypatch.setattr(bench.os, "statvfs", lambda p: _St(32 * 1024**3))
    assert bench._pick_scaling_root() == "/dev/shm/aiw_bench"

    def _raise(p):
        raise OSError("no /dev/shm")

    monkeypatch.setattr(bench.os, "statvfs", _raise)
    assert bench._pick_scaling_root() == "/tmp/aiw_bench_scaling"
