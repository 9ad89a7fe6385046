"""Replay variants mirroring the reference's test matrix (SURVEY.md §5):
date-bound filters, update-mode + schema evolution combined."""

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq

from aiw_i2b2_etl_ray import oracle
from aiw_i2b2_etl_ray.config import ReplaySpec
from aiw_i2b2_etl_ray.pipelines.cdc_replay import replay
from aiw_i2b2_etl_ray.sources.changes import read_changes_table
from aiw_i2b2_etl_ray.stages.merge import load_path_dim

from .util import assert_table_eq


def test_seq_bound_replay(tmp_path, tiny_changes):
    """Lower/upper commit_seq bounds (the DateTimeFilter analog,
    I2b2LoadNoDerivedVariablesLowerDateBoundTest.java:56): replaying a
    bounded slice equals the oracle over the same slice."""
    full = read_changes_table(tiny_changes)
    lo, hi = 1000, 4000
    sliced = full.filter(
        pc.and_(
            pc.greater_equal(full["commit_seq"], lo), pc.less(full["commit_seq"], hi)
        )
    )
    golden = oracle.replay(sliced)
    spec = ReplaySpec(
        out_dir=str(tmp_path / "out"),
        num_partitions=4,
        salt_buckets=1,
        hot_key_threshold=0,
        min_seq=lo,
        max_seq=hi,
    )
    replay(tiny_changes, spec)
    assert_table_eq(load_path_dim(spec.out_dir), golden.path_dim, ["repo", "path"])


def test_update_mode_with_evolution_tail(tmp_path, tiny_changes, tiny_oracle):
    """The schema-evolution segment arrives only in the incremental tail
    (head replay sees no `size` column at all); converged state must still
    equal the one-shot golden, with null backfill for old rows."""
    full = read_changes_table(tiny_changes)
    evo_start = int(pc.max(full["commit_seq"]).as_py() * 0.7)  # generator evo point
    head = full.filter(pc.less(full["commit_seq"], evo_start)).drop_columns(["size"])
    tail = full.filter(pc.greater_equal(full["commit_seq"], evo_start))

    d1, d2 = str(tmp_path / "head"), str(tmp_path / "tail")
    os.makedirs(d1), os.makedirs(d2)
    pq.write_table(head, os.path.join(d1, "part-00000.parquet"))
    pq.write_table(tail, os.path.join(d2, "part-00000.parquet"))

    spec = ReplaySpec(out_dir=str(tmp_path / "out"), num_partitions=4, salt_buckets=1, hot_key_threshold=0)
    replay(d1, spec)
    spec_u = ReplaySpec(
        out_dir=spec.out_dir, num_partitions=4, salt_buckets=1, hot_key_threshold=0,
        mode="update", schema_version=2,
    )
    replay(d2, spec_u)
    assert_table_eq(load_path_dim(spec.out_dir), tiny_oracle.path_dim, ["repo", "path"])


def test_update_mode_with_salted_hot_key(tmp_path):
    """Hot-key salting across incremental runs: run 1 salts the churned key
    (its winners live in a hot LSM run); run 2 applies a tail that keeps
    churning it.  Merge-on-read over part files + both runs' hot files must
    converge to the oracle."""
    import numpy as np
    import pyarrow as pa

    n, cut = 3000, 2000
    rng = np.random.default_rng(11)
    hot = rng.random(n) < 0.8
    t = pa.table(
        {
            "repo": pa.array(["mega" if h else "small" for h in hot]),
            "path": pa.array(
                ["hot.c" if h else f"f{p}" for h, p in zip(hot, rng.integers(0, 30, n))]
            ),
            "commit": pa.array([f"c{i}" for i in range(n)]),
            "lang": pa.array(["c"] * n),
            "content": pa.array([f"v{i}" for i in range(n)], pa.large_string()),
            "commit_seq": pa.array(np.arange(n, dtype=np.int64)),
            "op": pa.array(["U"] * n),
        }
    )
    golden = oracle.replay(t)

    d1, d2 = str(tmp_path / "r1"), str(tmp_path / "r2")
    os.makedirs(d1), os.makedirs(d2)
    pq.write_table(t.filter(pc.less(t["commit_seq"], cut)), os.path.join(d1, "p.parquet"))
    # tail with 10% redelivery overlap
    pq.write_table(
        t.filter(pc.greater_equal(t["commit_seq"], int(cut * 0.9))),
        os.path.join(d2, "p.parquet"),
    )

    spec = ReplaySpec(
        out_dir=str(tmp_path / "out"), num_partitions=8, salt_buckets=4, hot_key_threshold=200
    )
    replay(d1, spec, run_id="u1")
    spec_u = ReplaySpec(
        out_dir=spec.out_dir, num_partitions=8, salt_buckets=4, hot_key_threshold=200, mode="update"
    )
    replay(d2, spec_u, run_id="u2")
    assert_table_eq(load_path_dim(spec.out_dir), golden.path_dim, ["repo", "path"])


def test_hot_key_set_persists_across_runs(tmp_path):
    """The exactly-once hazard the job manifest closes: run 1 salts a hot
    key; run 2's detection would NOT flag it (high threshold) but redelivers
    overlapping events.  The persisted hot set keeps the routing stable, so
    the redelivered events hit the watermarked salted partitions and apply
    zero new rows."""
    import glob as _glob

    import numpy as np
    import pyarrow as pa

    n, cut = 2000, 1500
    t = pa.table(
        {
            "repo": pa.array(["mega"] * n),
            "path": pa.array(["hot.c"] * n),
            "commit": pa.array([f"c{i}" for i in range(n)]),
            "lang": pa.array(["c"] * n),
            "content": pa.array([f"v{i}" for i in range(n)], pa.large_string()),
            "commit_seq": pa.array(np.arange(n, dtype=np.int64)),
            "op": pa.array(["U"] * n),
        }
    )
    golden = oracle.replay(t)
    d1, d2 = str(tmp_path / "r1"), str(tmp_path / "r2")
    os.makedirs(d1), os.makedirs(d2)
    pq.write_table(t.filter(pc.less(t["commit_seq"], cut)), os.path.join(d1, "p.parquet"))
    # tail redelivers HALF of run 1 plus the new events
    pq.write_table(
        t.filter(pc.greater_equal(t["commit_seq"], cut // 2)), os.path.join(d2, "p.parquet")
    )

    spec1 = ReplaySpec(
        out_dir=str(tmp_path / "out"), num_partitions=8, salt_buckets=4, hot_key_threshold=100
    )
    replay(d1, spec1, run_id="h1")
    # run 2: threshold so high this run would never salt by itself
    spec2 = ReplaySpec(
        out_dir=spec1.out_dir, num_partitions=8, salt_buckets=4,
        hot_key_threshold=10_000_000, mode="update",
    )
    replay(d2, spec2, run_id="h2")
    assert_table_eq(load_path_dim(spec1.out_dir), golden.path_dim, ["repo", "path"])
    # exactly-once on facts: total rows across all fact files == oracle's
    fact_rows = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in _glob.glob(os.path.join(spec1.out_dir, "change_fact", "*.parquet"))
    )
    assert fact_rows == len(golden.change_fact), "redelivered events re-applied!"


def test_update_partitioning_mismatch_rejected(tmp_path, tiny_changes):
    spec = ReplaySpec(out_dir=str(tmp_path / "out"), num_partitions=8, salt_buckets=1, hot_key_threshold=0)
    replay(tiny_changes, spec)
    bad = ReplaySpec(out_dir=spec.out_dir, num_partitions=16, salt_buckets=1, hot_key_threshold=0, mode="update")
    import pytest

    with pytest.raises(ValueError, match="partitioning mismatch"):
        replay(tiny_changes, bad)


def test_wal_tail_microbatches(tmp_path, tiny_changes, tiny_oracle):
    """The binlog/WAL-tail usage pattern: the log arrives as K sequential
    micro-batches applied in update mode (each with a redelivered overlap);
    converged state equals the one-shot replay."""
    full = read_changes_table(tiny_changes)
    max_seq = pc.max(full["commit_seq"]).as_py()
    K = 5
    bounds = [int(max_seq * i / K) for i in range(K + 1)]
    bounds[-1] = max_seq + 1

    spec0 = ReplaySpec(out_dir=str(tmp_path / "out"), num_partitions=4, salt_buckets=1, hot_key_threshold=0)
    for i in range(K):
        lo = max(0, bounds[i] - 200)  # overlap: redelivered events
        hi = bounds[i + 1]
        sl = full.filter(
            pc.and_(pc.greater_equal(full["commit_seq"], lo), pc.less(full["commit_seq"], hi))
        )
        d = str(tmp_path / f"b{i}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(sl, os.path.join(d, "p.parquet"))
        spec = ReplaySpec(
            out_dir=spec0.out_dir, num_partitions=4, salt_buckets=1, hot_key_threshold=0,
            mode="replace" if i == 0 else "update",
        )
        replay(d, spec, run_id=f"mb{i}")
    assert_table_eq(load_path_dim(spec0.out_dir), tiny_oracle.path_dim, ["repo", "path"])
