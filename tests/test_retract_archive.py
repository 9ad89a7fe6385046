"""Source-system-scoped retraction (J7 delete-by-source) + the archive
table (replaced rows are kept, ARCHIVE_OBSERVATION_FACT analog)."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from aiw_i2b2_etl_ray.config import ReplaySpec
from aiw_i2b2_etl_ray.pipelines.cdc_replay import replay
from aiw_i2b2_etl_ray.pipelines.retract import retract_source


def _mk(rows, seq0):
    n = len(rows)
    return pa.table(
        {
            "repo": pa.array([r for r, _, _ in rows]),
            "path": pa.array([p for _, p, _ in rows]),
            "commit": pa.array([f"c{seq0+i}" for i in range(n)]),
            "lang": pa.array([l for _, _, l in rows]),
            "content": pa.array([f"b{seq0+i}" for i in range(n)], pa.large_string()),
            "commit_seq": pa.array(np.arange(seq0, seq0 + n, dtype=np.int64)),
            "op": pa.array(["U"] * n),
        }
    )


def _write(tmp_path, name, t):
    d = str(tmp_path / name)
    os.makedirs(d)
    pq.write_table(t, os.path.join(d, "p.parquet"))
    return d


def test_archive_keeps_replaced_rows(tmp_path):
    t1 = _mk([("r", "a.py", "py"), ("r", "b.go", "go")], 0)
    t2 = _mk([("r", "a.py", "py")], 10)  # overwrites a.py only
    d1, d2 = _write(tmp_path, "r1", t1), _write(tmp_path, "r2", t2)
    spec = ReplaySpec(out_dir=str(tmp_path / "out"), num_partitions=4,
                      salt_buckets=1, hot_key_threshold=0)
    replay(d1, spec, run_id="a1")
    spec_u = ReplaySpec(out_dir=spec.out_dir, num_partitions=4, salt_buckets=1,
                        hot_key_threshold=0, mode="update")
    replay(d2, spec_u, run_id="a2")

    arch_files = glob.glob(os.path.join(spec.out_dir, "archive", "*.parquet"))
    assert arch_files, "no archive written"
    arch = pa.concat_tables([pq.read_table(f) for f in arch_files])
    assert len(arch) == 1
    row = arch.to_pylist()[0]
    assert (row["repo"], row["path"]) == ("r", "a.py")
    assert row["last_commit_seq"] == 0      # the displaced run-1 state
    assert row["replaced_by_seq"] == 10     # the run-2 winner
    assert row["archived_run_id"] == "a2"


def test_retract_source_deletes_across_partitions(tmp_path):
    rows = [("r%d" % (i % 3), f"f{i}.x", "py" if i % 2 == 0 else "go")
            for i in range(40)]
    t = _mk(rows, 0)
    d = _write(tmp_path, "in", t)
    spec = ReplaySpec(out_dir=str(tmp_path / "out"), num_partitions=4,
                      salt_buckets=1, hot_key_threshold=0)
    replay(d, spec, run_id="x1")

    summary = retract_source(spec.out_dir, {"go"})
    assert summary["facts_retracted"] == 20
    assert summary["paths_retracted"] == 20

    facts = pa.concat_tables(
        [pq.read_table(f) for f in glob.glob(os.path.join(spec.out_dir, "change_fact", "*.parquet"))]
    )
    assert len(facts.filter(pc.equal(facts["lang"], "go"))) == 0
    assert len(facts) == 20
    pdim = pa.concat_tables(
        [pq.read_table(f) for f in glob.glob(os.path.join(spec.out_dir, "path_dim", "*.parquet"))]
    )
    assert len(pdim.filter(pc.equal(pdim["lang"], "go"))) == 0
    # retracted facts archived, not destroyed
    ret = glob.glob(
        os.path.join(spec.out_dir, "archive", "retractions", "*", "retracted-fact-*.parquet")
    )
    assert sum(pq.ParquetFile(f).metadata.num_rows for f in ret) == 20
    # merge-written archive table stays uniformly readable (ARCHIVE schema
    # only at archive/*.parquet — retraction files live in their own subdir)
    for f in glob.glob(os.path.join(spec.out_dir, "archive", "*.parquet")):
        assert "retracted-fact" not in os.path.basename(f)
    # dims re-folded: lang_dim no longer lists 'go'; live counts updated
    lang_dim = pq.read_table(os.path.join(spec.out_dir, "lang_dim", "lang_dim.parquet"))
    assert "go" not in lang_dim["lang"].to_pylist()
    repo_dim = pq.read_table(os.path.join(spec.out_dir, "repo_dim", "repo_dim.parquet")).to_pandas().set_index("repo")
    assert int(repo_dim["n_paths_live"].sum()) == 20

    # a SECOND retraction must not clobber the first one's history
    summary2 = retract_source(spec.out_dir, {"py"})
    assert summary2["facts_retracted"] == 20
    ret2 = glob.glob(
        os.path.join(spec.out_dir, "archive", "retractions", "*", "retracted-fact-*.parquet")
    )
    assert sum(pq.ParquetFile(f).metadata.num_rows for f in ret2) == 40, (
        "second retraction overwrote the first's archive"
    )
