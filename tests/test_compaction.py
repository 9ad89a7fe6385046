"""LSM compaction: hot-run files folded back into canonical partitions."""

import glob
import os

from aiw_i2b2_etl_ray.config import ReplaySpec
from aiw_i2b2_etl_ray.pipelines.cdc_replay import replay
from aiw_i2b2_etl_ray.stages.merge import compact_path_dim, load_path_dim

from .util import assert_table_eq


def test_compaction_preserves_state(tmp_path, tiny_changes, tiny_oracle):
    spec = ReplaySpec(
        out_dir=str(tmp_path / "out"),
        num_partitions=8,
        salt_buckets=4,
        hot_key_threshold=50,
    )
    replay(tiny_changes, spec, run_id="c1")
    assert glob.glob(os.path.join(spec.out_dir, "path_dim", "hot-*.parquet"))

    moved = compact_path_dim(spec.out_dir, spec.num_partitions)
    assert moved > 0
    assert not glob.glob(os.path.join(spec.out_dir, "path_dim", "hot-*.parquet"))
    assert_table_eq(load_path_dim(spec.out_dir), tiny_oracle.path_dim, ["repo", "path"])


def test_compaction_keeps_repo_dim_correct_after_update(tmp_path):
    """The re-homed-hot-key live-count case: replay with a salted mega key,
    compact, then an update run that never touches that key — repo_dim must
    still count the mega repo's live paths (the dimension partial is
    refreshed by compaction)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aiw_i2b2_etl_ray import oracle
    from aiw_i2b2_etl_ray.sources.changes import read_changes_table

    from .util import assert_table_eq

    n = 1200
    # run 1: everything churns one hot key in repo 'mega'
    t1 = pa.table(
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
    # run 2 (tail): only a different repo's events
    t2 = pa.table(
        {
            "repo": pa.array(["other"] * 10),
            "path": pa.array([f"f{i}" for i in range(10)]),
            "commit": pa.array([f"d{i}" for i in range(10)]),
            "lang": pa.array(["go"] * 10),
            "content": pa.array([f"w{i}" for i in range(10)], pa.large_string()),
            "commit_seq": pa.array(np.arange(n, n + 10, dtype=np.int64)),
            "op": pa.array(["U"] * 10),
        }
    )
    d1, d2 = str(tmp_path / "r1"), str(tmp_path / "r2")
    os.makedirs(d1), os.makedirs(d2)
    pq.write_table(t1, os.path.join(d1, "p.parquet"))
    pq.write_table(t2, os.path.join(d2, "p.parquet"))
    golden = oracle.replay(pa.concat_tables([t1, t2]))

    spec = ReplaySpec(
        out_dir=str(tmp_path / "out"), num_partitions=8, salt_buckets=4, hot_key_threshold=100
    )
    replay(d1, spec, run_id="k1")
    compact_path_dim(spec.out_dir, spec.num_partitions)
    spec_u = ReplaySpec(
        out_dir=spec.out_dir, num_partitions=8, salt_buckets=4, hot_key_threshold=100, mode="update"
    )
    replay(d2, spec_u, run_id="k2")

    import pyarrow.parquet as _pq
    import glob as _glob

    repo_dim = _pq.read_table(
        os.path.join(spec.out_dir, "repo_dim", "repo_dim.parquet")
    ).to_pandas().set_index("repo")
    assert repo_dim.loc["mega", "n_paths_live"] == 1, repo_dim
    assert repo_dim.loc["other", "n_paths_live"] == 10
    assert_table_eq(load_path_dim(spec.out_dir), golden.path_dim, ["repo", "path"])
