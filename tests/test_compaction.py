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
