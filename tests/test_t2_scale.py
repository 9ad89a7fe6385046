"""t2-scale correctness (FIXTURES.md: ~100k events / 50 repos): the full
checkpointed replay at a scale where every partition is non-trivial."""

import pytest

from aiw_i2b2_etl_ray import oracle
from aiw_i2b2_etl_ray.config import ReplaySpec
from aiw_i2b2_etl_ray.pipelines.cdc_replay import replay
from aiw_i2b2_etl_ray.sources.changes import read_changes_table
from aiw_i2b2_etl_ray.sources.synth import generate_changes
from aiw_i2b2_etl_ray.stages.merge import load_path_dim

from .util import assert_table_eq


@pytest.fixture(scope="module")
def t2_changes(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("t2"))
    generate_changes(
        d, 100_000, n_repos=50, paths_per_repo=80, seed=42, rows_per_file=25_000
    )
    return d


def test_t2_full_replay(tmp_path, t2_changes):
    golden = oracle.replay(read_changes_table(t2_changes))
    spec = ReplaySpec(
        out_dir=str(tmp_path / "out"),
        num_partitions=32,
        salt_buckets=4,
        hot_key_threshold=3000,  # the churned hot path qualifies
    )
    summary = replay(t2_changes, spec)
    assert_table_eq(load_path_dim(spec.out_dir), golden.path_dim, ["repo", "path"])
    assert summary["lineage"]["rows_applied"] == len(golden.change_fact)
    assert summary["lineage"]["dups_dropped"] == golden.counters["dups_dropped"]
