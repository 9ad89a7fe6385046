"""Pure (non-writing) replay vs the single-process oracle — the engine's
golden-output test in the reference's style (SURVEY.md §5)."""

import ray.data as rd

from aiw_i2b2_etl_ray.pipelines.cdc_replay import replay_table
from aiw_i2b2_etl_ray.sources.changes import read_changes

from .util import assert_table_eq


def test_path_dim_matches_oracle(tiny_changes, tiny_oracle):
    ds = read_changes(tiny_changes)
    out = replay_table(ds, emit="path_dim", num_partitions=8)
    assert_table_eq(out.to_pandas(), tiny_oracle.path_dim, ["repo", "path"])


def test_change_fact_matches_oracle(tiny_changes, tiny_oracle):
    ds = read_changes(tiny_changes)
    out = replay_table(ds, emit="fact", num_partitions=8)
    assert_table_eq(
        out.to_pandas(), tiny_oracle.change_fact, ["repo", "path", "commit_seq"]
    )
