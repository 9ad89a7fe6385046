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
