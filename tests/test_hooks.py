"""Run-level pre/post hook surface (the EK_PRE_HOOK / EK_POST_HOOK +
disable/enable-indexes extension points of the reference's handler,
dest/I2b2QueryResultsHandler.java:97-161, 1116-1139)."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from aiw_i2b2_etl_ray.config import ReplaySpec, resolve_hook
from aiw_i2b2_etl_ray.pipelines.cdc_replay import replay
from aiw_i2b2_etl_ray.stages.merge import load_path_dim

from .util import assert_table_eq

HOOK_LOG: list[tuple] = []


def log_pre(spec, run_id):
    HOOK_LOG.append(("pre", run_id, os.path.isdir(os.path.join(spec.out_dir, "path_dim"))))
    return {"marker": "pre-ran"}


def log_post(spec, run_id, summary):
    # post fires only after outputs + manifest are durably committed
    manifest = os.path.join(spec.out_dir, "_manifest")
    HOOK_LOG.append(
        ("post", run_id, os.path.isdir(manifest), summary["lineage"]["rows_applied"])
    )
    return {"marker": "post-ran"}


def test_hooks_fire_in_order_and_record_results(tmp_path, tiny_changes, tiny_oracle):
    HOOK_LOG.clear()
    spec = ReplaySpec(
        out_dir=str(tmp_path / "out"),
        num_partitions=8,
        pre_hook="tests.test_hooks:log_pre",
        post_hook="tests.test_hooks:log_post",
    )
    summary = replay(tiny_changes, spec, run_id="h1")
    assert [e[0] for e in HOOK_LOG] == ["pre", "post"]
    pre, post = HOOK_LOG
    assert pre[2] is False  # pre ran before any output mutation
    assert post[2] is True  # post ran after manifest commit
    applied = summary["lineage"]["rows_applied"]
    assert post[3] == applied and applied > 0
    assert summary["pre_hook"] == {"marker": "pre-ran"}
    assert summary["post_hook"] == {"marker": "post-ran"}
    assert_table_eq(load_path_dim(spec.out_dir), tiny_oracle.path_dim, ["repo", "path"])


def test_missing_hook_fails_before_clearing_outputs(tmp_path, tiny_changes, tiny_oracle):
    """A replace-mode run configured with a nonexistent hook must fail
    BEFORE it clears the previous run's tables (the reference fails the
    load when a configured proc is missing)."""
    out = str(tmp_path / "out")
    replay(tiny_changes, ReplaySpec(out_dir=out, num_partitions=8), run_id="m1")
    bad = ReplaySpec(
        out_dir=out, num_partitions=8, post_hook="aiw_i2b2_etl_ray.pipelines.hooks:nope"
    )
    with pytest.raises(AttributeError):
        replay(tiny_changes, bad, run_id="m2")
    # prior warehouse intact
    assert_table_eq(load_path_dim(out), tiny_oracle.path_dim, ["repo", "path"])


def test_shipped_post_compact_and_stats(tmp_path):
    """The shipped payloads: post_compact folds hot files, post_stats_refresh
    writes the _stats side table with true per-table row counts."""
    import numpy as np
    import pyarrow as pa

    from aiw_i2b2_etl_ray import oracle

    def mk(commits, seq0):
        n = len(commits)
        return pa.table(
            {
                "repo": pa.array(["mega"] * n),
                "path": pa.array(["hot.c"] * n),
                "commit": pa.array(commits),
                "lang": pa.array(["c"] * n),
                "content": pa.array([f"{c}-body" for c in commits], pa.large_string()),
                "commit_seq": pa.array(np.arange(seq0, seq0 + n, dtype=np.int64)),
                "op": pa.array(["U"] * n),
            }
        )

    t1 = mk([f"a{i}" for i in range(600)], 0)
    t2 = mk([f"b{i}" for i in range(600)], 600)
    d1, d2 = str(tmp_path / "r1"), str(tmp_path / "r2")
    os.makedirs(d1), os.makedirs(d2)
    pq.write_table(t1, os.path.join(d1, "p.parquet"))
    pq.write_table(t2, os.path.join(d2, "p.parquet"))

    hook = "aiw_i2b2_etl_ray.pipelines.hooks:post_compact_and_stats"
    spec = ReplaySpec(
        out_dir=str(tmp_path / "out"),
        num_partitions=8,
        salt_buckets=4,
        hot_key_threshold=100,
        post_hook=hook,
    )
    replay(d1, spec, run_id="s1")
    spec_u = ReplaySpec(
        out_dir=spec.out_dir,
        num_partitions=8,
        salt_buckets=4,
        hot_key_threshold=100,
        mode="update",
        post_hook=hook,
    )
    s2 = replay(d2, spec_u, run_id="s2")
    # compaction ran inside the post hook: at most one hot file remains
    assert len(glob.glob(os.path.join(spec.out_dir, "path_dim", "hot-*.parquet"))) <= 1
    assert "post_hook" in s2 and "stats_tables" in s2["post_hook"]
    stats = pq.read_table(os.path.join(spec.out_dir, "_stats", "stats.parquet")).to_pandas()
    assert stats.set_index("table_name").loc["change_fact", "n_rows"] == 1200
    golden = oracle.replay(pa.concat_tables([t1, t2]))
    assert_table_eq(load_path_dim(spec.out_dir), golden.path_dim, ["repo", "path"])


def test_resolve_hook_roundtrip():
    fn = resolve_hook("aiw_i2b2_etl_ray.pipelines.hooks:post_compact")
    assert callable(fn)
    with pytest.raises(ValueError):
        ReplaySpec(out_dir="/tmp/x", pre_hook="not-a-dotted-path")
