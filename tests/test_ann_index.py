"""Persistent incremental IVF index: frozen-quantizer convergence with
the batch pipeline, incremental growth, and bounded probing."""

import pyarrow.dataset as pads

from aiw_i2b2_etl_ray.pipelines.ann_index import (
    ann_index_query,
    ann_index_update,
    ann_incremental,
)
from aiw_i2b2_etl_ray.pipelines.similarity import ann_ivf_topk

SF_DIR = "/root/testdata/sf0.001"


def test_two_increment_build_matches_batch_pipeline(tmp_path):
    """Quantizer frozen at creation => incremental adds assign exactly as
    the one-shot pipeline does, so queries over the persisted lists must
    return the batch result byte-for-byte."""
    out = str(tmp_path / "wh")
    s1 = ann_index_update(
        SF_DIR, out, row_filter=(pads.field("vec_id") < 600), run_id="r1"
    )
    assert s1["trained"] is True and s1["vectors_added"] > 0
    s2 = ann_index_update(
        SF_DIR, out, row_filter=(pads.field("vec_id") >= 600), run_id="r2"
    )
    assert s2["trained"] is False and s2["total_runs"] == 2

    got = ann_index_query(SF_DIR, out).reset_index(drop=True)
    want = ann_ivf_topk(SF_DIR).reset_index(drop=True)
    assert got.equals(want), "incremental index diverged from batch IVF"


def test_catalog_entry_matches_batch(tmp_path):
    got = ann_incremental(SF_DIR).reset_index(drop=True)
    want = ann_ivf_topk(SF_DIR).reset_index(drop=True)
    assert got.equals(want)


def test_later_update_does_not_retrain(tmp_path):
    """Centroids persisted at creation are immutable: a second update must
    reuse them (trained=False) even when its slice would train different
    ones — the property that keeps old and new assignments consistent."""
    import numpy as np
    import pyarrow.parquet as pq

    out = str(tmp_path / "wh")
    ann_index_update(SF_DIR, out, row_filter=(pads.field("vec_id") < 300), run_id="a")
    before = pq.read_table(f"{out}/ann_index/centroids.parquet")
    s = ann_index_update(
        SF_DIR, out, row_filter=(pads.field("vec_id") >= 300), run_id="b"
    )
    assert s["trained"] is False
    after = pq.read_table(f"{out}/ann_index/centroids.parquet")
    assert before.equals(after)
    a = np.stack(before["centroid"].to_pandas().to_numpy())
    assert a.shape[0] == 16


def test_ann_compaction_preserves_query_results(tmp_path):
    from aiw_i2b2_etl_ray.pipelines.ann_index import ann_index_compact

    out = str(tmp_path / "wh")
    ann_index_update(SF_DIR, out, row_filter=(pads.field("vec_id") < 400), run_id="c1")
    ann_index_update(SF_DIR, out, row_filter=(pads.field("vec_id") >= 400), run_id="c2")
    before = ann_index_query(SF_DIR, out).reset_index(drop=True)
    assert ann_index_compact(out)["runs_folded"] == 2
    after = ann_index_query(SF_DIR, out).reset_index(drop=True)
    assert before.equals(after)


def test_duplicated_run_window_cannot_evict_true_neighbors(tmp_path):
    """Crashed-compaction window: the compacted run is renamed in before
    the source runs are deleted, so the same vec_id can transiently exist
    in two runs of a list.  Per-list vec_id dedup runs BEFORE the top-k
    partition, so queries in that window must equal the clean result
    (duplicates may not occupy multiple k slots and evict a distinct
    neighbor)."""
    import glob
    import os
    import shutil

    out = str(tmp_path / "wh")
    ann_index_update(SF_DIR, out, run_id="r1")
    clean = ann_index_query(SF_DIR, out).reset_index(drop=True)

    run = sorted(glob.glob(os.path.join(out, "ann_index", "lists", "run-*")))[0]
    shutil.copytree(run, run.replace("run-", "run-zdup-"))
    dup = ann_index_query(SF_DIR, out).reset_index(drop=True)
    assert dup.equals(clean), "duplicated vectors perturbed the top-k"
