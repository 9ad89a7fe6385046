"""Persistent incremental MinHash-LSH dedup index: per-update pair
emission, cross-increment discovery, and exact convergence of the union
of per-run candidates with the one-shot LSH candidate set."""

import os

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from aiw_i2b2_etl_ray.pipelines.dedup import dedup_minhash_pairs
from aiw_i2b2_etl_ray.pipelines.dedup_index import index_update


def _write_docs(d, texts, start_id=0):
    os.makedirs(d, exist_ok=True)
    t = pa.table(
        {
            "doc_id": pa.array(range(start_id, start_id + len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["synth"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    return d


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden trees "
)


def _corpus():
    texts = []
    # docs 0/1: near-dups of each other (both in increment 1)
    texts.append(BASE + "every single morning")
    texts.append(BASE + "every single evening")
    # docs 2..5: unrelated
    for i in range(4):
        texts.append(f"completely different content number {i} " * 8)
    # doc 6: near-dup of doc 0, arrives in increment 2
    texts.append(BASE + "every single morning indeed")
    return texts


def test_cross_increment_pair_found_and_old_pairs_not_reemitted(tmp_path):
    d = _write_docs(str(tmp_path / "docs"), _corpus())
    out = str(tmp_path / "wh")

    s1, c1 = index_update(d, out, row_filter=(pads.field("doc_id") < 6), run_id="r1")
    p1 = set(map(tuple, c1.to_pandas()[["doc_a", "doc_b"]].itertuples(index=False)))
    assert (0, 1) in p1  # both-new pair found in its own increment

    s2, c2 = index_update(d, out, row_filter=(pads.field("doc_id") >= 6), run_id="r2")
    p2 = set(map(tuple, c2.to_pandas()[["doc_a", "doc_b"]].itertuples(index=False)))
    assert s2["prior_runs"] == 1
    assert (0, 6) in p2  # NEW doc matched against PERSISTED state
    assert (0, 1) not in p2  # old-old pair not re-emitted


def test_union_of_increments_equals_one_shot(tmp_path):
    d = _write_docs(str(tmp_path / "docs"), _corpus())
    inc_out = str(tmp_path / "inc")
    _, c1 = index_update(d, inc_out, row_filter=(pads.field("doc_id") < 4), run_id="a")
    _, c2 = index_update(d, inc_out, row_filter=(pads.field("doc_id") >= 4), run_id="b")
    union = set(map(tuple, c1.to_pandas()[["doc_a", "doc_b"]].itertuples(index=False)))
    union |= set(map(tuple, c2.to_pandas()[["doc_a", "doc_b"]].itertuples(index=False)))

    one_out = str(tmp_path / "one")
    _, call = index_update(d, one_out, run_id="all")
    one = set(map(tuple, call.to_pandas()[["doc_a", "doc_b"]].itertuples(index=False)))
    assert union == one

    # and the verified one-shot equals the batch pipeline's result
    batch = dedup_minhash_pairs(d).to_pandas().sort_values(["doc_a", "doc_b"])
    assert {(0, 1), (0, 6)}.issubset(
        set(map(tuple, batch[["doc_a", "doc_b"]].itertuples(index=False)))
    )


def test_compaction_preserves_pair_discovery(tmp_path):
    """Folding run dirs into one canonical run must not change what a
    later update discovers (bucket membership is a union)."""
    from aiw_i2b2_etl_ray.pipelines.dedup_index import index_compact

    d = _write_docs(str(tmp_path / "docs"), _corpus())

    plain, compacted = str(tmp_path / "p"), str(tmp_path / "c")
    for out, compact in ((plain, False), (compacted, True)):
        _, _ = index_update(out_dir=out, sf_dir=d, row_filter=(pads.field("doc_id") < 3), run_id="x1")
        _, _ = index_update(out_dir=out, sf_dir=d, row_filter=(pads.field("doc_id") == 3), run_id="x2")
        if compact:
            assert index_compact(out)["runs_folded"] == 2
        _, c = index_update(out_dir=out, sf_dir=d, row_filter=(pads.field("doc_id") > 3), run_id="x3")
        pairs = set(map(tuple, c.to_pandas()[["doc_a", "doc_b"]].itertuples(index=False)))
        if compact:
            assert pairs == plain_pairs
            assert (0, 6) in pairs
        else:
            plain_pairs = pairs


def test_empty_update_slice_is_noop(tmp_path):
    d = _write_docs(str(tmp_path / "docs"), _corpus())
    out = str(tmp_path / "wh")
    index_update(d, out, run_id="full")
    s, c = index_update(
        d, out, row_filter=(pads.field("doc_id") > 10_000), run_id="empty"
    )
    assert s["new_band_rows"] == 0 and s["candidate_pairs"] == 0
    assert c.count() == 0


def test_crashed_compaction_window_tolerated(tmp_path):
    """Rename-in-before-delete: if a crash leaves BOTH the compacted run
    and the originals, pair discovery is unchanged (duplicate band rows
    fold in the bucket unique) and a compaction re-run converges."""
    import glob as _glob
    import shutil

    from aiw_i2b2_etl_ray.pipelines.dedup_index import _run_dirs, index_compact

    d = _write_docs(str(tmp_path / "docs"), _corpus())
    out = str(tmp_path / "wh")
    index_update(d, out, row_filter=(pads.field("doc_id") < 6), run_id="k1")
    # simulate the crash window: compacted run landed, originals survive
    src = _run_dirs(out)[0]
    shutil.copytree(src, src.replace("run-k1", "run-compacted-deadbeef"))
    _, c = index_update(d, out, row_filter=(pads.field("doc_id") >= 6), run_id="k2")
    pairs = set(map(tuple, c.to_pandas()[["doc_a", "doc_b"]].itertuples(index=False)))
    assert (0, 6) in pairs and (0, 1) not in pairs
    assert index_compact(out)["runs_folded"] == 3
    assert len(_run_dirs(out)) == 1
