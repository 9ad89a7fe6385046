"""Unit tests for the sparse lexical (tf-idf) retrieval read
(pipelines/retrieval.py); oracle parity runs in test_queries_vs_duckdb."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from aiw_i2b2_etl_ray.pipelines import retrieval as rt


def _write_docs(tmp_path, texts, row_group_size=4):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["synth"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    d = str(tmp_path / "ret")
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, os.path.join(d, "documents.parquet"), row_group_size=row_group_size)
    return d


def test_term_topk_scores_and_tiebreak(tmp_path, monkeypatch):
    """Hand-checkable corpus: idf_t = (N - df_t)/df_t; score sums in
    fixed term order; equal scores cut by doc_id ascending."""
    monkeypatch.setattr(rt, "TOPK_DOCS", 3)
    texts = [
        "spark spark window",  # tf=(2,1,0)
        "spark window",        # tf=(1,1,0) — tie with doc 2
        "window spark",        # tf=(1,1,0) — tie with doc 1
        "merge",               # tf=(0,0,1)
        "noise words only",    # score 0 -> dropped
        "noise again",
    ]
    d = _write_docs(tmp_path, texts)
    out = rt.term_topk(d)
    n = 6
    dfs = {"spark": 3, "window": 3, "merge": 1}
    idf = {t: (n - dfs[t]) / dfs[t] for t in dfs}
    # scores: doc0 = 2*1 + 1*1 = 3; doc1 = doc2 = 2; doc3 = 5
    assert list(out["doc_id"]) == [3, 0, 1]  # doc1 beats doc2 on id only
    assert list(out["score"]) == [idf["merge"], 3.0, 2.0]


def test_term_topk_no_matches_returns_typed_empty(tmp_path):
    d = _write_docs(tmp_path, ["nothing here", "still nothing"])
    out = rt.term_topk(d)
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "score"]


def test_term_topk_topk_fold_across_many_blocks(tmp_path, monkeypatch):
    """The global fold must pick the true top-k when every block holds
    only a couple of candidates (k-per-block partials, tiny row groups)."""
    monkeypatch.setattr(rt, "TOPK_DOCS", 5)
    texts = [f"spark {' spark' * (i % 7)} filler" for i in range(40)]
    texts += ["filler only"] * 5  # keep df < N so idf_spark > 0
    d = _write_docs(tmp_path, texts, row_group_size=3)
    out = rt.term_topk(d)
    assert len(out) == 5
    # max tf is 7 ('spark' + 6 repeats) at i%7==6 -> ids 6,13,20,27,34
    assert list(out["doc_id"]) == [6, 13, 20, 27, 34]
