"""Sparse lexical retrieval over the document corpus: tf-idf relevance
top-k for a fixed query-term set — the retrieval-side curation read
(query-relevance selection / retrieval-based decontamination both start
exactly here).  The reference's analog is the concept-hierarchy
prefix-count reporting pushed into source SQL
(dsb/I2B2DataSourceBackend.java:256-290) — a fixed small "query" driving
counts over a large corpus.

Parity discipline: the score is a SUM OF FIXED-ORDER IEEE TERMS —
``tf_i * idf_i`` added left-to-right over the literal term list, where
``idf_i = (N - df_i) / df_i`` is one correctly-rounded int64->float64
division.  Both engines evaluate the same expression tree (the SQL
oracle spells the adds out literally rather than SUM() over unnested
rows), so the float64 result is bit-identical and the (score DESC,
doc_id) tie-break cuts the same top-k on both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.numeric import round_half_away
from ..util import worker_runtime_env

#: the fixed query — common tokens of the synthetic corpus vocabulary
TERMS = ("spark", "window", "merge")
TOPK_DOCS = 50


def _tf_exprs():
    """Per-term word-boundary match counts (non-overlapping, RE2-and-
    rust-regex-compatible ``\\b`` anchors — same count as DuckDB's
    regexp_extract_all length)."""
    return [
        pl.col("text").str.count_matches(rf"\b{t}\b").cast(pl.Int64).alias(f"tf_{t}")
        for t in TERMS
    ]


def term_topk(sf_dir: str) -> pd.DataFrame:
    """Top-``TOPK_DOCS`` documents by tf-idf relevance to ``TERMS``.

    Plan — two streaming passes, nothing corpus-sized ever shuffles:
    1. DF pass: each batch emits ONE row of per-term document-frequency
       partials (+ batch doc count); a tiny sum-fold yields N and df_i.
       The idf vector (len == |TERMS|) broadcasts as plain floats.
    2. Score pass: vectorized per-batch tf counts -> fixed-order score
       -> per-batch local top-k partials (k rows per batch) -> k-sized
       driver fold, exactly the ``ann_topk`` pattern
       (pipelines/similarity.py:38).  Docs matching no term score 0 and
       are dropped before the partial (the top-k over "relevant docs")."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def df_partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).select(_tf_exprs())
        row = {f"df_{t}": [int((df[f"tf_{t}"] > 0).sum())] for t in TERMS}
        row["n"] = [len(df)]
        return pa.table(row)

    parts = ds.map_batches(
        df_partial, batch_format="pyarrow", **worker_runtime_env()
    ).materialize()
    n_docs = int(parts.sum("n") or 0)
    dfs = {t: int(parts.sum(f"df_{t}") or 0) for t in TERMS}
    # one correctly-rounded division per term — bit-identical to the
    # oracle's CASE-guarded (N - df) / df
    idf = [((n_docs - dfs[t]) / dfs[t]) if dfs[t] else 0.0 for t in TERMS]

    def score_topk(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).select([pl.col("doc_id")] + _tf_exprs())
        tf = [df[f"tf_{term}"].to_numpy() for term in TERMS]
        score = np.zeros(len(df), dtype=np.float64)
        for tf_i, idf_i in zip(tf, idf):  # FIXED term order, like the SQL
            score = score + tf_i * idf_i
        keep = score > 0.0
        ids, score = df["doc_id"].to_numpy()[keep], score[keep]
        k = min(TOPK_DOCS, len(ids))
        if k == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "s": pa.array([], pa.float64())}
            )
        # local top-k on (score DESC, doc_id ASC) — same tie-break as the cut
        order = np.lexsort((ids, -score))[:k]
        return pa.table({"doc_id": pa.array(ids[order]), "s": pa.array(score[order])})

    mat = ds.map_batches(score_topk, batch_format="pyarrow").materialize()
    folds = [t for t in ray.get(mat.to_arrow_refs()) if len(t)]  # k rows/block
    if not folds:
        return pd.DataFrame(
            {
                "doc_id": pd.array([], dtype="int64"),
                "score": pd.array([], dtype="float64"),
            }
        )
    allp = pa.concat_tables(folds)
    ids, score = allp["doc_id"].to_numpy(), allp["s"].to_numpy()
    order = np.lexsort((ids, -score))[:TOPK_DOCS]
    return pd.DataFrame(
        {"doc_id": ids[order], "score": round_half_away(score[order], 4)}
    )


def _sql_tf(term: str) -> str:
    return f"CAST(len(regexp_extract_all(text, '\\b{term}\\b')) AS BIGINT)"


def _sql_idf(term: str) -> str:
    return (
        f"(SELECT CASE WHEN COUNT(*) FILTER (WHERE {_sql_tf(term)} > 0) = 0 THEN 0.0 "
        f"ELSE (COUNT(*) - COUNT(*) FILTER (WHERE {_sql_tf(term)} > 0)) "
        f"/ CAST(COUNT(*) FILTER (WHERE {_sql_tf(term)} > 0) AS DOUBLE) END FROM documents)"
    )


#: the adds are spelled out literally (t1 + t2 + t3, left-assoc) so the
#: float64 evaluation order matches the engine's fixed-order loop exactly
SQL_TERM_TOPK = f"""
WITH scored AS (
  SELECT doc_id,
         ({_sql_tf(TERMS[0])} * {_sql_idf(TERMS[0])})
       + ({_sql_tf(TERMS[1])} * {_sql_idf(TERMS[1])})
       + ({_sql_tf(TERMS[2])} * {_sql_idf(TERMS[2])}) AS s
  FROM documents
)
SELECT doc_id, ROUND(s, 4) AS score
FROM scored
WHERE s > 0
ORDER BY s DESC, doc_id
LIMIT {TOPK_DOCS}
"""
