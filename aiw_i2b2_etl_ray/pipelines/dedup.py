"""Deduplication family over the ``documents`` table — the training-data
ops the engine adds beyond the reference's exact dedup (SURVEY.md §2.7).

All sketches are deterministic (fixed seeds); exact + embedding variants
have DuckDB oracles, the sketch-based ones (minhash/simhash/ngram) are
hash-defined and rows-only checked.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions import sketch
from ..functions.hashing import sha256_hex
from ..functions.numeric import round_half_away

# --- exact dedup ------------------------------------------------------------


def dedup_exact(sf_dir: str) -> rd.Dataset:
    """Exact dedup: sha256(text) -> hash-partition groupby -> keep min
    doc_id per digest (first-writer-wins, the provider-dedup pattern ST3)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def digest(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "text_sha256": sha256_hex(t["text"])})

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "text_sha256": [g["text_sha256"].iloc[0]],
                "keep_doc_id": [g["doc_id"].min()],
                "n_copies": [np.int64(len(g))],
            }
        )

    return (
        ds.map_batches(digest, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text_sha256")
        .map_groups(keep_first, batch_format="pandas")
    )


SQL_DEDUP_EXACT = """
SELECT sha256(text)             AS text_sha256,
       MIN(doc_id)              AS keep_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents GROUP BY sha256(text)
"""


# --- MinHash + LSH near-dup --------------------------------------------------

MINHASH_PERMS = 64
MINHASH_BANDS = 16
JACCARD_TAU = 0.6


def dedup_minhash_pairs(sf_dir: str) -> pd.DataFrame:
    """MinHash+LSH near-duplicate pairs: per-batch signatures -> explode to
    (band_id, band_key, doc) rows -> groupby band bucket -> candidate pairs
    -> exact n-gram Jaccard verification >= tau.

    The LSH explode multiplies rows by `bands`, but each carries only
    (ids + 8-byte key); texts ride along only at this test scale — at 100 TB
    the verify step would re-fetch text by doc_id from the source instead
    (documented partitioning assumption: bucket fits one group task).
    """
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        sigs = sketch.minhash_signatures(t["text"], num_perm=MINHASH_PERMS)
        bands = sketch.lsh_bands(sigs, bands=MINHASH_BANDS)  # (n, B)
        n, B = bands.shape
        return pa.table(
            {
                "band_id": pa.array(np.repeat(np.arange(B, dtype=np.int32), n)),
                "band_key": pa.array(bands.T.reshape(-1).astype(np.int64)),
                "doc_id": pa.array(np.tile(t["doc_id"].to_numpy(), B)),
                "text": pa.array(list(t["text"].to_pylist()) * B, pa.string()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(columns=["doc_a", "doc_b", "jaccard"])
        g = g.sort_values("doc_id").drop_duplicates("doc_id")
        rows = []
        ids = g["doc_id"].to_numpy()
        texts = g["text"].to_numpy()
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                jac = sketch.jaccard(texts[i], texts[j])
                if jac >= JACCARD_TAU:
                    rows.append((int(ids[i]), int(ids[j]), round(jac, 4)))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])

    pairs = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["band_id", "band_key"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    # same pair can surface from multiple bands -> global dedup (tiny)
    if len(pairs) == 0:
        return pd.DataFrame(columns=["doc_a", "doc_b", "jaccard"])
    return (
        pairs.drop_duplicates(["doc_a", "doc_b"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


# --- SimHash ----------------------------------------------------------------


def dedup_simhash(sf_dir: str) -> rd.Dataset:
    """Per-doc 64-bit SimHash + its 16-bit prefix bucket: docs sharing a
    bucket are near-dup candidates (Hamming-ball blocking)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def sim(t: pa.Table) -> pa.Table:
        h = sketch.simhash64(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "simhash": pa.array(h.astype(np.int64)),
                "bucket": pa.array((h >> np.uint64(48)).astype(np.int32)),
            }
        )

    return ds.map_batches(sim, batch_format="pyarrow", zero_copy_batch=True)


# --- n-gram Jaccard (blocked exact) -----------------------------------------


def dedup_ngram_jaccard(sf_dir: str) -> pd.DataFrame:
    """Blocked exact n-gram Jaccard: block by (lang, length decile) to bound
    the quadratic verify, then all-pairs within block >= tau."""
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "n_chars"]
    )

    def add_block(t: pa.Table) -> pa.Table:
        blk = (t["n_chars"].to_numpy() // 200).astype(np.int32)
        return t.append_column("len_block", pa.array(blk))

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        rows = []
        ids, texts = g["doc_id"].to_numpy(), g["text"].to_numpy()
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                jac = sketch.jaccard(texts[i], texts[j])
                if jac >= JACCARD_TAU:
                    rows.append((int(ids[i]), int(ids[j]), round(jac, 4)))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])

    out = (
        ds.map_batches(add_block, batch_format="pyarrow")
        .groupby(["lang", "len_block"])
        .map_groups(block_pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(columns=["doc_a", "doc_b", "jaccard"])
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# --- embedding cosine near-dup ----------------------------------------------

# embeddings in the driver tables are near-random (within-label max cosine
# ~0.45); tau is set where a non-trivial pair set exists at test scale.
# Real embedding spaces would use ~0.9+.
COSINE_TAU = 0.4


def dedup_embedding(sf_dir: str) -> pd.DataFrame:
    """Embedding near-dup: within-label blocking, per-block numpy matmul,
    pairs with cosine >= tau.  Label blocking keeps each group one task; at
    scale labels come from a coarse LSH/IVF assignment instead."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(columns=["vec_a", "vec_b", "cosine"])
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True) + 1e-12
        cos = m @ m.T
        iu = np.triu_indices(len(g), k=1)
        mask = cos[iu] >= COSINE_TAU
        return pd.DataFrame(
            {
                "vec_a": ids[iu[0][mask]],
                "vec_b": ids[iu[1][mask]],
                "cosine": round_half_away(cos[iu][mask], 4),
            }
        )

    out = ds.groupby("label").map_groups(block_pairs, batch_format="pandas").to_pandas()
    if len(out) == 0:
        return pd.DataFrame(columns=["vec_a", "vec_b", "cosine"])
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


SQL_DEDUP_EMBEDDING = f"""
WITH e AS (SELECT vec_id, label, embedding FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_cosine_similarity(a.embedding, b.embedding), 4) AS cosine
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= {COSINE_TAU}
"""
