"""Similarity sketches for near-duplicate detection: shingling, MinHash,
SimHash — all vectorized numpy over Arrow batches, deterministic (fixed
seeds, no process state).

These go beyond the reference (which has only exact dedup, SURVEY.md §2.7)
and serve the training-data pipeline ops the engine adds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MERSENNE = np.uint64((1 << 61) - 1)
_MAXH = np.uint64(1 << 61)


def _shingle_strings(text: str, n: int) -> list[str]:
    toks = text.lower().split()
    if not toks:
        return []
    if len(toks) < n:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def distinct_doc_shingle_pairs(
    ids: np.ndarray, texts: pa.Array, n: int, *, as_int64: bool = False
) -> pa.Table:
    """Per-doc DISTINCT (doc_id, shingle-hash) pairs for one batch — one
    flat vectorized shingle pass + the lexsort dedup trick.  Docs never
    split across map_batches batches (a row is atomic), so per-batch
    distinct pairs are globally distinct; summed per-batch partial counts
    downstream ARE distinct counts.  ``as_int64`` re-views the uint64
    xxhash as int64 (wrap bijection) for Ray's sort-based groupby, which
    round-trips keys through Python ints and overflows C long on raw
    uint64.  Shared by dedup.dup_spans and curation.decontaminate's
    distributed arm."""
    out_type = np.int64 if as_int64 else np.uint64
    if len(ids) == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "h": pa.array([], pa.from_numpy_dtype(out_type))}
        )
    hashes, offsets = _batch_shingle_hashes(texts, n)
    di = np.repeat(np.arange(len(ids)), np.diff(offsets))
    order = np.lexsort((hashes, di))
    d_s, h_s = di[order], hashes[order]
    new = np.ones(len(d_s), dtype=bool)
    new[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
    return pa.table(
        {
            "doc_id": pa.array(ids[d_s[new]], pa.int64()),
            "h": pa.array(h_s[new].view(out_type)),
        }
    )


def _batch_shingle_hashes(
    texts: pa.Array, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """All docs' shingle hashes in one vectorized pass.

    Returns (flat_hashes uint64, offsets int64[len+1]): doc i's shingles are
    flat[offsets[i]:offsets[i+1]].  Hashing is polars xxhash64 over the flat
    shingle list (C-speed); only tokenization is Python.
    """
    import polars as pl

    flat: list[str] = []
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    for i, v in enumerate(texts):
        s = v.as_py()
        sh = _shingle_strings(s, n) if s else []
        flat.extend(sh)
        offsets[i + 1] = len(flat)
    if not flat:
        return np.empty(0, dtype=np.uint64), offsets
    hashes = pl.Series(flat).hash(seed=3).to_numpy().astype(np.uint64)
    return hashes, offsets


def _token_ngrams(text: str, n: int) -> np.ndarray:
    """Hashes of one doc's word n-gram shingles (used by pairwise jaccard)."""
    import polars as pl

    sh = _shingle_strings(text, n)
    if not sh:
        return np.empty(0, dtype=np.uint64)
    return pl.Series(sh).hash(seed=3).to_numpy().astype(np.uint64)


def _perm_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    texts: pa.Array | pa.ChunkedArray, *, num_perm: int = 64, ngram: int = 3, seed: int = 1
) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signature matrix.

    Universal-hash permutations h_i(x) = (a_i*x + b_i) mod p over shingle
    hashes; the per-doc min is a vectorized (shingles x perms) reduction.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    a, b = _perm_params(num_perm, seed)
    flat, offsets = _batch_shingle_hashes(texts, ngram)
    n = len(texts)
    sigs = np.full((n, num_perm), _MAXH, dtype=np.uint64)
    if not len(flat):
        return sigs
    # Vectorized across docs: hash ALL shingles x perms in memory-bounded
    # chunks (aligned to doc boundaries) and segment-min per doc via
    # np.minimum.reduceat — no per-doc Python loop.  uint64 wrap-around
    # keeps this a valid (if not mathematically mod-p) universal-ish
    # family; all that matters is determinism + uniformity.
    CHUNK_SHINGLES = 200_000  # x num_perm x 8B ~ 100 MB working set
    start = 0
    with np.errstate(over="ignore"):
        while start < n:
            end = start
            while end < n and offsets[end + 1] - offsets[start] <= CHUNK_SHINGLES:
                end += 1
            end = max(end, start + 1)  # a single huge doc still processes
            lo, hi = offsets[start], offsets[end]
            if hi > lo:
                hv = (flat[lo:hi, None] * a[None, :] + b[None, :]) % _MERSENNE
                lens = np.diff(offsets[start : end + 1])
                nz = lens > 0
                if nz.any():
                    # empty docs occupy no rows, so consecutive nonempty
                    # starts bound each doc's rows exactly
                    segs = (offsets[start:end] - lo)[nz]
                    sigs[np.arange(start, end)[nz]] = np.minimum.reduceat(
                        hv, segs, axis=0
                    )
            start = end
    return sigs


def lsh_bands(sigs: np.ndarray, *, bands: int = 16) -> np.ndarray:
    """(n_docs, bands) uint64 band keys: hash of each band's rows.  Docs
    sharing any (band_id, band_key) are LSH candidates."""
    n, num_perm = sigs.shape
    rows = num_perm // bands
    out = np.empty((n, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for bi in range(bands):
            seg = sigs[:, bi * rows : (bi + 1) * rows]
            h = np.full(n, 14695981039346656037, dtype=np.uint64)
            for r in range(rows):
                h = (h ^ seg[:, r]) * np.uint64(1099511628211)
            out[:, bi] = h
    return out


def simhash64(texts: pa.Array | pa.ChunkedArray, *, ngram: int = 2) -> np.ndarray:
    """64-bit SimHash per document (sign of per-bit weighted sums over
    shingle hashes)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    flat, offsets = _batch_shingle_hashes(texts, ngram)
    out = np.zeros(len(texts), dtype=np.uint64)
    bit_idx = np.arange(64, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(len(texts)):
            sh = flat[offsets[i] : offsets[i + 1]]
            if not len(sh):
                continue
            bits = (sh[:, None] >> bit_idx[None, :]) & np.uint64(1)  # (sh, 64)
            votes = bits.sum(axis=0).astype(np.int64) * 2 - len(sh)
            out[i] = np.packbits((votes > 0)[::-1]).view(">u8")[0]
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise Hamming distance between uint64 arrays (vectorized popcount)."""
    x = a ^ b
    cnt = np.zeros_like(x, dtype=np.uint8)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.uint8)
        x >>= np.uint64(1)
    return cnt


def jaccard(a: str, b: str, *, ngram: int = 3) -> float:
    """Exact n-gram Jaccard between two texts (verification step)."""
    sa, sb = set(_token_ngrams(a, ngram).tolist()), set(_token_ngrams(b, ngram).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))
