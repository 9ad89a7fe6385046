"""Hashing kernels: content digests, stable partition keys, fingerprints.

- ``sha256_hex`` implements the per-row content invariant required by
  BASELINE.json (`content sha256 equality`).
- ``bucket_hash`` is the shuffle partitioner: a stable 64-bit xxhash of the
  key columns (via polars, vectorized) reduced mod num_buckets.  Stability
  matters only within one engine version (recorded in the manifest); the
  correctness oracle never depends on partition placement.
"""

from __future__ import annotations

import hashlib

import numpy as np
import polars as pl
import pyarrow as pa

_EMPTY_SHA = hashlib.sha256(b"").hexdigest()


def sha256_hex(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Hex sha256 of each utf8 value; null stays null.

    Per-row loop is unavoidable for a cryptographic digest; hashlib runs the
    compression in C so the Python overhead is ~1 µs/row, amortized across
    map_batches tasks.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    sha = hashlib.sha256
    # to_pylist + list comprehension is ~25% faster than per-element
    # pyarrow-scalar boxing and keeps the loop body pure-C (encode+digest).
    out = [
        None if s is None else sha(s.encode("utf-8")).hexdigest()
        for s in col.to_pylist()
    ]
    return pa.array(out, type=pa.string())


def sha256_bin(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Raw 32-byte sha256 digests — the shuffle-side representation (half
    the bytes of hex; hex-encode only at the output edge)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    sha = hashlib.sha256
    out = [
        None if s is None else sha(s.encode("utf-8")).digest()
        for s in col.to_pylist()
    ]
    return pa.array(out, type=pa.binary())


def bin_to_hex(col) -> pa.Array:
    """Vectorized binary->hex (polars kernel)."""
    import polars as pl

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pa.array(
        pl.Series(pl.from_arrow(col)).bin.encode("hex").to_list(), pa.string()
    )


def bucket_hash(
    t: pa.Table, cols: list[str], num_buckets: int, *, seed: int = 0
) -> pa.Array:
    """Stable vectorized hash of ``cols`` mod ``num_buckets`` -> int32.

    Uses polars' xxhash64 on the concatenated key (separator chosen to be
    collision-safe for '/'-bearing paths)."""
    df = pl.from_arrow(t.select(cols))
    h = df.select(
        pl.concat_str([pl.col(c).fill_null("\x00") for c in cols], separator="\x1f")
        .hash(seed=seed)
        .alias("h")
    )["h"].to_numpy()
    return pa.array((h % np.uint64(num_buckets)).astype(np.int32))


def rolling_fingerprint(col: pa.Array | pa.ChunkedArray, *, window: int = 8) -> pa.Array:
    """Document fingerprint: min-of-rolling-polynomial-hash over the byte
    stream (a winnowing-style fingerprint), vectorized with numpy.

    Near-identical documents (same bytes) share fingerprints; used by the
    text-analysis query family, not by the CDC core.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    base = np.uint64(1099511628211)
    out = np.zeros(len(col), dtype=np.uint64)
    for i, v in enumerate(col):
        s = v.as_py()
        if not s:
            continue
        b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(b) < window:
            acc = np.uint64(0)
            for x in b:
                acc = acc * base + x
            out[i] = acc
            continue
        # rolling polynomial hash of each window via cumulative powers
        n = len(b) - window + 1
        pw = np.empty(window, dtype=np.uint64)
        pw[0] = np.uint64(1)
        for k in range(1, window):
            pw[k] = pw[k - 1] * base
        # windows matrix-free: sum b[i+k] * base^(window-1-k)
        acc = np.zeros(n, dtype=np.uint64)
        for k in range(window):
            acc += b[k : k + n] * pw[window - 1 - k]
        out[i] = acc.min()
    return pa.array(out.astype(np.int64).astype(object), type=pa.int64())
