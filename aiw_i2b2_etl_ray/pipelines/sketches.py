"""Mergeable-sketch aggregates: the scale path for wide aggregations whose
exact forms (grouped COUNT DISTINCT, exact quantiles in
``pipelines/window_funcs.py``) require a group's rows to meet on one worker.

Both sketches here are *mergeable partials*: each batch emits a tiny
fixed-size summary, summaries fold associatively in a keyed groupby, and
only the final fold looks at the whole group — so the shuffle carries
O(groups × sketch_size) bytes no matter how many raw rows exist.  This is
the same partial-combine discipline as the engine's count/sum aggregates,
extended to cardinality and quantiles.

* HyperLogLog (Flajolet et al. 2007, with the linear-counting small-range
  correction) — deterministic (fixed xxhash seed), so results are stable
  across runs/cluster sizes, but hash-defined: no SQL oracle (rows-only
  driver check); the accuracy contract is pinned by an error-bound pytest.
* Fixed-bin histogram quantile — fully deterministic arithmetic binning,
  so it DOES have a DuckDB oracle replicating the binning; the sketch is a
  (group, bin)->count table folded by sum.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

from ..util import worker_runtime_env

HLL_P = 12  # 2^12 registers -> ~1.6% standard error
HLL_M = 1 << HLL_P


def _hll_registers(keys: pl.Series) -> np.ndarray:
    """Vectorized register array for one batch of key strings."""
    h = keys.hash(seed=7).to_numpy().astype(np.uint64)
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    # rho = position of the leftmost 1-bit in the remaining 64-p bits;
    # leading-zero count via a 6-step vectorized binary reduction
    cur = rest.copy()
    lz = np.zeros(len(h), dtype=np.uint64)
    for s in (32, 16, 8, 4, 2, 1):
        s64 = np.uint64(s)
        mask = cur < (np.uint64(1) << (np.uint64(64) - s64))
        lz = np.where(mask, lz + s64, lz)
        cur = np.where(mask, cur << s64, cur)
    rho = (lz + 1).astype(np.uint8)
    regs = np.zeros(HLL_M, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _hll_estimate(regs: np.ndarray) -> int:
    m = float(HLL_M)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting small-range correction
    return int(round(est))


def approx_distinct_users(sf_dir: str) -> rd.Dataset:
    """Approximate COUNT(DISTINCT user_id) per event_type via HLL.

    Plan: per-batch per-group register arrays (map_batches combiner) ->
    keyed groupby folds registers with elementwise max -> estimate.  The
    shuffle moves 4 KiB per (batch, group), independent of row count."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).with_columns(pl.col("user_id").cast(pl.Utf8))
        types, blobs = [], []
        for (et,), g in df.group_by("event_type"):
            types.append(et)
            blobs.append(_hll_registers(g["user_id"]).tobytes())
        return pa.table({"event_type": pa.array(types, pa.string()),
                         "regs": pa.array(blobs, pa.binary())})

    def fold(g: pa.Table) -> pa.Table:
        regs = np.zeros(HLL_M, dtype=np.uint8)
        for blob in g["regs"]:
            np.maximum(regs, np.frombuffer(blob.as_py(), dtype=np.uint8), out=regs)
        return pa.table(
            {
                "event_type": pa.array([g["event_type"][0].as_py()], pa.string()),
                "n_users_approx": pa.array([_hll_estimate(regs)], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", **worker_runtime_env())
        .groupby("event_type")
        .map_groups(fold, batch_format="pyarrow")
    )


# --- histogram quantile sketch ---------------------------------------------

HIST_LO = 0.0
HIST_HI = 512.0
HIST_BINS = 1024
HIST_W = (HIST_HI - HIST_LO) / HIST_BINS  # 0.5


def approx_median_hist(sf_dir: str) -> rd.Dataset:
    """Approximate per-event_type median of ``value`` from a fixed-bin
    histogram sketch: answer = left edge of the first bin whose cumulative
    count reaches half the total (error <= one bin width, here 0.5).

    The sketch is the mergeable (event_type, bin)->count table: per-batch
    bincount partials, one small keyed groupby sum, per-type scan of 1024
    cumulative counts.  Deterministic arithmetic -> exact DuckDB oracle."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).drop_nulls("value")
        v = df["value"].to_numpy()
        b = np.clip(((v - HIST_LO) / HIST_W).astype(np.int64), 0, HIST_BINS - 1)
        return (
            df.with_columns(pl.Series("bin", b))
            .group_by(["event_type", "bin"])
            .agg(pl.len().cast(pl.Int64).alias("pn"))
            .to_arrow()
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", **worker_runtime_env())
        .groupby(["event_type", "bin"])
        .aggregate(Sum("pn", alias_name="n"))
    )

    def median_from_hist(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g).sort("bin")
        cum = df["n"].to_numpy().cumsum()
        total = cum[-1]
        # first bin where cumulative count >= ceil(total/2)
        i = int(np.searchsorted(cum, (total + 1) // 2, side="left"))
        edge = HIST_LO + df["bin"][i] * HIST_W
        return pa.table(
            {
                "event_type": pa.array([df["event_type"][0]], pa.string()),
                "median_approx": pa.array([float(edge)], pa.float64()),
            }
        )

    return hist.groupby("event_type").map_groups(median_from_hist, batch_format="pyarrow")


SQL_APPROX_MEDIAN_HIST = f"""
WITH binned AS (
  SELECT event_type,
         CAST(least(greatest(floor((value - {HIST_LO}) / {HIST_W}), 0), {HIST_BINS - 1}) AS BIGINT) AS bin
  FROM events WHERE value IS NOT NULL
),
hist AS (
  SELECT event_type, bin, COUNT(*) AS n FROM binned GROUP BY event_type, bin
),
cum AS (
  SELECT event_type, bin,
         SUM(n) OVER (PARTITION BY event_type ORDER BY bin) AS c,
         SUM(n) OVER (PARTITION BY event_type) AS tot
  FROM hist
)
SELECT event_type,
       MIN({HIST_LO} + bin * {HIST_W}) AS median_approx
FROM cum WHERE c >= CAST(ceil(tot / 2.0) AS BIGINT)
GROUP BY event_type
"""
