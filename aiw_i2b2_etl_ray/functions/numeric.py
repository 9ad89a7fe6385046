"""Numeric helpers shared by every query pipeline.

Rounding: numpy/pandas round half-to-even (banker's); DuckDB's ROUND is
half-away-from-zero.  All float outputs that are value-hash compared
against a SQL oracle must round the DuckDB way, via these helpers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def round_half_away(x, nd: int = 4):
    """Half-away-from-zero rounding for numpy arrays / pandas Series."""
    f = 10.0**nd
    arr = np.asarray(x, dtype=np.float64)
    out = np.sign(arr) * np.floor(np.abs(arr) * f + 0.5) / f
    if hasattr(x, "index"):  # pandas Series in, Series out
        import pandas as pd

        return pd.Series(out, index=x.index, name=getattr(x, "name", None))
    return out


def round_half_away_pc(col, nd: int = 4):
    """Same, for Arrow arrays (vectorized pyarrow.compute).

    NOT ``pc.round``: Arrow's round passes a value that sits one ULP
    above an exactly-representable-at-nd-decimals double through
    UNCHANGED (e.g. round(127084565.24000001, 2) -> 127084565.24000001),
    while DuckDB's scale-then-true-divide returns the canonical nearest
    double (127084565.24).  Sums of floats land on such neighbors
    depending on block combination order, so the pc.round path made
    every ROUND(SUM(..)) oracle hash FLAKY.  floor(|x|*f + 0.5)/f with a
    true IEEE division is canonical for these neighbors: the
    correctly-rounded quotient IS the nearest double to the decimal
    value, matching DuckDB on every oracle input to date.  (Not strictly
    bit-identical in ALL cases: DuckDB computes std::round(x*f)/f, and
    when |x|*f lands one ULP BELOW a half-integer the +0.5 here can tip
    floor one integer high where std::round stays low — an adversarial
    boundary no aggregate output has hit; it also matches the numpy
    helper above, so both engine paths agree with each other.)"""
    f = 10.0**nd
    x = pc.cast(col, pa.float64())
    mag = pc.divide(pc.floor(pc.add(pc.multiply(pc.abs(x), f), 0.5)), f)
    return pc.multiply(pc.cast(pc.sign(x), pa.float64()), mag)


def round_half_away_pl(expr, nd: int = 4):
    """Same, as a polars expression (stays inside the Rust kernel — no
    numpy round-trip for polars-native stages).  Uses the native round
    kernel: a hand-rolled ``floor(|x|*f+0.5)/f`` is NOT safe here — polars
    folds the divide-by-literal into a reciprocal multiply in the wide-
    chunk SIMD path, which lands one ULP off DuckDB's ROUND (e.g.
    8251/10⁴ -> 0.8251000000000001) and breaks value-hash compares."""
    return expr.round(nd, mode="half_away_from_zero")
