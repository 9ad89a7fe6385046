"""Numeric helpers shared by every query pipeline.

Rounding: numpy/pandas round half-to-even (banker's); DuckDB's ROUND is
half-away-from-zero.  All float outputs that are value-hash compared
against a SQL oracle must round the DuckDB way, via these helpers.
"""

from __future__ import annotations

import numpy as np
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
    """Same, for Arrow arrays (vectorized pyarrow.compute)."""
    return pc.round(col, ndigits=nd, round_mode="half_towards_infinity")


def round_half_away_pl(expr, nd: int = 4):
    """Same, as a polars expression (stays inside the Rust kernel — no
    numpy round-trip for polars-native stages).  Uses the native round
    kernel: a hand-rolled ``floor(|x|*f+0.5)/f`` is NOT safe here — polars
    folds the divide-by-literal into a reciprocal multiply in the wide-
    chunk SIMD path, which lands one ULP off DuckDB's ROUND (e.g.
    8251/10⁴ -> 0.8251000000000001) and breaks value-hash compares."""
    return expr.round(nd, mode="half_away_from_zero")
