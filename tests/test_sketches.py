"""Accuracy and mergeability contracts for the sketch aggregates.

The HLL has no SQL oracle (hash-defined); these tests ARE its correctness
gate: bounded relative error vs the exact distinct count, and register-fold
associativity (split input -> same estimate), which is what makes the
partial-combine plan valid at any partitioning."""

import numpy as np
import polars as pl
import pytest

from aiw_i2b2_etl_ray.pipelines import sketches as sk

SF = "/root/testdata/sf0.001"


def test_hll_error_bound_vs_exact(ray_session):
    import duckdb

    approx = sk.approx_distinct_users(SF).to_pandas()
    con = duckdb.connect()
    exact = con.sql(
        f"SELECT event_type, COUNT(DISTINCT user_id) AS n "
        f"FROM read_parquet('{SF}/events.parquet') GROUP BY event_type"
    ).df()
    m = approx.merge(exact, on="event_type")
    assert len(m) == len(exact)
    rel = (m["n_users_approx"] - m["n"]).abs() / m["n"]
    # p=12 -> ~1.6% sigma; 5% is > 3 sigma
    assert rel.max() <= 0.05, m.to_string()


def test_hll_register_fold_is_associative():
    keys = pl.Series([f"user-{i}" for i in range(5000)])
    whole = sk._hll_registers(keys)
    # arbitrary 3-way split, folded pairwise in a different order
    a = sk._hll_registers(keys.slice(0, 1700))
    b = sk._hll_registers(keys.slice(1700, 1300))
    c = sk._hll_registers(keys.slice(3000, 2000))
    folded = np.maximum(np.maximum(c, a), b)
    assert np.array_equal(folded, whole)
    est = sk._hll_estimate(whole)
    assert abs(est - 5000) / 5000 <= 0.05


def test_hll_estimate_small_range_linear_counting():
    keys = pl.Series([f"k{i}" for i in range(30)])
    est = sk._hll_estimate(sk._hll_registers(keys))
    assert est == 30  # linear counting is near-exact far below m


def test_hist_median_within_one_bin_of_exact(ray_session):
    import duckdb

    approx = sk.approx_median_hist(SF).to_pandas()
    con = duckdb.connect()
    exact = con.sql(
        f"SELECT event_type, median(value) AS md "
        f"FROM read_parquet('{SF}/events.parquet') GROUP BY event_type"
    ).df()
    m = approx.merge(exact, on="event_type")
    assert (m["median_approx"] - m["md"]).abs().max() <= sk.HIST_W + 1e-9
