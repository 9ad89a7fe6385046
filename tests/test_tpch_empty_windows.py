"""Empty-predicate-window parity for the scalar / argmax TPC-H shapes.

The driver compares to_pandas() output against DuckDB, so a query whose
predicate window matches NOTHING must still come back schema-stable
(SQL: SUM over zero rows is NULL; an empty GROUP BY result keeps its
column list).  These tests rebuild each constant-driven query against a
synthetic sf dir whose facts all fall OUTSIDE the query constants —
the case the sf0.001/sf0.01 oracle runs can never reach."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def empty_window_sf(tmp_path_factory):
    """A tiny table set whose rows all miss the q6/q7/q15/q19 constants:
    shipdates in 2005 (outside every window), quantities above every
    q19 box, and a part universe whose brands match no Q19_CASES entry."""
    d = tmp_path_factory.mktemp("sf_empty_windows")
    n = 50
    ship = pa.array(
        [np.datetime64("2005-06-01", "us")] * n, pa.timestamp("us")
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "l_partkey": pa.array(np.arange(n, dtype=np.int64) % 10),
                "l_suppkey": pa.array(np.arange(n, dtype=np.int64) % 5),
                "l_linenumber": pa.array(np.ones(n, dtype=np.int64)),
                "l_quantity": pa.array(np.full(n, 99.0)),
                "l_extendedprice": pa.array(np.full(n, 100.0)),
                "l_discount": pa.array(np.full(n, 0.05)),
                "l_tax": pa.array(np.zeros(n)),
                "l_returnflag": pa.array(["N"] * n),
                "l_linestatus": pa.array(["O"] * n),
                "l_shipdate": ship,
            }
        ),
        str(d / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_custkey": pa.array(np.arange(n, dtype=np.int64) % 7),
                "o_orderstatus": pa.array(["O"] * n),
                "o_totalprice": pa.array(np.full(n, 10.0)),
                "o_orderdate": ship,
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        ),
        str(d / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(10, dtype=np.int64)),
                "p_name": pa.array([f"part{i}" for i in range(10)]),
                "p_brand": pa.array(["Brand#99"] * 10),
                "p_type": pa.array(["STANDARD"] * 10),
                "p_size": pa.array(np.ones(10, dtype=np.int64)),
                "p_retailprice": pa.array(np.full(10, 1.0)),
            }
        ),
        str(d / "part.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(5, dtype=np.int64)),
                "s_name": pa.array([f"supp{i}" for i in range(5)]),
                "s_nationkey": pa.array(np.zeros(5, dtype=np.int64)),
                "s_acctbal": pa.array(np.zeros(5)),
            }
        ),
        str(d / "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(7, dtype=np.int64)),
                "c_name": pa.array([f"cust{i}" for i in range(7)]),
                "c_nationkey": pa.array(np.zeros(7, dtype=np.int64)),
                "c_acctbal": pa.array(np.zeros(7)),
                "c_mktsegment": pa.array(["BUILDING"] * 7),
            }
        ),
        str(d / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0], pa.int64()),
                "n_name": pa.array(["NATION_0"]),
                "n_regionkey": pa.array([0], pa.int64()),
            }
        ),
        str(d / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([0], pa.int64()),
                "r_name": pa.array(["NOWHERE"]),  # never the Q8 region
            }
        ),
        str(d / "region.parquet"),
    )
    return str(d)


def _pdf(res) -> pd.DataFrame:
    return res if isinstance(res, pd.DataFrame) else res.to_pandas()


def test_q6_empty_window_is_null(empty_window_sf):
    from aiw_i2b2_etl_ray.pipelines.tpch_like import tpch_q6

    out = _pdf(tpch_q6(empty_window_sf))
    assert list(out.columns) == ["revenue"]
    assert len(out) == 1 and pd.isna(out["revenue"].iloc[0])


def test_q7_empty_window_keeps_schema(empty_window_sf):
    from aiw_i2b2_etl_ray.pipelines.tpch_like import tpch_q7

    out = _pdf(tpch_q7(empty_window_sf))
    assert sorted(out.columns) == ["cust_nation", "l_year", "revenue", "supp_nation"]
    assert len(out) == 0


def test_q15_empty_window_keeps_schema(empty_window_sf):
    from aiw_i2b2_etl_ray.pipelines.tpch_like import tpch_q15

    out = _pdf(tpch_q15(empty_window_sf))
    assert sorted(out.columns) == ["s_name", "s_suppkey", "total_revenue"]
    assert len(out) == 0


def test_q19_no_matching_boxes_is_null(empty_window_sf):
    from aiw_i2b2_etl_ray.pipelines.tpch_like import tpch_q19

    out = _pdf(tpch_q19(empty_window_sf))
    assert list(out.columns) == ["revenue"]
    assert len(out) == 1 and pd.isna(out["revenue"].iloc[0])


def test_q4_empty_window_keeps_schema(empty_window_sf):
    from aiw_i2b2_etl_ray.pipelines.tpch_like import tpch_q4

    out = _pdf(tpch_q4(empty_window_sf))
    assert sorted(out.columns) == ["o_orderpriority", "order_count"]
    assert len(out) == 0


def test_q8_empty_keysets_keep_schema(empty_window_sf):
    # no region named ASIA and no PROMO parts: every keyset is empty
    from aiw_i2b2_etl_ray.pipelines.tpch_like import tpch_q8

    out = _pdf(tpch_q8(empty_window_sf))
    assert sorted(out.columns) == ["mkt_share", "o_year"]
    assert len(out) == 0


def test_q9_empty_part_keyset_keeps_schema(empty_window_sf):
    # no p_name contains the Q9 token
    from aiw_i2b2_etl_ray.pipelines.tpch_like import tpch_q9

    out = _pdf(tpch_q9(empty_window_sf))
    assert sorted(out.columns) == ["nation", "o_year", "sum_profit"]
    assert len(out) == 0


def test_q10_empty_window_keeps_schema(empty_window_sf):
    # orderdate window empty AND no 'R' returnflags
    from aiw_i2b2_etl_ray.pipelines.tpch_like import tpch_q10

    out = _pdf(tpch_q10(empty_window_sf))
    assert sorted(out.columns) == [
        "c_acctbal",
        "c_custkey",
        "c_name",
        "n_name",
        "revenue",
    ]
    assert len(out) == 0


def test_q19_quantity_filtered_empty_is_null(tmp_path):
    """Joined rows exist but ALL fail the quantity boxes: SQL's SUM over
    zero rows is NULL, and the engine must not collapse it to 0.0."""
    from aiw_i2b2_etl_ray.pipelines.tpch_like import Q19_CASES, tpch_q19

    d = tmp_path / "sf_qty_filtered"
    d.mkdir()
    brand, slo, _shi, _qlo, qhi = Q19_CASES[0]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1], pa.int64()),
                "p_name": pa.array(["thing"]),
                "p_brand": pa.array([brand]),  # inside the brand+size box
                "p_type": pa.array(["STANDARD"]),
                "p_size": pa.array([slo], pa.int64()),
                "p_retailprice": pa.array([1.0]),
            }
        ),
        str(d / "part.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([1, 1], pa.int64()),
                "l_quantity": pa.array([qhi + 50.0] * 2),  # outside EVERY box
                "l_extendedprice": pa.array([100.0] * 2),
                "l_discount": pa.array([0.05] * 2),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    out = _pdf(tpch_q19(str(d)))
    assert list(out.columns) == ["revenue"]
    assert len(out) == 1 and pd.isna(out["revenue"].iloc[0])


def test_q20_empty_prefix_keeps_schema(empty_window_sf):
    # no p_name starts with the Q20 prefix
    from aiw_i2b2_etl_ray.pipelines.tpch_like import tpch_q20

    out = _pdf(tpch_q20(empty_window_sf))
    assert sorted(out.columns) == ["s_name", "s_suppkey"]
    assert len(out) == 0


def test_q3_empty_order_window_keeps_schema(empty_window_sf):
    # all orderdates are after Q3_DATE -> the orders side is empty while
    # lineitems survive their shipdate filter
    from aiw_i2b2_etl_ray.pipelines.tpch_like import tpch_q3

    out = _pdf(tpch_q3(empty_window_sf))
    assert sorted(out.columns) == [
        "o_orderdate",
        "o_orderkey",
        "o_orderpriority",
        "revenue",
    ]
    assert len(out) == 0


def test_q5_empty_region_keeps_schema(empty_window_sf):
    # no region named ASIA: every dimension join side is empty
    from aiw_i2b2_etl_ray.pipelines.tpch_like import tpch_q5

    out = _pdf(tpch_q5(empty_window_sf))
    assert sorted(out.columns) == ["n_name", "revenue"]
    assert len(out) == 0


def test_q22_no_positive_balances_keeps_schema(empty_window_sf):
    # all acctbals are 0 -> the AVG subquery has no rows -> empty result
    from aiw_i2b2_etl_ray.pipelines.tpch_like import tpch_q22

    out = _pdf(tpch_q22(empty_window_sf))
    assert sorted(out.columns) == ["cntrycode", "numcust", "totacctbal"]
    assert len(out) == 0


def test_q13_all_customers_have_orders(empty_window_sf):
    """Zero bucket must be ABSENT when every customer ordered (n_zero=0)."""
    from aiw_i2b2_etl_ray.pipelines.tpch_like import tpch_q13

    out = _pdf(tpch_q13(empty_window_sf)).sort_values("c_count")
    assert 0 not in set(out["c_count"])
    # 50 orders over 7 customers: custkeys 0 get ceil, the histogram
    # totals must cover all 7 ordering customers
    assert int(out["custdist"].sum()) == 7
