"""Edge semantics for the temporal joins and window-function analogs.

Oracle parity at sf0.001 is covered by test_queries_vs_duckdb; these tests
pin the corner cases the oracle data may not hit: as-of inner-drop of
keys with no prior match, and the range join's replicate-to-2-buckets
fold (an interval straddling a bucket boundary must count its matches
exactly once)."""

import numpy as np
import pandas as pd
import pytest

from aiw_i2b2_etl_ray.pipelines import temporal_joins as tj
from aiw_i2b2_etl_ray.pipelines import window_funcs as wf


@pytest.fixture()
def tiny_sf(tmp_path):
    """A minimal sf-dir: 2 users; user 1 has an order BEFORE its event,
    user 2's only order is AFTER its event (as-of must drop it).  One
    order's 7-day window straddles a week boundary with shipments on
    both sides (range join must count both, once each)."""
    d = tmp_path / "sf"
    d.mkdir()
    pd.DataFrame(
        {
            "event_id": [10, 20],
            "ts": pd.to_datetime(["2024-01-10", "2024-01-10"]),
            "user_id": [1, 2],
            "event_type": ["a", "a"],
            "value": [1.0, 2.0],
            "props": ["", ""],
        }
    ).to_parquet(d / "events.parquet")
    pd.DataFrame(
        {
            "o_orderkey": [100, 101, 102],
            "o_custkey": [1, 1, 2],
            "o_orderstatus": ["O"] * 3,
            "o_totalprice": [10.0, 20.0, 30.0],
            # 100/101 same date (tie -> max orderkey); 102 is after user 2's event
            "o_orderdate": pd.to_datetime(["2024-01-05", "2024-01-05", "2024-02-01"]),
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    ).to_parquet(d / "orders.parquet")
    # order 100's window [01-05, 01-12) straddles the epoch-week boundary
    # (1970-01-01 is a Thursday; 2024-01-11 starts an epoch week).
    pd.DataFrame(
        {
            "l_orderkey": [1, 1, 1],
            "l_partkey": [1, 1, 1],
            "l_suppkey": [1, 1, 1],
            "l_linenumber": [1, 2, 3],
            "l_quantity": [2.0, 3.0, 5.0],
            "l_extendedprice": [1.0, 1.0, 1.0],
            "l_discount": [0.0, 0.0, 0.0],
            "l_tax": [0.0, 0.0, 0.0],
            "l_returnflag": ["N"] * 3,
            "l_linestatus": ["O"] * 3,
            # in-window before boundary, in-window after boundary, out-of-window
            "l_shipdate": pd.to_datetime(["2024-01-06", "2024-01-11", "2024-01-20"]),
        }
    ).to_parquet(d / "lineitem.parquet")
    return str(d)


def test_asof_drops_keys_with_no_prior_match_and_breaks_ties(tiny_sf, ray_session):
    out = tj.asof_join_events_orders(tiny_sf).to_pandas()
    assert set(out["event_id"]) == {10}  # user 2 dropped (order after event)
    row = out.iloc[0]
    assert row["o_orderkey"] == 101  # tie on date -> max orderkey wins


def test_range_join_counts_straddling_interval_once(tiny_sf, ray_session):
    out = tj.range_join_orders_shipments(tiny_sf).to_pandas().set_index("o_orderkey")
    # order 100 [01-05, 01-12): shipments on 01-06 and 01-11, NOT 01-20
    assert out.loc[100, "n_shipped"] == 2
    assert out.loc[100, "qty_shipped"] == pytest.approx(5.0)
    # orders 101 (same window) identical; 102 [02-01,02-08): no shipments
    assert out.loc[101, "n_shipped"] == 2
    assert 102 not in out.index


def test_range_join_bucket_width_covers_interval():
    # the replicate-to-<=2-buckets invariant requires width >= interval
    assert tj.RANGE_DAYS * tj.DAY_US <= 7 * tj.DAY_US


def test_topk_per_group_partial_prune_matches_global(tiny_sf, ray_session):
    out = wf.topk_orders_per_customer(tiny_sf).to_pandas()
    g1 = out[out["o_custkey"] == 1].sort_values("rk")
    assert list(g1["o_orderkey"]) == [101, 100]  # price desc
    assert list(g1["rk"]) == [1, 2]


def test_cumulative_and_sliding_order_contract(tiny_sf, ray_session):
    cum = wf.cumulative_value(tiny_sf).to_pandas()
    assert len(cum) == 2 and set(cum.columns) == {"event_id", "user_id", "running_value"}
    sl = wf.sliding_avg(tiny_sf).to_pandas()
    assert np.allclose(sorted(sl["avg3"]), [1.0, 2.0])


def test_overlap_join_canonical_bucket_counts_once(tmp_path, ray_session):
    """Interval-overlap join corner cases: a pair whose overlap straddles
    the bucket boundary counts once; a shipment window STARTING before the
    order (sb < sa arm) still counts; disjoint windows don't."""
    import pandas as pd

    d = tmp_path / "ov"
    d.mkdir()
    pd.DataFrame(
        {
            "o_orderkey": [100, 102],
            "o_custkey": [1, 1],
            "o_orderstatus": ["O", "O"],
            "o_totalprice": [1.0, 1.0],
            # 100: [01-05, 01-12); 102: [02-01, 02-08)
            "o_orderdate": pd.to_datetime(["2024-01-05", "2024-02-01"]).astype("datetime64[us]"),
            "o_orderpriority": ["1-URGENT"] * 2,
        }
    ).to_parquet(d / "orders.parquet")
    pd.DataFrame(
        {
            "l_orderkey": [1, 1, 1, 1],
            "l_partkey": [1] * 4,
            "l_suppkey": [1] * 4,
            "l_linenumber": [1, 2, 3, 4],
            "l_quantity": [1.0] * 4,
            "l_extendedprice": [1.0] * 4,
            "l_discount": [0.0] * 4,
            "l_tax": [0.0] * 4,
            "l_returnflag": ["N"] * 4,
            "l_linestatus": ["O"] * 4,
            # [01-03,01-06) starts BEFORE order 100 but overlaps (c1 arm);
            # [01-11,01-14) straddles the epoch-week boundary (canonical
            # bucket is the second week); [01-20,...) and [03-01,...) miss.
            "l_shipdate": pd.to_datetime(
                ["2024-01-03", "2024-01-11", "2024-01-20", "2024-03-01"]
            ).astype("datetime64[us]"),
        }
    ).to_parquet(d / "lineitem.parquet")

    from aiw_i2b2_etl_ray.pipelines.temporal_joins import overlap_join

    out = overlap_join(str(d)).to_pandas().set_index("o_orderkey")
    assert out.loc[100, "n_overlapping"] == 2  # 01-03 (c1) + 01-11 (boundary)
    assert 102 not in out.index  # no overlapping windows
