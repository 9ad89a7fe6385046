"""Randomized (seeded) cross-checks of the temporal joins against DuckDB.

The sf0.001 oracle run exercises one fixed data shape; these draws cover
duplicate as-of dates (tie-break), customers with orders only after all
events (inner-drop), empty range-buckets, and intervals clustered on
week boundaries — with the same value-hash discipline as the driver."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from aiw_i2b2_etl_ray.pipelines import temporal_joins as tj


def _make_sf(tmp_path, seed: int) -> str:
    rng = np.random.default_rng(seed)
    d = tmp_path / f"sf{seed}"
    d.mkdir()
    n_ev, n_ord, n_li = 400, 300, 500
    base = pd.Timestamp("2024-01-01").value // 1000  # µs
    ev_ts = base + rng.integers(0, 90 * 86_400_000_000, n_ev)
    pd.DataFrame(
        {
            "event_id": np.arange(n_ev),
            "ts": pd.to_datetime(ev_ts, unit="us"),
            "user_id": rng.integers(0, 8, n_ev),
            "event_type": ["x"] * n_ev,
            "value": rng.random(n_ev),
            "props": [""] * n_ev,
        }
    ).to_parquet(d / "events.parquet")
    # coarse date grid -> many exact date ties for the as-of tie-break
    o_dates = base + rng.integers(0, 12, n_ord) * (7 * 86_400_000_000)
    pd.DataFrame(
        {
            "o_orderkey": np.arange(n_ord),
            "o_custkey": rng.integers(0, 10, n_ord),  # custkeys 8-9 never match
            "o_orderstatus": ["O"] * n_ord,
            "o_totalprice": rng.random(n_ord) * 1000,
            "o_orderdate": pd.to_datetime(o_dates, unit="us"),
            "o_orderpriority": ["1-URGENT"] * n_ord,
        }
    ).to_parquet(d / "orders.parquet")
    li_dates = base + rng.integers(-5, 100, n_li) * 86_400_000_000  # some before all orders
    pd.DataFrame(
        {
            "l_orderkey": np.arange(n_li),
            "l_partkey": np.ones(n_li, dtype=np.int64),
            "l_suppkey": np.ones(n_li, dtype=np.int64),
            "l_linenumber": np.ones(n_li, dtype=np.int32),
            "l_quantity": rng.integers(1, 50, n_li).astype(float),
            "l_extendedprice": np.ones(n_li),
            "l_discount": np.zeros(n_li),
            "l_tax": np.zeros(n_li),
            "l_returnflag": ["N"] * n_li,
            "l_linestatus": ["O"] * n_li,
            "l_shipdate": pd.to_datetime(li_dates, unit="us"),
        }
    ).to_parquet(d / "lineitem.parquet")
    return str(d)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_join_matches_duckdb_on_random_draw(tmp_path, seed, ray_session):
    sf = _make_sf(tmp_path, seed)
    con = duckdb.connect()
    for t in ("events", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    a = _norm(tj.asof_join_events_orders(sf).to_pandas())
    e = _norm(con.sql(tj.SQL_ASOF_JOIN).df())
    assert len(a) == len(e)
    pd.testing.assert_frame_equal(a, e, check_dtype=False, rtol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_range_join_matches_duckdb_on_random_draw(tmp_path, seed, ray_session):
    sf = _make_sf(tmp_path, seed)
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    a = _norm(tj.range_join_orders_shipments(sf).to_pandas())
    e = _norm(con.sql(tj.SQL_RANGE_JOIN).df())
    assert len(a) == len(e)
    pd.testing.assert_frame_equal(a, e, check_dtype=False, rtol=1e-6)


@pytest.mark.parametrize("seed", [0, 1])
def test_window_funcs_match_duckdb_on_random_draw(tmp_path, seed, ray_session):
    """Randomized cross-check for the per-key window family (cumulative,
    sliding, gaps) — catches ordering-tie and float-edge regressions the
    fixed driver tables may not exercise."""
    from aiw_i2b2_etl_ray.pipelines import window_funcs as wf

    sf = _make_sf(tmp_path, seed + 10)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    for fn, sql in [
        (wf.cumulative_value, wf.SQL_CUMULATIVE_VALUE),
        (wf.sliding_avg, wf.SQL_SLIDING_AVG),
        (wf.event_gaps, wf.SQL_EVENT_GAPS),
    ]:
        a = _norm(fn(sf).to_pandas())
        e = _norm(con.sql(sql).df())
        assert len(a) == len(e)
        pd.testing.assert_frame_equal(a, e, check_dtype=False, rtol=1e-6)


def _make_docs(tmp_path, seed: int) -> str:
    rng = np.random.default_rng(seed)
    d = tmp_path / f"docs{seed}"
    d.mkdir()
    n = 300
    langs = np.array(["en", "de", "fr", "es", "zh"])
    pd.DataFrame(
        {
            "doc_id": rng.permutation(n * 3)[:n],  # sparse, shuffled ids
            "text": [f"doc {i} " + "x" * int(rng.integers(0, 50)) for i in range(n)],
            "lang": langs[rng.integers(0, 5, n)],
            "source": [f"src{int(s)}" for s in rng.integers(0, 20, n)],
            "n_chars": rng.integers(1, 5000, n),
        }
    ).to_parquet(d / "documents.parquet")
    return str(d)


@pytest.mark.parametrize("seed", [0, 1])
def test_mixing_family_matches_duckdb_on_random_draw(tmp_path, seed, ray_session):
    """sample/mix/pack are hash/order-deterministic — verify on random
    tables with sparse shuffled ids and uneven language strata."""
    from aiw_i2b2_etl_ray.pipelines import mixing as mx

    sf = _make_docs(tmp_path, seed)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    for fn, sql in [
        (mx.sample_per_lang, mx.SQL_SAMPLE_PER_LANG),
        (mx.mix_sources, mx.SQL_MIX_SOURCES),
        (mx.pack_sequences, mx.SQL_PACK_SEQUENCES),
    ]:
        a = _norm(fn(sf).to_pandas())
        e = _norm(con.sql(sql).df())
        assert len(a) == len(e), fn.__name__
        pd.testing.assert_frame_equal(a, e, check_dtype=False, rtol=1e-6)
