"""Edge cases for the per-column datasheet census (pipelines/profiling.py).

The oracle equivalence itself is covered by test_queries_vs_duckdb
(table_profile is parametrized in automatically); these pin the partial
shapes the fold depends on: all-null blocks, null-bearing blocks, and
the fixed partial schema regardless of block content.
"""

import pyarrow as pa

from aiw_i2b2_etl_ray.pipelines.profiling import (
    _PARTIAL_SCHEMA,
    _distinct_pairs,
    _stats_partial,
    PROFILE_COLS,
)


def _block(rows: dict) -> pa.Table:
    names = [c for c, _ in PROFILE_COLS]
    data = {}
    n = len(next(iter(rows.values()))) if rows else 0
    for name, kind in PROFILE_COLS:
        if name in rows:
            data[name] = rows[name]
        elif kind == "int":
            data[name] = pa.array([None] * n, pa.int64())
        elif kind == "date":
            data[name] = pa.array([None] * n, pa.timestamp("us"))
        else:
            data[name] = pa.array([None] * n, pa.string())
    return pa.table({k: data[k] for k in names})


def test_stats_partial_all_null_block():
    t = _block({"l_orderkey": pa.array([None, None], pa.int64())})
    p = _stats_partial(t)
    assert p.schema.equals(_PARTIAL_SCHEMA)
    assert len(p) == len(PROFILE_COLS)
    rows = {r["col"]: r for r in p.to_pylist()}
    for name, _ in PROFILE_COLS:
        r = rows[name]
        assert r["n_rows"] == 2 and r["n_nulls"] == 2
        assert r["min_i"] is None and r["max_i"] is None
        assert r["min_s"] is None and r["max_s"] is None


def test_stats_partial_mixed_nulls_and_date_format():
    import datetime

    t = _block(
        {
            "l_orderkey": pa.array([5, None, 3], pa.int64()),
            "l_returnflag": pa.array(["R", "A", None], pa.string()),
            "l_shipdate": pa.array(
                [
                    datetime.datetime(1995, 1, 2, 0, 0, 0, 123456),
                    None,
                    datetime.datetime(2001, 11, 4),
                ],
                pa.timestamp("us"),
            ),
        }
    )
    rows = {r["col"]: r for r in _stats_partial(t).to_pylist()}
    assert rows["l_orderkey"]["min_i"] == 3 and rows["l_orderkey"]["max_i"] == 5
    assert rows["l_orderkey"]["n_nulls"] == 1
    assert rows["l_returnflag"]["min_s"] == "A" and rows["l_returnflag"]["max_s"] == "R"
    # second-granularity image: microseconds truncated, no fractional part
    assert rows["l_shipdate"]["min_s"] == "1995-01-02 00:00:00"
    assert rows["l_shipdate"]["max_s"] == "2001-11-04 00:00:00"


def test_distinct_pairs_drops_nulls_and_dedups_in_block():
    t = _block(
        {
            "l_orderkey": pa.array([1, 1, None, 2], pa.int64()),
            "l_returnflag": pa.array(["R", "R", "R", None], pa.string()),
        }
    )
    p = _distinct_pairs(t)
    pairs = set(zip(p["col"].to_pylist(), p["v"].to_pylist()))
    assert ("l_orderkey", "1") in pairs and ("l_orderkey", "2") in pairs
    assert ("l_returnflag", "R") in pairs
    # nulls never enter the distinct exchange
    assert not any(v is None for v in p["v"].to_pylist())
    # in-block dedup: one pair per distinct value
    assert len(pairs) == len(p)
