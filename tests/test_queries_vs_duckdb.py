"""Replicates the driver's correctness gate locally: every queries() entry
with an oracle_sql() runs against DuckDB on the same parquet tables and must
match row-count + schema + order-insensitive values."""

import glob
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _to_pdf(x) -> pd.DataFrame:
    if isinstance(x, pd.DataFrame):
        return x
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x.to_pandas()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype("string")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _pairs():
    import __ray_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    return [(name, q[name], o[name]) for name in q if name in o]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(name, fn, sql):
    actual = _norm(_to_pdf(fn(SF_DIR)))
    with _duck(SF_DIR) as con:
        expected = _norm(con.sql(sql).df())
    assert sorted(actual.columns) == sorted(expected.columns), (
        list(actual.columns),
        list(expected.columns),
    )
    assert len(actual) == len(expected), f"{name}: rows {len(actual)} != {len(expected)}"
    pd.testing.assert_frame_equal(actual, expected, check_dtype=False, rtol=1e-6)


def test_entry_smoke():
    import __ray_entry__ as e

    ds = e.entry()
    assert ds.count() >= 0
    assert ds.schema() is not None
