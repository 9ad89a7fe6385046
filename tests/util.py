import pandas as pd
import pyarrow as pa


def to_pdf(x) -> pd.DataFrame:
    if isinstance(x, pd.DataFrame):
        return x
    if isinstance(x, pa.Table):
        return x.to_pandas()
    # ray Dataset
    return x.to_pandas()


def assert_table_eq(actual, expected, keys, *, ignore=()):
    """Order-insensitive table comparison (the engine's analog of the
    reference's DBUnit sorted-dataset assertion ignoring volatile columns,
    ProtempaFactory.java:153-170)."""
    a, e = to_pdf(actual).copy(), to_pdf(expected).copy()
    a = a.drop(columns=[c for c in ignore if c in a], errors="ignore")
    e = e.drop(columns=[c for c in ignore if c in e], errors="ignore")
    if len(a) == 0 and len(e) == 0:
        return  # an empty Ray result loses its schema in pandas; both empty = equal
    assert sorted(a.columns) == sorted(e.columns), (sorted(a.columns), sorted(e.columns))
    cols = sorted(a.columns)
    a = a[cols].sort_values(keys, kind="mergesort").reset_index(drop=True)
    e = e[cols].sort_values(keys, kind="mergesort").reset_index(drop=True)
    assert len(a) == len(e), f"row count {len(a)} != {len(e)}"
    for c in cols:
        av, ev = a[c], e[c]
        if pd.api.types.is_datetime64_any_dtype(ev) or pd.api.types.is_datetime64_any_dtype(av):
            av = pd.to_datetime(av)
            ev = pd.to_datetime(ev)
        elif pd.api.types.is_float_dtype(ev) or pd.api.types.is_float_dtype(av):
            pd.testing.assert_series_equal(
                av.astype(float), ev.astype(float), check_names=False, rtol=1e-9
            )
            continue
        elif pd.api.types.is_integer_dtype(ev) or pd.api.types.is_integer_dtype(av):
            av = av.astype("Int64")
            ev = ev.astype("Int64")
        bad = ~((av == ev) | (av.isna() & ev.isna()))
        assert not bad.any(), f"column {c}: {int(bad.sum())} mismatches\n" + str(
            pd.concat([a[bad][keys], av[bad].rename('actual'), ev[bad].rename('expected')], axis=1).head(10)
        )
