"""Hot-key (skew) salting in the bucketed hash join.

Correctness contract: salting only changes row PLACEMENT, never the join
result — the salted inner join must be row-identical to the unsalted one
and to a local polars join.  Scale contract: the hot key's probe rows
spread across multiple salt sub-keys (hence multiple buckets) instead of
one group swallowing 90% of the data."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from aiw_i2b2_etl_ray.stages.join import bucketed_join


@pytest.fixture()
def skewed(ray_session):
    rng = np.random.default_rng(5)
    n = 20_000
    # 90% of probe rows share key 7
    keys = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 50, n)).astype(np.int64)
    left = pd.DataFrame({"k": keys, "lv": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame(
        {"k": np.arange(50, dtype=np.int64), "rv": np.arange(50, dtype=np.int64) * 10}
    )
    return left, right


def _run(left, right, **kw):
    ds = bucketed_join(
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_arrow(pa.Table.from_pandas(right)),
        on=["k"],
        num_buckets=16,
        **kw,
    )
    return (
        ds.to_pandas()
        .sort_values(["k", "lv"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_salted_join_identical_to_unsalted_and_local(skewed):
    left, right = skewed
    plain = _run(left, right)
    salted = _run(left, right, hot_keys={7}, salt=8)
    pd.testing.assert_frame_equal(salted, plain)
    local = (
        left.merge(right, on="k")
        .sort_values(["k", "lv"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(salted[local.columns], local)


def test_salting_spreads_hot_key_across_buckets(skewed):
    left, _ = skewed
    # replicate the prep-side bucket assignment: hash of (key, salt)
    from aiw_i2b2_etl_ray.functions.hashing import bucket_hash

    hot_rows = int((left["k"] == 7).sum())
    salts = np.arange(hot_rows, dtype=np.int32) % 8
    t = pa.table({"k": np.full(hot_rows, 7, dtype=np.int64), "_salt": salts})
    buckets = set(bucket_hash(t, ["k", "_salt"], 16).to_pylist())
    assert len(buckets) >= 4  # 8 salts over 16 buckets: hot key now spans many


def test_salting_rejects_outer_joins(skewed):
    left, right = skewed
    with pytest.raises(ValueError):
        bucketed_join(
            rd.from_arrow(pa.Table.from_pandas(left)),
            rd.from_arrow(pa.Table.from_pandas(right)),
            on=["k"],
            how="left",
            hot_keys={7},
        )


def test_anti_and_semi_join_match_local(skewed):
    """Distributed semi/anti joins return LEFT columns only and match the
    local polars result; duplicate and extra right columns never multiply
    or leak into the output (the right side is a key SET)."""
    import polars as pl

    left, right = skewed
    # duplicate right keys + an extra non-key column that must be ignored
    right_dup = pd.concat([right, right.head(10)], ignore_index=True)
    right_dup["junk"] = "x"
    right_half = right_dup[right_dup["k"] % 2 == 0]

    for how in ("semi", "anti"):
        got = (
            bucketed_join(
                rd.from_arrow(pa.Table.from_pandas(left)),
                rd.from_arrow(pa.Table.from_pandas(right_half)),
                on=["k"],
                num_buckets=16,
                how=how,
            )
            .to_pandas()
            .sort_values(["k", "lv"], kind="mergesort")
            .reset_index(drop=True)
        )
        want = (
            pl.from_pandas(left)
            .join(pl.from_pandas(right_half[["k"]]), on="k", how=how)
            .to_pandas()
            .sort_values(["k", "lv"], kind="mergesort")
            .reset_index(drop=True)
        )
        assert list(got.columns) == ["k", "lv"], how
        pd.testing.assert_frame_equal(got, want[got.columns]), how
