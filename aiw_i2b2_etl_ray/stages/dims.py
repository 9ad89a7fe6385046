"""Dimension builders — grouped reductions over already-reduced data.

Reference analogs: PatientDimensionFactory / VisitDimensionFactory /
ProviderDimensionFactory + the first-writer-wins provider dedup
(dest/table/ProviderDimensionFactory.java:119-144) and synonym/modifier
dedup (SURVEY.md §2.7 D2).  Because the fact stream is already deduped and
partitioned, these are cheap: a per-batch partial aggregate inside
``map_batches`` (the combiner) followed by a tiny global ``groupby`` over
one row per (key, batch) — never a full-row shuffle.
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..schemas import LANG_DIM, REPO_DIM, ensure_columns


def _partial_minmax(key: str):
    def fn(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t.select([key, "commit_seq"]))
            .group_by(key)
            .agg(
                pl.col("commit_seq").min().alias("mn"),
                pl.col("commit_seq").max().alias("mx"),
            )
        )
        return df.to_arrow()

    return fn


def repo_dim(fact_ds: rd.Dataset, path_dim: pa.Table) -> pa.Table:
    """repo_dim (patient_dimension analog): first/last applied commit_seq per
    repo from the fact stream + live-path count from the converged path_dim;
    a repo whose paths are all tombstoned is itself logically deleted."""
    partial = fact_ds.map_batches(_partial_minmax("repo"), batch_format="pyarrow")
    agg = partial.groupby("repo").aggregate(
        Min("mn", alias_name="first_commit_seq"),
        Max("mx", alias_name="last_commit_seq"),
    )
    df = pl.from_arrow(pa.Table.from_pandas(agg.to_pandas()))

    live = (
        pl.from_arrow(path_dim)
        .filter(pl.col("delete_date").is_null())
        .group_by("repo")
        .agg(pl.len().cast(pl.Int64).alias("n_paths_live"))
    )
    out = (
        df.join(live, on="repo", how="left")
        .with_columns(pl.col("n_paths_live").fill_null(0))
        .with_columns(
            pl.when(pl.col("n_paths_live") == 0)
            .then(pl.col("last_commit_seq"))
            .otherwise(None)
            .cast(pl.Datetime("us"))
            .alias("delete_date")
        )
        .sort("repo")
    )
    return ensure_columns(out.to_arrow(), REPO_DIM)


def lang_dim(fact_ds: rd.Dataset) -> pa.Table:
    """lang_dim (concept_dimension analog): languages discovered dynamically
    from the applied stream, like providers in the reference (ST3)."""

    def partial(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select(["lang", "commit_seq"]))
            .group_by("lang")
            .agg(pl.col("commit_seq").min().alias("mn"))
            .to_arrow()
        )

    agg = (
        fact_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Min("mn", alias_name="first_seen_seq"))
    )
    out = pl.from_arrow(pa.Table.from_pandas(agg.to_pandas())).sort("lang")
    return ensure_columns(out.to_arrow(), LANG_DIM)
