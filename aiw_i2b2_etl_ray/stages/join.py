"""Bucketed hash join — both sides large (neither fits a broadcast).

The portable Ray Data pattern (ray_guide.md §joins): add ``bucket =
hash(key) % B`` to BOTH sides, tag each side, union on a unified schema,
group by bucket, and join the two sides of each bucket inside
``map_groups``.  One shuffle total, co-partitioned by construction; B is
chosen so one bucket's rows fit a worker (same sizing rule as the CDC
merge partitions), and hot join keys can salt into sub-buckets with the
same hash machinery the merge uses.

Used where the reference pushes N-way relational joins into source SQL
(J4, dsb/I2B2DataSourceBackend.java:200,226,256-290) and the dimension
side is too large to broadcast (J3's small-side broadcast covers the rest).
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import bucket_hash
from ..schemas import ensure_columns
from ..util import worker_runtime_env


def bucketed_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on: list[str],
    num_buckets: int = 32,
    how: str = "inner",
) -> rd.Dataset:
    """Hash-partitioned join of two Datasets on ``on``.  Non-key column
    names must be disjoint (resolve collisions upstream, as in SQL)."""
    l_schema = left.schema().base_schema
    r_schema = right.schema().base_schema
    l_only = [f.name for f in l_schema if f.name not in on]
    r_only = [f.name for f in r_schema if f.name not in on]
    overlap = set(l_only) & set(r_only)
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")

    # one unified schema both sides project onto (missing columns -> null)
    unified = pa.schema(
        [l_schema.field(c) for c in on]
        + [l_schema.field(c) for c in l_only]
        + [r_schema.field(c) for c in r_only]
        + [pa.field("_bucket", pa.int32()), pa.field("_side", pa.string())]
    )

    def prep(side: str):
        def fn(t: pa.Table) -> pa.Table:
            t = t.append_column("_bucket", bucket_hash(t, on, num_buckets))
            t = t.append_column("_side", pa.array([side] * len(t)))
            return ensure_columns(t, unified)

        return fn

    lt = left.map_batches(prep("l"), batch_format="pyarrow", **worker_runtime_env())
    rt = right.map_batches(prep("r"), batch_format="pyarrow", **worker_runtime_env())

    def join_bucket(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g)
        lhs = df.filter(pl.col("_side") == "l").select(on + l_only)
        rhs = df.filter(pl.col("_side") == "r").select(on + r_only)
        return lhs.join(rhs, on=on, how=how).to_arrow()

    return (
        lt.union(rt)
        .groupby("_bucket")
        .map_groups(join_bucket, batch_format="pyarrow", **worker_runtime_env())
    )
