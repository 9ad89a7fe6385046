"""Declarative relational reader — the engine's analog of the reference's
EntitySpec/ColumnSpec/PropertySpec machinery
(dsb/I2B2DataSourceBackend.java:63-401 and
I2B2DataSourceBackendForPhenotype.java:64-672, SURVEY.md S1/S2).

A spec declares WHAT to read (table, columns, renames, row predicate,
small-side joins, key-set restriction); the builder compiles it into a
column-pruned, predicate-pushed Ray Dataset pipeline.  The reference
compiles its specs to SQL against the i2b2 schema; here the "database" is
a directory of Parquet tables, joins against small dimension tables become
broadcast lookups, and the key-set restriction (the reference's
RESULT_INSTANCE_ID patient-set join, :134-138) becomes a broadcast
``is_in`` filter.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


@dataclass(frozen=True)
class JoinSpec:
    """Broadcast join against a small side table (JoinSpec analog)."""

    table: str  # parquet table name in the source dir
    left_on: str
    right_on: str
    columns: tuple[str, ...] = ()  # columns to bring in (renamed 1:1)


@dataclass(frozen=True)
class EntitySpec:
    """One entity's read plan (EntitySpec/ColumnSpec analog)."""

    table: str
    columns: tuple[str, ...]  # source columns to read
    renames: dict = field(default_factory=dict)  # src -> dest name
    filter_expr: object | None = None  # pyarrow.dataset expression
    joins: tuple[JoinSpec, ...] = ()
    key_column: str | None = None  # column the key-set restricts


def read_entity(
    sf_dir: str, spec: EntitySpec, key_set: list | None = None
) -> rd.Dataset:
    """Compile the spec into a Dataset pipeline."""
    import polars as pl

    kwargs = {"columns": list(spec.columns)}
    if spec.filter_expr is not None:
        kwargs["filter"] = spec.filter_expr
    ds = rd.read_parquet(f"{sf_dir}/{spec.table}.parquet", **kwargs)

    sides = []
    for j in spec.joins:
        side = pl.read_parquet(f"{sf_dir}/{j.table}.parquet").select(
            [j.right_on, *j.columns]
        )
        sides.append((j, ray.put(side)))

    keys_ref = (
        ray.put(pa.array(sorted(key_set))) if key_set is not None else None
    )
    renames = dict(spec.renames)

    def transform(t: pa.Table) -> pa.Table:
        if keys_ref is not None and spec.key_column:
            t = t.filter(
                pc.is_in(t[spec.key_column], value_set=ray.get(keys_ref))
            )
        if sides:
            df = pl.from_arrow(t)
            for j, ref in sides:
                df = df.join(ray.get(ref), left_on=j.left_on, right_on=j.right_on, how="left")
            t = df.to_arrow()
        if renames:
            t = t.rename_columns([renames.get(c, c) for c in t.column_names])
        return t

    return ds.map_batches(transform, batch_format="pyarrow")


# --- demo spec used by the query catalog (an "Encounters"-style entity) ----

ENCOUNTERS_SPEC = EntitySpec(
    table="orders",
    columns=("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
    renames={
        "o_orderkey": "encounter_id",
        "o_custkey": "patient_id",
        "o_orderdate": "start_date",
        "o_totalprice": "amount",
    },
    joins=(JoinSpec(table="customer", left_on="o_custkey", right_on="c_custkey", columns=("c_mktsegment",)),),
    key_column="o_custkey",
)


def declarative_read(sf_dir: str) -> rd.Dataset:
    """Catalog query: the demo entity restricted to a deterministic key set
    (patients 1..500) — exercises pruning + rename + broadcast join +
    key-set restriction in one declarative spec."""
    return read_entity(sf_dir, ENCOUNTERS_SPEC, key_set=list(range(1, 501)))


# --- phenotype-variant spec set (S2, I2B2DataSourceBackendForPhenotype) ----
# Same machinery, different spec family: a "labs/vitals"-style event entity
# with a pushed-down row predicate and a two-hop dimension join chain.

def _phenotype_spec():
    import pyarrow.dataset as pads

    return EntitySpec(
        table="lineitem",
        columns=(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_quantity",
            "l_extendedprice",
        ),
        renames={
            "l_orderkey": "encounter_id",
            "l_linenumber": "instance_num",
            "l_quantity": "nval_num",
            "l_extendedprice": "observation_amount",
        },
        # predicate pushdown: only "abnormal" observations leave storage
        filter_expr=(pads.field("l_quantity") >= 45),
        joins=(
            JoinSpec(
                table="part",
                left_on="l_partkey",
                right_on="p_partkey",
                columns=("p_type",),
            ),
        ),
    )


def declarative_read_phenotype(sf_dir: str) -> rd.Dataset:
    """S2 variant: predicate-pushed read + dimension join, no key set."""
    return read_entity(sf_dir, _phenotype_spec())


SQL_DECLARATIVE_READ_PHENOTYPE = """
SELECT l.l_orderkey   AS encounter_id,
       l.l_linenumber AS instance_num,
       l.l_partkey,
       l.l_quantity      AS nval_num,
       l.l_extendedprice AS observation_amount,
       p.p_type
FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_quantity >= 45
"""


SQL_DECLARATIVE_READ = """
SELECT o.o_orderkey  AS encounter_id,
       o.o_custkey   AS patient_id,
       o.o_orderdate AS start_date,
       o.o_totalprice AS amount,
       c.c_mktsegment
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_custkey BETWEEN 1 AND 500
"""
