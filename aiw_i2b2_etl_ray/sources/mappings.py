"""Code-mapping files + vectorized recode — the reference's TSV mapping
reader (S5: etc/mappings/*.txt wired at dsb/I2B2DataSourceBackend.java:
176-181,219-220; e.g. gender.txt, icd9_diagnosis.txt).

A mapping is a tiny code->target dict loaded on the driver, broadcast once
(ray.put), and applied per batch with a vectorized dictionary recode
(pc.index_in + take) — never a shuffle join.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def load_mapping_tsv(path: str) -> dict[str, str]:
    """Parse a 2-column TSV (code <TAB> target); '#' comments skipped."""
    out: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            code, _, target = line.partition("\t")
            out[code] = target
    return out


def recode(col: pa.Array | pa.ChunkedArray, mapping: dict[str, str], *, default: str | None = None) -> pa.Array:
    """Vectorized dict recode: index_in against the key array, take from the
    value array; unmapped -> ``default``."""
    keys = pa.array(list(mapping.keys()), pa.string())
    vals = pa.array(list(mapping.values()) + [default], pa.string())
    idx = pc.index_in(pc.cast(col, pa.string()), value_set=keys)
    idx = pc.fill_null(idx, len(mapping))  # unmapped -> default slot
    return vals.take(idx)


#: demo mapping (the gender.txt analog): event_type -> category
EVENT_CATEGORY = {
    "click": "ENGAGE",
    "view": "ENGAGE",
    "purchase": "REVENUE",
    "signup": "ACQUIRE",
    "error": "FAULT",
}


def recode_events(sf_dir: str) -> rd.Dataset:
    """Catalog query: recode event_type through the mapping (broadcast dict
    + vectorized recode), count per category."""
    from ray.data.aggregate import Sum

    import polars as pl

    map_ref = ray.put(EVENT_CATEGORY)
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])

    def rc(t: pa.Table) -> pa.Table:
        cat = recode(t["event_type"], ray.get(map_ref), default="OTHER")
        return (
            pl.from_arrow(pa.table({"category": cat}))
            .group_by("category")
            .agg(pl.len().cast(pl.Int64).alias("pn"))
            .to_arrow()
        )

    return (
        ds.map_batches(rc, batch_format="pyarrow")
        .groupby("category")
        .aggregate(Sum("pn", alias_name="n_events"))
    )


SQL_RECODE_EVENTS = """
SELECT CASE event_type
         WHEN 'click' THEN 'ENGAGE' WHEN 'view' THEN 'ENGAGE'
         WHEN 'purchase' THEN 'REVENUE' WHEN 'signup' THEN 'ACQUIRE'
         WHEN 'error' THEN 'FAULT' ELSE 'OTHER' END AS category,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
"""
