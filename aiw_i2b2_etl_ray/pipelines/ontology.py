"""Ontology / metadata-table family — the engine's analog of the
reference's concept-tree machinery:

- ``ontology_table``: the i2b2 METADATA-table emission (K2,
  dest/table/MetaTableConceptHandler.java:35-90 + breadth-first tree walk
  ConceptHierarchyLoader.java:40-50): one root row + one row per language
  concept with c_hlevel / c_fullname / c_name / c_basecode.
- ``lang_stats``: the statistics API (A4, dest/I2b2Statistics.java:28-120):
  per-concept counts plus the parent rollup row.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ..functions import strings

ROOT = "Lang"


def ontology_table(sf_dir: str) -> pa.Table:
    """Two-level language ontology from the discovered lang domain.
    Domain discovery is a distinct-shuffle; the tree assembly is
    driver-side (the ontology is small by construction, like the
    reference's in-memory concept tree)."""
    langs = sorted(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"]).unique("lang")
    )
    n = len(langs)
    root_path = strings.hierarchy_path(pa.array([ROOT]))[0].as_py()
    rows = {
        "c_hlevel": pa.array([0] + [1] * n, pa.int64()),
        "c_fullname": pa.array(
            [root_path]
            + [
                strings.hierarchy_path(pa.array([ROOT]), pa.array([l]))[0].as_py()
                for l in langs
            ],
            pa.string(),
        ),
        "c_name": pa.array([ROOT] + langs, pa.string()),
        "c_basecode": pa.array(
            [None] + [f"LANG:{l}" for l in langs], pa.string()
        ),
        "c_visualattributes": pa.array(["FA"] + ["LA"] * n, pa.string()),
    }
    return pa.table(rows)


SQL_ONTOLOGY_TABLE = r"""
WITH langs AS (SELECT DISTINCT lang FROM documents)
SELECT CAST(0 AS BIGINT) AS c_hlevel, '\Lang\' AS c_fullname,
       'Lang' AS c_name, CAST(NULL AS VARCHAR) AS c_basecode,
       'FA' AS c_visualattributes
UNION ALL
SELECT CAST(1 AS BIGINT), '\Lang\' || lang || '\', lang,
       'LANG:' || lang, 'LA'
FROM langs
"""


def lang_stats(sf_dir: str) -> rd.Dataset:
    """Per-concept counts + the parent rollup (total) row, computed with
    per-batch partials (A4 statistics shape)."""
    import polars as pl

    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).group_by("lang").agg(pl.len().cast(pl.Int64).alias("pn"))
        total = pl.DataFrame({"lang": ["(all)"], "pn": [pl.Series([len(t)], dtype=pl.Int64)[0]]})
        return pl.concat([df, total]).to_arrow()

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("pn", alias_name="n_docs"))
    )


SQL_LANG_STATS = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
UNION ALL
SELECT '(all)', CAST(COUNT(*) AS BIGINT) FROM documents
"""


def ontology_with_totals(sf_dir: str) -> pa.Table:
    """C_TOTALNUM maintenance (A6, dest/I2b2QueryResultsHandler.java:
    344-352,858-873) + the per-subtree prefix-match count join (J5,
    :720-748): each ontology row gets the count of documents whose concept
    path falls under it — the root's total is the prefix rollup.  Counts
    come from a grouped reduce; the (small) ontology is matched driver-side
    by path prefix, never a row-level shuffle join."""
    onto = ontology_table(sf_dir)
    # counts via the distributed partial-aggregate pipeline (tiny result)
    stats = lang_stats(sf_dir).to_pandas()
    stats = stats[stats["lang"] != "(all)"]
    lang_n = dict(zip(stats["lang"], stats["n_docs"].astype(int)))
    paths = onto["c_fullname"].to_pylist()
    # prefix-match: a doc with lang L lives at \Lang\L\; row total = sum of
    # counts whose concept path starts with this row's path
    doc_paths = {f"\\{ROOT}\\{l}\\": n for l, n in lang_n.items()}
    totals = [
        sum(n for p, n in doc_paths.items() if p.startswith(row_path))
        for row_path in paths
    ]
    return onto.append_column("c_totalnum", pa.array(totals, pa.int64()))


SQL_ONTOLOGY_WITH_TOTALS = r"""
WITH onto AS (
  SELECT CAST(0 AS BIGINT) AS c_hlevel, '\Lang\' AS c_fullname,
         'Lang' AS c_name, CAST(NULL AS VARCHAR) AS c_basecode,
         'FA' AS c_visualattributes
  UNION ALL
  SELECT CAST(1 AS BIGINT), '\Lang\' || lang || '\', lang,
         'LANG:' || lang, 'LA'
  FROM (SELECT DISTINCT lang FROM documents)
),
doc_counts AS (
  SELECT '\Lang\' || lang || '\' AS p, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY lang
)
SELECT o.*,
       CAST(COALESCE((SELECT SUM(d.n) FROM doc_counts d
                 WHERE d.p LIKE o.c_fullname || '%'), 0) AS BIGINT) AS c_totalnum
FROM onto o
"""
