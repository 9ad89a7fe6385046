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


def _distinct_pairs(sf_dir: str, row_filter=None) -> list[tuple[str, str]]:
    """Distinct (lang, source) via per-batch combiner partials + a tiny
    driver fold (the domain is small by construction; the full rows never
    leave their block — reference table discovery analog,
    ksb/TableAccessReader.java:97-150).  ``row_filter`` (a pyarrow dataset
    expression) is pushed into the parquet scan — used by the persistent
    ontology's update runs to discover from a corpus slice."""
    import polars as pl

    import ray

    kwargs = {"columns": ["lang", "source"]}
    if row_filter is not None:
        # scanner filters apply BEFORE projection, so the filter may
        # reference columns (doc_id) outside the pruned column set
        kwargs["filter"] = row_filter
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", **kwargs)

    def partial(t: pa.Table) -> pa.Table:
        return pl.from_arrow(t).unique().to_arrow()

    mat = ds.map_batches(partial, batch_format="pyarrow").materialize()
    tbls = [t for t in ray.get(mat.to_arrow_refs()) if len(t)]
    if not tbls:
        return []
    df = pl.from_arrow(pa.concat_tables(tbls)).unique().sort(["lang", "source"])
    return list(zip(df["lang"].to_list(), df["source"].to_list()))


def _leaf_metadata_xml(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """source -> ValueMetadata XML blob: each leaf concept's value set is
    the (sorted) langs the source appears under, emitted as an Enum — the
    reference generates exactly this blob shape for leaf concepts
    (dest/metadata/PropositionConceptTreeBuilder.java:118-125,180-215)."""
    from ..functions.value_metadata import ValueMetadata, generate_value_metadata

    by_src: dict[str, list[str]] = {}
    for l, s in pairs:
        by_src.setdefault(s, []).append(l)
    return {
        s: generate_value_metadata(
            ValueMetadata(test_id=f"SRC:{s}", datatype="Enum", enum_values=sorted(ls))
        )
        for s, ls in by_src.items()
    }


def build_tree(pairs: list[tuple[str, str]]) -> pa.Table:
    """Deterministic tree emission from a sorted (lang, source) pair set —
    the pure function both the one-shot query (``ontology_table``) and the
    persistent incremental merge (``ontology_store.update_ontology``) share,
    so an incrementally-merged table converges byte-identically to the
    one-shot build over the union of its inputs."""
    pairs = sorted(set(pairs))
    langs = sorted({l for l, _ in pairs})
    root_path = strings.hierarchy_path(pa.array([ROOT]))[0].as_py()
    leaf_xml = _leaf_metadata_xml(pairs)

    hlevel = [0] + [1] * len(langs)
    fullname = [root_path] + [f"\\{ROOT}\\{l}\\" for l in langs]
    name = [ROOT] + langs
    basecode: list[str | None] = [None] + [f"LANG:{l}" for l in langs]
    vis = ["FA"] * (1 + len(langs))
    syn = ["N"] * (1 + len(langs))
    metaxml: list[str | None] = [None] * (1 + len(langs))

    seen_src: set[str] = set()
    for l, s in pairs:  # sorted (lang, source) == first occurrence order
        hlevel.append(2)
        fullname.append(f"\\{ROOT}\\{l}\\{s}\\")
        name.append(s)
        basecode.append(f"SRC:{s}")
        vis.append("LA")
        syn.append("Y" if s in seen_src else "N")
        metaxml.append(leaf_xml[s])
        seen_src.add(s)

    return pa.table(
        {
            "c_hlevel": pa.array(hlevel, pa.int64()),
            "c_fullname": pa.array(fullname, pa.string()),
            "c_name": pa.array(name, pa.string()),
            "c_basecode": pa.array(basecode, pa.string()),
            "c_visualattributes": pa.array(vis, pa.string()),
            "c_synonym_cd": pa.array(syn, pa.string()),
            "c_metadataxml": pa.array(metaxml, pa.string()),
        }
    )


def ontology_table(sf_dir: str) -> pa.Table:
    """Three-level concept hierarchy discovered from the data:
    root -> lang -> source (depth >= 3, the reference's arbitrary-depth
    metadata tree, ksb/I2b2KnowledgeSourceBackend.java:85-2249).

    Synonym dedup (PropositionConceptTreeBuilder.java:128-133): the same
    source concept appearing under a second lang keeps its row but is
    flagged ``c_synonym_cd='Y'`` (the reference marks duplicate concept ids
    SYNONYM instead of inserting a second primary row).

    Leaf rows carry ``c_metadataxml`` — the generated ValueMetadata blob
    (M17) the value-set query (``concept_value_sets``) parses back (M16),
    mirroring the reference's C_METADATAXML column
    (ksb/CMetadataXmlParser.java:39-193).

    Domain discovery is distributed (combiner partials); tree assembly is
    driver-side, like the reference's in-memory concept tree."""
    return build_tree(_distinct_pairs(sf_dir))


_SQL_ONTO = r"""
pairs AS (SELECT DISTINCT lang, source FROM documents),
langs AS (SELECT DISTINCT lang FROM documents),
vm AS (
  SELECT source,
         '<ValueMetadata><Version>3.02</Version><CreationDateTime/><TestID>SRC:'
         || source || '</TestID><TestName>SRC:' || source
         || '</TestName><DataType>Enum</DataType><Oktousevalues>Y</Oktousevalues><EnumValues>'
         || string_agg('<Val description="">' || lang || '</Val>', '' ORDER BY lang)
         || '</EnumValues></ValueMetadata>' AS xml
  FROM pairs GROUP BY source
),
onto AS (
  SELECT CAST(0 AS BIGINT) AS c_hlevel, '\Lang\' AS c_fullname,
         'Lang' AS c_name, CAST(NULL AS VARCHAR) AS c_basecode,
         'FA' AS c_visualattributes, 'N' AS c_synonym_cd,
         CAST(NULL AS VARCHAR) AS c_metadataxml,
         CAST(NULL AS VARCHAR) AS c_parent
  UNION ALL
  SELECT CAST(1 AS BIGINT), '\Lang\' || lang || '\', lang,
         'LANG:' || lang, 'FA', 'N', CAST(NULL AS VARCHAR), '\Lang\'
  FROM langs
  UNION ALL
  SELECT CAST(2 AS BIGINT), '\Lang\' || p.lang || '\' || p.source || '\', p.source,
         'SRC:' || p.source, 'LA',
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY p.source ORDER BY p.lang) > 1
              THEN 'Y' ELSE 'N' END,
         v.xml,
         '\Lang\' || p.lang || '\'
  FROM pairs p JOIN vm v ON v.source = p.source
)
"""

SQL_ONTOLOGY_TABLE = f"""
WITH {_SQL_ONTO}
SELECT c_hlevel, c_fullname, c_name, c_basecode, c_visualattributes,
       c_synonym_cd, c_metadataxml
FROM onto
"""

def table_access(sf_dir: str) -> pa.Table:
    """Metadata-table discovery (ksb/TableAccessReader.java:97-150 with
    existence probing :122-124): discover the source tables present in the
    warehouse directory (glob), probe each (parquet footer — no data read),
    and emit the TABLE_ACCESS-style catalog row per table."""
    import glob
    import os

    import pyarrow.parquet as pq

    rows = []
    for f in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.basename(f)[: -len(".parquet")]
        md = pq.ParquetFile(f).metadata  # existence + shape probe only
        rows.append(
            (
                name.upper()[:4] + f"_{len(rows)}",  # c_table_cd-style code
                name,
                f"\\Tables\\{name}\\",
                md.num_rows,
                md.num_columns,
            )
        )
    return pa.table(
        {
            "c_table_cd": pa.array([r[0] for r in rows], pa.string()),
            "c_table_name": pa.array([r[1] for r in rows], pa.string()),
            "c_fullname": pa.array([r[2] for r in rows], pa.string()),
            "n_rows": pa.array([r[3] for r in rows], pa.int64()),
            "n_columns": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def _table_access_sql() -> str:
    tables = (
        "customer documents embeddings events lineitem nation orders part "
        "region supplier"
    ).split()  # the driver-registered views, in glob (sorted) order
    arms = []
    for i, t in enumerate(tables):
        arms.append(
            f"SELECT '{t.upper()[:4]}_{i}' AS c_table_cd, '{t}' AS c_table_name, "
            f"'\\Tables\\{t}\\' AS c_fullname, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM information_schema.columns "
            f"WHERE table_name = '{t}') AS n_columns FROM {t}"
        )
    return "\nUNION ALL\n".join(arms)


SQL_TABLE_ACCESS = _table_access_sql()


DESCENDANT_ROOT = "\\Lang\\en\\"


def concept_descendants(sf_dir: str) -> pa.Table:
    """Descendants-of-path query (ksb/LevelReader.java:87-115,127-141): all
    concepts strictly under ``DESCENDANT_ROOT``, by path-prefix match over
    the discovered hierarchy — the reference's C_FULLNAME LIKE 'path%'
    child/descendant reads.  The oracle walks the same tree with a
    recursive CTE over parent edges, so prefix semantics are checked
    against genuine edge-traversal semantics."""
    onto = ontology_table(sf_dir)
    paths = onto["c_fullname"]
    import pyarrow.compute as pc

    mask = pc.and_(
        pc.starts_with(paths, DESCENDANT_ROOT),
        pc.invert(pc.equal(paths, DESCENDANT_ROOT)),
    )
    return onto.filter(mask).select(
        ["c_hlevel", "c_fullname", "c_name", "c_basecode"]
    )


SQL_CONCEPT_DESCENDANTS = f"""
WITH RECURSIVE {_SQL_ONTO},
walk AS (
  SELECT c_hlevel, c_fullname, c_name, c_basecode
  FROM onto WHERE c_parent = '{DESCENDANT_ROOT}'
  UNION ALL
  SELECT o.c_hlevel, o.c_fullname, o.c_name, o.c_basecode
  FROM onto o JOIN walk w ON o.c_parent = w.c_fullname
)
SELECT * FROM walk
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
    :720-748) + the HIERARCHICAL statistics rollup
    (dest/I2b2Statistics.java:28-120): every row of the 3-level hierarchy
    gets the count of documents under its subtree — leaf = per-(lang,
    source) count, lang folder = sum over its sources, root = corpus total.
    Counts come from a distributed per-batch partial aggregate; the (small)
    ontology is matched driver-side by path prefix, never a row-level
    shuffle join."""
    import polars as pl

    import ray

    onto = ontology_table(sf_dir)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .group_by(["lang", "source"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    mat = ds.map_batches(partial, batch_format="pyarrow").materialize()
    tbls = [t for t in ray.get(mat.to_arrow_refs()) if len(t)]
    counts = (
        pl.from_arrow(pa.concat_tables(tbls))
        .group_by(["lang", "source"])
        .agg(pl.col("n").sum())
        if tbls
        else pl.DataFrame({"lang": [], "source": [], "n": []})
    )
    doc_paths = {
        f"\\{ROOT}\\{l}\\{s}\\": int(n)
        for l, s, n in zip(counts["lang"], counts["source"], counts["n"])
    }
    paths = onto["c_fullname"].to_pylist()
    totals = [
        sum(n for p, n in doc_paths.items() if p.startswith(row_path))
        for row_path in paths
    ]
    return onto.append_column("c_totalnum", pa.array(totals, pa.int64()))


SQL_ONTOLOGY_WITH_TOTALS = f"""
WITH {_SQL_ONTO},
doc_counts AS (
  SELECT '\\Lang\\' || lang || '\\' || source || '\\' AS p,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY lang, source
)
SELECT o.c_hlevel, o.c_fullname, o.c_name, o.c_basecode,
       o.c_visualattributes, o.c_synonym_cd, o.c_metadataxml,
       CAST(COALESCE((SELECT SUM(d.n) FROM doc_counts d
                 WHERE d.p LIKE o.c_fullname || '%'), 0) AS BIGINT) AS c_totalnum
FROM onto o
"""


def concept_value_sets(sf_dir: str) -> pa.Table:
    """Value-set read (S3's last gap): parse each PRIMARY leaf concept's
    ``c_metadataxml`` back through the M16 parser and emit one row per enum
    member — the reference's readValueSet path
    (ksb/I2b2KnowledgeSourceBackend.java:1570-1614 +
    CMetadataXmlParser.java:39-193, golden family truth/testReadValueSet*).
    Round-trips generate (M17) -> parse (M16) end to end, so the oracle
    checks both directions."""
    from ..functions.value_metadata import parse_value_metadata

    onto = ontology_table(sf_dir)
    base, dt, ordinal, val = [], [], [], []
    seen: set[str] = set()
    for b, syn, xml in zip(
        onto["c_basecode"].to_pylist(),
        onto["c_synonym_cd"].to_pylist(),
        onto["c_metadataxml"].to_pylist(),
    ):
        if xml is None or syn == "Y" or b in seen:
            continue
        seen.add(b)
        vm = parse_value_metadata(xml)
        for i, v in enumerate(vm.enum_values):
            base.append(b)
            dt.append(vm.datatype)
            ordinal.append(i + 1)
            val.append(v)
    return pa.table(
        {
            "c_basecode": pa.array(base, pa.string()),
            "vm_datatype": pa.array(dt, pa.string()),
            "ordinal": pa.array(ordinal, pa.int64()),
            "vm_value": pa.array(val, pa.string()),
        }
    )


SQL_CONCEPT_VALUE_SETS = """
WITH pairs AS (SELECT DISTINCT lang, source FROM documents)
SELECT 'SRC:' || source AS c_basecode,
       'Enum' AS vm_datatype,
       CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY lang) AS BIGINT)
         AS ordinal,
       lang AS vm_value
FROM pairs
"""
