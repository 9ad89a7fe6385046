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


#: Widened-schema constants, mirroring the reference's 25-column METADATA
#: insert (dest/table/MetaTableConceptHandler.java:38-44) and the concept
#: defaults in dest/metadata/UserObject.java:36-39,82-89: concept rows
#: query the concept_dimension, modifier rows the modifier_dimension
#: (PropositionConceptTreeBuilder.java:222-225, reference casing kept).
CONCEPT_TABLE_COLS = ("concept_cd", "concept_dimension", "concept_path")
MODIFIER_TABLE_COLS = ("MODIFIER_CD", "MODIFIER_DIMENSION", "MODIFIER_PATH")
COLUMN_DATATYPE = "T"  # DataType.TEXT, the UserObject default
SOURCESYSTEM_CONCEPTS = "DOCUMENTS"  # discovery source (the warehouse table)
SOURCESYSTEM_MODIFIERS = "CONFIG"  # modifiers come from the job's ModifierSpecs
MOD_ROOT = "Mod"


def _modifier_names() -> list[str]:
    """The configured modifier set (the reference's ModifierSpec list,
    conf/.../ModifierSpec — config, not data): the same specs the CDC
    fan-out applies (cdc_queries.MODIFIER_SPECS)."""
    from .cdc_queries import MODIFIER_SPECS

    return sorted(s.name for s in MODIFIER_SPECS)


def _operator(vis: str, dimcode: str) -> str:
    """ConceptOperator choice (UserObject.java:211-217): leaves — the
    queryable, in-data-source concepts — use '=' unless the dimcode
    contains '_' (the documented i2b2 1.7 LIKE-workaround); folders and
    modifiers aggregate by LIKE."""
    return "=" if vis == "LA" and "_" not in dimcode else "LIKE"


def build_tree(pairs: list[tuple[str, str]]) -> pa.Table:
    """Deterministic tree emission from a sorted (lang, source) pair set —
    the pure function both the one-shot query (``ontology_table``) and the
    persistent incremental merge (``ontology_store.update_ontology``) share,
    so an incrementally-merged table converges byte-identically to the
    one-shot build over the union of its inputs.

    Emits the reference's full 25-column METADATA schema
    (MetaTableConceptHandler.java:38-44): derived columns (c_dimcode =
    fullname per UserObject.getDimCode's null default, c_path/c_tooltip
    from the path walk in PathSupport.java:82-123, c_symbol = concept
    code) plus one modifier row per configured ModifierSpec with
    ``m_applied_path`` scoping it to the whole concept subtree
    (PropositionConceptTreeBuilder.java:221 appliedPath + '%'); concept
    rows carry the mandatory '@' default (UserObject.java:85).  The
    timestamp columns stay NULL: the engine is deterministically
    clock-free (see functions/dates.py — the reference's own tests ignore
    its wall-clock importTimestamp)."""
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

    n_concepts = len(fullname)
    for m in _modifier_names():
        hlevel.append(1)
        fullname.append(f"\\{MOD_ROOT}\\{m}\\")
        name.append(m)
        basecode.append(f"MOD:{m}")
        vis.append("RA")  # i2b2 modifier-leaf visual attributes
        syn.append("N")
        metaxml.append(None)

    n = len(fullname)
    is_mod = [i >= n_concepts for i in range(n)]
    dimcode = list(fullname)  # getDimCode null default -> fullname
    segs = [f.strip("\\").split("\\") for f in fullname]
    tooltip = ["".join(" \\ " + s for s in sg) for sg in segs]
    cpath = ["\\" + "\\".join(sg[:-1]) + ("\\" if len(sg) > 1 else "") for sg in segs]
    nulls_s = pa.nulls(n, pa.string())
    nulls_ts = pa.nulls(n, pa.timestamp("us"))

    return pa.table(
        {
            "c_hlevel": pa.array(hlevel, pa.int64()),
            "c_fullname": pa.array(fullname, pa.string()),
            "c_name": pa.array(name, pa.string()),
            "c_synonym_cd": pa.array(syn, pa.string()),
            "c_visualattributes": pa.array(vis, pa.string()),
            "c_totalnum": pa.nulls(n, pa.int64()),
            "c_basecode": pa.array(basecode, pa.string()),
            "c_metadataxml": pa.array(metaxml, pa.string()),
            "c_facttablecolumn": pa.array(
                [MODIFIER_TABLE_COLS[0] if m else CONCEPT_TABLE_COLS[0] for m in is_mod]
            ),
            "c_tablename": pa.array(
                [MODIFIER_TABLE_COLS[1] if m else CONCEPT_TABLE_COLS[1] for m in is_mod]
            ),
            "c_columnname": pa.array(
                [MODIFIER_TABLE_COLS[2] if m else CONCEPT_TABLE_COLS[2] for m in is_mod]
            ),
            "c_columndatatype": pa.array([COLUMN_DATATYPE] * n),
            "c_operator": pa.array(
                [_operator(v, d) for v, d in zip(vis, dimcode)]
            ),
            "c_dimcode": pa.array(dimcode, pa.string()),
            "c_comment": nulls_s,
            "c_tooltip": pa.array(tooltip, pa.string()),
            "update_date": nulls_ts,
            "download_date": nulls_ts,
            "import_date": nulls_ts,
            "sourcesystem_cd": pa.array(
                [SOURCESYSTEM_MODIFIERS if m else SOURCESYSTEM_CONCEPTS for m in is_mod]
            ),
            "valuetype_cd": nulls_s,  # ValueTypeCode.UNSPECIFIED has code null
            "m_applied_path": pa.array(
                [f"\\{ROOT}\\%" if m else "@" for m in is_mod]
            ),
            "m_exclusion_cd": nulls_s,
            "c_path": pa.array(cpath, pa.string()),
            "c_symbol": pa.array(basecode, pa.string()),  # getSymbol = conceptCode
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


#: The widened final column list (reference insert order,
#: MetaTableConceptHandler.java:38-44).
_ONTO_COLS = (
    "c_hlevel, c_fullname, c_name, c_synonym_cd, c_visualattributes, "
    "c_totalnum, c_basecode, c_metadataxml, c_facttablecolumn, c_tablename, "
    "c_columnname, c_columndatatype, c_operator, c_dimcode, c_comment, "
    "c_tooltip, update_date, download_date, import_date, sourcesystem_cd, "
    "valuetype_cd, m_applied_path, m_exclusion_cd, c_path, c_symbol"
)


def _onto_cte() -> str:
    """The shared onto CTE, all 25 columns + the c_parent edge helper;
    the modifier arm is generated from the configured ModifierSpec set so
    SQL and engine can never disagree on the modifier list."""
    mod_arms = "".join(
        f"""
  UNION ALL
  SELECT CAST(1 AS BIGINT), '\\Mod\\{m}\\', '{m}', 'N', 'RA',
         CAST(NULL AS BIGINT), 'MOD:{m}', CAST(NULL AS VARCHAR),
         'MODIFIER_CD', 'MODIFIER_DIMENSION', 'MODIFIER_PATH', 'T',
         'LIKE', '\\Mod\\{m}\\',
         CAST(NULL AS VARCHAR), ' \\ Mod \\ {m}',
         CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP),
         'CONFIG', CAST(NULL AS VARCHAR), '\\Lang\\%', CAST(NULL AS VARCHAR),
         '\\Mod\\', 'MOD:{m}', CAST(NULL AS VARCHAR)"""
        for m in _modifier_names()
    )
    return r"""
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
         'Lang' AS c_name, 'N' AS c_synonym_cd, 'FA' AS c_visualattributes,
         CAST(NULL AS BIGINT) AS c_totalnum,
         CAST(NULL AS VARCHAR) AS c_basecode,
         CAST(NULL AS VARCHAR) AS c_metadataxml,
         'concept_cd' AS c_facttablecolumn,
         'concept_dimension' AS c_tablename,
         'concept_path' AS c_columnname, 'T' AS c_columndatatype,
         'LIKE' AS c_operator, '\Lang\' AS c_dimcode,
         CAST(NULL AS VARCHAR) AS c_comment, ' \ Lang' AS c_tooltip,
         CAST(NULL AS TIMESTAMP) AS update_date,
         CAST(NULL AS TIMESTAMP) AS download_date,
         CAST(NULL AS TIMESTAMP) AS import_date,
         'DOCUMENTS' AS sourcesystem_cd,
         CAST(NULL AS VARCHAR) AS valuetype_cd,
         '@' AS m_applied_path, CAST(NULL AS VARCHAR) AS m_exclusion_cd,
         '\' AS c_path, CAST(NULL AS VARCHAR) AS c_symbol,
         CAST(NULL AS VARCHAR) AS c_parent
  UNION ALL
  SELECT CAST(1 AS BIGINT), '\Lang\' || lang || '\', lang, 'N', 'FA',
         CAST(NULL AS BIGINT), 'LANG:' || lang, CAST(NULL AS VARCHAR),
         'concept_cd', 'concept_dimension', 'concept_path', 'T',
         'LIKE', '\Lang\' || lang || '\',
         CAST(NULL AS VARCHAR), ' \ Lang \ ' || lang,
         CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP),
         'DOCUMENTS', CAST(NULL AS VARCHAR), '@', CAST(NULL AS VARCHAR),
         '\Lang\', 'LANG:' || lang, '\Lang\'
  FROM langs
  UNION ALL
  SELECT CAST(2 AS BIGINT), '\Lang\' || p.lang || '\' || p.source || '\', p.source,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY p.source ORDER BY p.lang) > 1
              THEN 'Y' ELSE 'N' END,
         'LA', CAST(NULL AS BIGINT), 'SRC:' || p.source, v.xml,
         'concept_cd', 'concept_dimension', 'concept_path', 'T',
         CASE WHEN strpos('\Lang\' || p.lang || '\' || p.source || '\', '_') = 0
              THEN '=' ELSE 'LIKE' END,
         '\Lang\' || p.lang || '\' || p.source || '\',
         CAST(NULL AS VARCHAR), ' \ Lang \ ' || p.lang || ' \ ' || p.source,
         CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP),
         'DOCUMENTS', CAST(NULL AS VARCHAR), '@', CAST(NULL AS VARCHAR),
         '\Lang\' || p.lang || '\', 'SRC:' || p.source,
         '\Lang\' || p.lang || '\'
  FROM pairs p JOIN vm v ON v.source = p.source""" + mod_arms + "\n)\n"


_SQL_ONTO = _onto_cte()

SQL_ONTOLOGY_TABLE = f"""
WITH {_SQL_ONTO}
SELECT {_ONTO_COLS}
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


def concept_ancestors(sf_dir: str) -> pa.Table:
    """Parent/ancestor navigation — the LevelReader's OTHER direction
    (ksb/LevelReader.java:116-141 ``readParentsFromDatabase``: given
    concept paths, read the rows above them): the full child->ancestor
    closure of the concept tree, one row per (concept, strict ancestor).
    Path-prefix semantics over the path-encoded table (ancestry IS prefix
    containment, PathSupport.java:89-94); modifier rows live outside the
    concept subtree and so contribute no rows.  The oracle computes the
    same closure with a prefix self-join."""
    import pyarrow.compute as pc

    onto = ontology_table(sf_dir)
    paths = onto["c_fullname"].to_pylist()
    names = onto["c_name"].to_pylist()
    levels = onto["c_hlevel"].to_pylist()
    by_path = {p: i for i, p in enumerate(paths)}
    child, anc, anc_name, anc_level = [], [], [], []
    for p in paths:
        # walk the encoded path upward: each proper prefix ending in '\'
        segs = p.strip("\\").split("\\")
        for k in range(1, len(segs)):
            a = "\\" + "\\".join(segs[:k]) + "\\"
            i = by_path.get(a)
            if i is None:
                continue  # modifier namespace has no materialized root
            child.append(p)
            anc.append(a)
            anc_name.append(names[i])
            anc_level.append(levels[i])
    return pa.table(
        {
            "c_fullname": pa.array(child, pa.string()),
            "anc_fullname": pa.array(anc, pa.string()),
            "anc_name": pa.array(anc_name, pa.string()),
            "anc_hlevel": pa.array(anc_level, pa.int64()),
        }
    )


SQL_CONCEPT_ANCESTORS = f"""
WITH {_SQL_ONTO}
SELECT o.c_fullname,
       a.c_fullname AS anc_fullname,
       a.c_name     AS anc_name,
       a.c_hlevel   AS anc_hlevel
FROM onto o
JOIN onto a
  ON starts_with(o.c_fullname, a.c_fullname)
 AND o.c_fullname <> a.c_fullname
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
    # fill the base table's NULL c_totalnum placeholder (the reference
    # inserts null at metadata load, I2b2QueryResultsHandler updates later)
    return onto.set_column(
        onto.column_names.index("c_totalnum"), "c_totalnum", pa.array(totals, pa.int64())
    )


_ONTO_COLS_NO_TOTAL = ", ".join(
    "o." + c for c in _ONTO_COLS.split(", ") if c != "c_totalnum"
)

SQL_ONTOLOGY_WITH_TOTALS = f"""
WITH {_SQL_ONTO},
doc_counts AS (
  SELECT '\\Lang\\' || lang || '\\' || source || '\\' AS p,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY lang, source
)
SELECT {_ONTO_COLS_NO_TOTAL},
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
