"""Arrow schema constants for every logical table the engine reads/writes.

The reference declares its table shapes externally as fixed DDL
(/root/reference/src/main/resources/sql/i2b2_data_tables_1_7_h2.sql and the
Liquibase changelog i2b2-data-schema-changelog.xml); we declare them as
``pyarrow.Schema`` constants.  Analog mapping (SURVEY.md §7.1):

    observation_fact   -> CHANGE_FACT     key (repo, path, commit)
    visit_dimension    -> PATH_DIM        key (repo, path)
    patient_dimension  -> REPO_DIM        key repo
    concept_dimension  -> LANG_DIM        key lang
    EK_REJECTED_OBSERVATION_FACT -> REJECTED
    (new) checkpoint manifest    -> MANIFEST
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# input: the change-event log (BASELINE.json input_hint)
# ---------------------------------------------------------------------------

#: Source contract columns.  ``content`` is large_string so a single block
#: can exceed 2 GiB of string data without offset overflow.
CHANGES = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.large_string()),
        # bookkeeping columns present in the log (FIXTURES.md §1)
        ("commit_seq", pa.int64()),
        ("op", pa.string()),  # I / U / D  (D = logical delete, cf. delete_date
        #                        in the reference: dest/table/FactHandler.java:159)
    ]
)

#: Schema-evolution variant: later segments of the log may carry extra
#: columns (e.g. ``size``).  Mirrors the reference's merging of new concepts
#: into an existing ontology (dest/metadata/Metadata.java:424-513).
CHANGES_V2 = CHANGES.append(pa.field("size", pa.int64()))

#: Columns that must survive the shuffle.  ``content`` is deliberately NOT
#: here: the normalize stage reduces it to (content_sha256, content_len)
#: so the all-to-all exchange moves ~100 bytes/row instead of the payload
#: (SURVEY.md §7.5 item 5).
SHUFFLE_COLUMNS = [
    "repo",
    "path",
    "commit",
    "lang",
    "commit_seq",
    "op",
    "content_sha256",
    "content_len",
    "size",
    "pkey",
]

# ---------------------------------------------------------------------------
# outputs (FIXTURES.md §2)
# ---------------------------------------------------------------------------

PATH_DIM = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("lang", pa.string()),
        ("content_sha256", pa.string()),
        ("last_commit", pa.string()),
        ("last_commit_seq", pa.int64()),
        ("delete_date", pa.timestamp("us")),  # non-null iff tombstoned
        ("size", pa.int64()),  # schema-evolution column, null-backfilled
    ]
)

REPO_DIM = pa.schema(
    [
        ("repo", pa.string()),
        ("first_commit_seq", pa.int64()),
        ("last_commit_seq", pa.int64()),
        ("n_paths_live", pa.int64()),
        ("delete_date", pa.timestamp("us")),
    ]
)

LANG_DIM = pa.schema(
    [
        ("lang", pa.string()),
        ("first_seen_seq", pa.int64()),
    ]
)

CHANGE_FACT = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("commit_seq", pa.int64()),
        ("op", pa.string()),
        ("lang", pa.string()),
        ("content_sha256", pa.string()),
        ("content_len", pa.int64()),
        # modifier fan-out (reference: one extra fact row per matched
        # modifier property, modifier_cd default '@' on the base row —
        # dest/table/PropositionFactHandler.java:163-186,
        # ObservationFact.java:28-70)
        ("modifier_cd", pa.string()),
        ("tval_modifier", pa.string()),
    ]
)

#: provider_dimension analog (dest/table/ProviderDimension.java,
#: ProviderDimensionFactory.java:119-188 first-writer-wins dedup + max-date
#: name reduce; A-Z hierarchy ProviderConceptTreeBuilder.java:30-100).
AUTHOR_DIM = pa.schema(
    [
        ("author_id", pa.string()),
        ("author_name", pa.string()),
        ("author_path", pa.string()),
        ("first_seen_seq", pa.int64()),
        ("last_seen_seq", pa.int64()),
    ]
)

#: modifier_dimension analog (dest/table/ModifierDimension.java,
#: ModifierDimensionHandler.java:32-38; path dedup ModifierDimensionLoader
#: .java:38-48): one row per distinct modifier code observed in the stream.
MODIFIER_DIM = pa.schema(
    [
        ("modifier_cd", pa.string()),
        ("modifier_path", pa.string()),
        ("name_char", pa.string()),
        ("first_seen_seq", pa.int64()),
        ("n_facts", pa.int64()),
    ]
)

REJECTED = CHANGES.append(pa.field("reason", pa.string()))

#: ARCHIVE_OBSERVATION_FACT analog (i2b2_data_tables_1_7_h2.sql:139-163):
#: the reference KEEPS replaced/overwritten rows; we archive the prior
#: path_dim state row whenever an update run's winner displaces it.
ARCHIVE = pa.schema(
    list(PATH_DIM)
    + [
        ("replaced_by_seq", pa.int64()),  # the winning event's commit_seq
        ("archived_run_id", pa.string()),
    ]
)

MANIFEST = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("watermark_seq", pa.int64()),
        ("rows_applied", pa.int64()),
        ("dups_dropped", pa.int64()),
        ("conflicts_resolved", pa.int64()),
        ("rows_rejected", pa.int64()),
        ("schema_version", pa.int32()),
    ]
)


def ensure_columns(t: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project ``t`` onto ``schema``, adding all-null columns for missing
    fields and casting present ones.  This is the engine's Arrow analog of
    the reference's null-tolerant staging inserts + schema reconciliation
    (dest/metadata/Metadata.java:424-513): added columns are null-backfilled,
    widened columns are cast."""
    cols = []
    n = len(t)
    for field in schema:
        if field.name in t.column_names:
            col = t[field.name]
            if col.type != field.type:
                col = col.cast(field.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, field.type))
    return pa.table(cols, schema=schema)
