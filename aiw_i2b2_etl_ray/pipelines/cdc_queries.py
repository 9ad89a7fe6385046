"""Driver-facing CDC queries: the star-schema outputs computed over a
change stream derived deterministically from the driver's ``events`` table
(sources.changes.changes_from_events), so each has an exact DuckDB oracle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..config import ModifierSpec
from ..sources.changes import CHANGES_FROM_EVENTS_SQL, changes_from_events
from ..stages import dims as dims_mod
from .cdc_replay import replay_table

_NP = 16  # partitions at correctness scale


# --- modifier specs for the catalog stream ----------------------------------
# content = lang ':' props ':' digit (changes_from_events); the extractors
# run in the Normalizer, so only the extracted value crosses the shuffle.


def _extract_props(t: pa.Table) -> pa.Array:
    """The props field of the payload (positional: between the lang prefix
    and the 2-char ':d' suffix); empty -> absent (null)."""
    import polars as pl

    df = pl.from_arrow(t.select(["content", "lang"]))
    val = df.select(
        pl.col("content")
        .cast(pl.String)
        .str.slice(
            pl.col("lang").str.len_chars() + 1,
            pl.col("content").cast(pl.String).str.len_chars()
            - pl.col("lang").str.len_chars()
            - 3,
        )
        .alias("v")
    )["v"]
    out = val.to_frame().select(
        pl.when(pl.col("v").str.len_chars() > 0).then(pl.col("v")).alias("v")
    )["v"]
    return out.to_arrow()


def _extract_del(t: pa.Table) -> pa.Array:
    """Tombstone marker modifier: present iff op='D' (the conditional case)."""
    return pc.if_else(
        pc.equal(t["op"], "D"), pa.scalar("tombstone"), pa.scalar(None, pa.string())
    )


MODIFIER_SPECS = (
    ModifierSpec(name="PROPS", extract=_extract_props),
    ModifierSpec(name="DEL", extract=_extract_del),
)


# --- shared materialized merge ----------------------------------------------
# The write path (replay()) computes every output in ONE pass; the read-only
# catalog mirrors that by materializing the merge ONCE per sf_dir and
# deriving every table from it — path_dim is the per-key LWW reduce over the
# already-deduped facts (the same reduction the merger performs), repo/lang
# dims fold the facts.  Without this, each catalog query re-ran
# normalize+shuffle from scratch.

from functools import lru_cache


def _stamp(sf_dir: str) -> tuple:
    """Memo key including the input file's (mtime, size): an in-process
    rewrite of events.parquet must never serve a stale materialization
    (same keying as dedup.minhash_pairs_cached; single-session cache —
    the blocks die with the Ray session)."""
    import os

    st = os.stat(f"{sf_dir}/events.parquet")
    return (sf_dir, st.st_mtime_ns, st.st_size)


@lru_cache(maxsize=4)
def _fact_cached_key(key: tuple) -> rd.Dataset:
    return replay_table(
        changes_from_events(key[0]), emit="fact", num_partitions=_NP
    ).materialize()


def _fact_cached(sf_dir: str) -> rd.Dataset:
    return _fact_cached_key(_stamp(sf_dir))


@lru_cache(maxsize=4)
def _fact_mod_cached_key(key: tuple) -> rd.Dataset:
    return replay_table(
        changes_from_events(key[0]),
        emit="fact",
        num_partitions=_NP,
        modifier_specs=MODIFIER_SPECS,
    ).materialize()


def _fact_mod_cached(sf_dir: str) -> rd.Dataset:
    return _fact_mod_cached_key(_stamp(sf_dir))


def _reduce_to_path_dim(facts: rd.Dataset) -> rd.Dataset:
    """Per-key last-writer-wins reduce of (already-deduped) facts into
    path_dim rows — the merger's reduction, re-expressed over a fact
    Dataset.

    Combiner-first: facts come out of the merge partitioned by pkey, so
    nearly every (repo, path) lives entirely in one block — a per-block
    LWW partial shrinks the table to ~path_dim size BEFORE the groupby
    shuffle (the all-to-all moves dim rows, not fact rows; ~26x fewer at
    sf0.1).  The reduce is associative: facts are change-id-deduped, so
    (repo, path, commit_seq) is unique and max-by-commit_seq composes."""
    import polars as pl

    from ..stages.merge import _path_dim_from_last

    COLS = ["repo", "path", "commit", "lang", "commit_seq", "op", "content_sha256"]

    def partial(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select(COLS))
            .sort("commit_seq", maintain_order=True)
            .group_by(["repo", "path"], maintain_order=True)
            .last()
            .to_arrow()
        )

    def to_pdim(g: pa.Table) -> pa.Table:
        last = (
            pl.from_arrow(g.select(COLS))
            .with_columns(pl.lit(None, dtype=pl.Int64).alias("size"))
            .sort("commit_seq", maintain_order=True)
            .group_by(["repo", "path"], maintain_order=True)
            .last()
        )
        return _path_dim_from_last(last)

    # batch_size=None => whole blocks, the widest (cheapest) combiner scope
    partials = facts.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return partials.groupby("repo").map_groups(to_pdim, batch_format="pyarrow")


@lru_cache(maxsize=4)  # the materialization memo — keyed on the input
def _path_dim_cached_key(key: tuple) -> rd.Dataset:  # stamp, NOT on the
    # (unhashable-identity) Dataset, so every path_dim-derived query
    # shares one executed reduce
    return _reduce_to_path_dim(_fact_cached(key[0])).materialize()


def _path_dim_cached(sf_dir: str) -> rd.Dataset:
    return _path_dim_cached_key(_stamp(sf_dir))


def cdc_path_dim(sf_dir: str) -> rd.Dataset:
    return _path_dim_cached(sf_dir)


def cdc_change_fact(sf_dir: str) -> rd.Dataset:
    return _fact_cached(sf_dir)


def cdc_change_fact_mod(sf_dir: str) -> rd.Dataset:
    """The fan-out-aware fact table: base rows (modifier_cd='@') plus one
    extra row per matched modifier property (PROPS always, DEL on
    tombstones) — the reference's one-event->N-fact-rows semantics."""
    return _fact_mod_cached(sf_dir)


def cdc_modifier_dim(sf_dir: str) -> pa.Table:
    """modifier_dimension analog: one row per distinct modifier code with
    path, first-seen seq and fact count (dedup pattern ST6 — each modifier
    path emitted once)."""
    import polars as pl
    import ray

    fact = _fact_mod_cached(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select(["modifier_cd", "commit_seq"]))
            .filter(pl.col("modifier_cd") != "@")
            .group_by("modifier_cd")
            .agg(
                pl.col("commit_seq").min().alias("mn"),
                pl.len().cast(pl.Int64).alias("n"),
            )
            .to_arrow()
        )

    mat = fact.map_batches(partial, batch_format="pyarrow").materialize()
    tbls = [t for t in ray.get(mat.to_arrow_refs()) if len(t)]
    from ..schemas import MODIFIER_DIM, ensure_columns

    if not tbls:
        return MODIFIER_DIM.empty_table()
    agg = (
        pl.from_arrow(pa.concat_tables(tbls))
        .group_by("modifier_cd")
        .agg(pl.col("mn").min().alias("first_seen_seq"), pl.col("n").sum().alias("n_facts"))
        .with_columns(
            (pl.lit("\\Mod\\") + pl.col("modifier_cd") + pl.lit("\\")).alias(
                "modifier_path"
            ),
            pl.col("modifier_cd").alias("name_char"),
        )
        .sort("modifier_cd")
    )
    return ensure_columns(agg.to_arrow(), MODIFIER_DIM)


def cdc_repo_dim(sf_dir: str) -> pa.Table:
    import ray

    pdim_t = pa.concat_tables(
        [t for t in ray.get(_path_dim_cached(sf_dir).to_arrow_refs()) if len(t)]
    )
    return dims_mod.repo_dim(_fact_cached(sf_dir), pdim_t)


def cdc_lang_dim(sf_dir: str) -> pa.Table:
    return dims_mod.lang_dim(_fact_cached(sf_dir))


def cdc_rejected(sf_dir: str) -> rd.Dataset:
    """The rejected side table (EK_REJECTED_OBSERVATION_FACT analog)."""

    def rej(t: pa.Table) -> pa.Table:
        def blank(col):
            return pc.or_(pc.is_null(col), pc.equal(pc.coalesce(col, ""), ""))

        bad = pc.or_(
            pc.or_(blank(t["repo"]), blank(t["path"])), blank(t["commit"])
        )
        out = t.filter(bad)
        return out.append_column("reason", pa.array(["null_key"] * len(out)))

    return changes_from_events(sf_dir).map_batches(rej, batch_format="pyarrow")


# --------------------------------------------------------------------------
# DuckDB oracles (column names match the Ray outputs exactly)
# --------------------------------------------------------------------------

_VALID = """
  valid AS (
    SELECT * FROM changes
    WHERE repo IS NOT NULL AND repo <> ''
      AND path IS NOT NULL AND path <> ''
      AND "commit" IS NOT NULL AND "commit" <> ''
  ),
  dedup AS (
    SELECT * FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY repo, path, "commit" ORDER BY commit_seq
      ) AS rn FROM valid
    ) WHERE rn = 1
  )
"""

_LAST = """
  last AS (
    SELECT * FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY repo, path ORDER BY commit_seq DESC
      ) AS rn2 FROM dedup
    ) WHERE rn2 = 1
  )
"""

SQL_PATH_DIM = f"""
WITH {CHANGES_FROM_EVENTS_SQL}, {_VALID}, {_LAST}
SELECT repo, path, lang,
       sha256(content)                                   AS content_sha256,
       "commit"                                          AS last_commit,
       commit_seq                                        AS last_commit_seq,
       CASE WHEN op = 'D' THEN make_timestamp(commit_seq) END AS delete_date,
       CAST(NULL AS BIGINT)                              AS size
FROM last
"""

SQL_CHANGE_FACT = f"""
WITH {CHANGES_FROM_EVENTS_SQL}, {_VALID}
SELECT repo, path, "commit", commit_seq, op, lang,
       sha256(content)                 AS content_sha256,
       CAST(length(content) AS BIGINT) AS content_len,
       '@'                             AS modifier_cd,
       CAST(NULL AS VARCHAR)           AS tval_modifier
FROM dedup
"""

#: base fact columns shared by every fan-out arm
_FACT_COLS = """repo, path, "commit", commit_seq, op, lang,
       sha256(content)                 AS content_sha256,
       CAST(length(content) AS BIGINT) AS content_len"""

SQL_CHANGE_FACT_MOD = f"""
WITH {CHANGES_FROM_EVENTS_SQL}, {_VALID}
SELECT {_FACT_COLS}, '@' AS modifier_cd, CAST(NULL AS VARCHAR) AS tval_modifier
FROM dedup
UNION ALL
SELECT {_FACT_COLS}, 'PROPS',
       substr(content, length(lang)+2, length(content)-length(lang)-3)
FROM dedup WHERE length(content)-length(lang)-3 > 0
UNION ALL
SELECT {_FACT_COLS}, 'DEL', 'tombstone'
FROM dedup WHERE op = 'D'
"""

SQL_MODIFIER_DIM = f"""
WITH {CHANGES_FROM_EVENTS_SQL}, {_VALID},
mods AS (
  SELECT 'PROPS' AS modifier_cd, commit_seq FROM dedup
  WHERE length(content)-length(lang)-3 > 0
  UNION ALL
  SELECT 'DEL', commit_seq FROM dedup WHERE op = 'D'
)
SELECT modifier_cd,
       '\\Mod\\' || modifier_cd || '\\' AS modifier_path,
       modifier_cd                      AS name_char,
       MIN(commit_seq)                  AS first_seen_seq,
       CAST(COUNT(*) AS BIGINT)         AS n_facts
FROM mods GROUP BY modifier_cd
"""

SQL_REPO_DIM = f"""
WITH {CHANGES_FROM_EVENTS_SQL}, {_VALID}, {_LAST},
  agg AS (
    SELECT repo,
           MIN(commit_seq) AS first_commit_seq,
           MAX(commit_seq) AS last_commit_seq
    FROM dedup GROUP BY repo
  ),
  live AS (
    SELECT repo, CAST(COUNT(*) AS BIGINT) AS n_paths_live
    FROM last WHERE op <> 'D' GROUP BY repo
  )
SELECT a.repo, a.first_commit_seq, a.last_commit_seq,
       COALESCE(l.n_paths_live, 0)      AS n_paths_live,
       CASE WHEN COALESCE(l.n_paths_live, 0) = 0
            THEN make_timestamp(a.last_commit_seq) END AS delete_date
FROM agg a LEFT JOIN live l USING (repo)
"""

SQL_LANG_DIM = f"""
WITH {CHANGES_FROM_EVENTS_SQL}, {_VALID}
SELECT lang, MIN(commit_seq) AS first_seen_seq
FROM dedup GROUP BY lang
"""

def cdc_author_dim(sf_dir: str) -> pa.Table:
    """Author dimension (provider_dimension analog,
    ProviderDimensionFactory.java:119-188): per author_id —

    - display name by FIRST-writer-wins (the provider dedup rule ST3:
      insert only if not yet cached == keep the name of the earliest
      event; several user_ids share an author_id so this is a real reduce);
    - first/last activity seq (the max-date reduction A5);
    - an A-Z hierarchy path from the name's initial
      (ProviderConceptTreeBuilder.java:30-100 alpha folders).

    Physical plan: per-batch argmin/min/max partials (combiner), tiny
    driver fold — min/max/argmin are insensitive to redelivered duplicates,
    so no change-id dedup pass is needed (duplicates carry identical seq
    and name)."""
    import polars as pl
    import ray

    ds = changes_from_events(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(
                t.select(["author_id", "author_name", "commit_seq", "repo", "path", "commit"])
            )
            .filter(  # validity parity with _VALID
                (pl.col("repo").fill_null("") != "")
                & (pl.col("path").fill_null("") != "")
                & (pl.col("commit").fill_null("") != "")
            )
            .sort("commit_seq")
            .group_by("author_id", maintain_order=True)
            .agg(
                pl.col("author_name").first().alias("name_at_mn"),
                pl.col("commit_seq").min().alias("mn"),
                pl.col("commit_seq").max().alias("mx"),
            )
            .to_arrow()
        )

    mat = ds.map_batches(partial, batch_format="pyarrow").materialize()
    tbls = [t for t in ray.get(mat.to_arrow_refs()) if len(t)]
    from ..schemas import AUTHOR_DIM, ensure_columns

    if not tbls:
        return AUTHOR_DIM.empty_table()
    agg = (
        pl.from_arrow(pa.concat_tables(tbls))
        .sort("mn")
        .group_by("author_id", maintain_order=True)
        .agg(
            pl.col("name_at_mn").first().alias("author_name"),
            pl.col("mn").min().alias("first_seen_seq"),
            pl.col("mx").max().alias("last_seen_seq"),
        )
        .with_columns(
            (
                pl.lit("\\Provider\\")
                + pl.col("author_name").str.slice(0, 1)
                + pl.lit("\\")
                + pl.col("author_name")
                + pl.lit("\\")
            ).alias("author_path")
        )
        .sort("author_id")
    )
    return ensure_columns(agg.to_arrow(), AUTHOR_DIM)


SQL_AUTHOR_DIM = f"""
WITH {CHANGES_FROM_EVENTS_SQL}, {_VALID},
ranked AS (
  SELECT author_id, author_name, commit_seq,
         ROW_NUMBER() OVER (PARTITION BY author_id ORDER BY commit_seq) AS rn
  FROM valid
),
agg AS (
  SELECT author_id, MIN(commit_seq) AS mn, MAX(commit_seq) AS mx
  FROM valid GROUP BY author_id
)
SELECT a.author_id,
       r.author_name,
       '\\Provider\\' || substr(r.author_name, 1, 1) || '\\'
         || r.author_name || '\\'  AS author_path,
       a.mn AS first_seen_seq,
       a.mx AS last_seen_seq
FROM agg a JOIN ranked r ON r.author_id = a.author_id AND r.rn = 1
"""


def cdc_key_map(sf_dir: str):
    """Surrogate-key mapping table (patient/encounter_mapping analog):
    dense int64 per distinct live (repo, path), in (repo, path) order."""
    from ..stages.keymap import key_map

    return key_map(sf_dir)


def cdc_state_asof(sf_dir: str) -> rd.Dataset:
    """Time-travel state read: path_dim reconstructed AS OF the stream's
    midpoint sequence (cut = max(commit_seq) // 2) — the CDC engine's
    answer to "what did the warehouse look like at commit S?".  The
    reference replays a bounded Protempa interval to the same effect
    (dest/I2b2QueryResultsHandler.java date-bounded queries; the engine's
    write path exposes it as ``ReplaySpec.min_seq/max_seq``); here the
    bound is applied to the already-deduped fact stream and the identical
    LWW reduce runs over the prefix.

    Plan: one tiny distributed max (the cut), a stateless filter, the
    shared per-repo LWW reduce — no extra shuffle beyond path_dim's own."""
    facts = _fact_cached(sf_dir)
    cut = int(facts.max("commit_seq")) // 2

    def bound(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(t["commit_seq"], cut))

    return _reduce_to_path_dim(facts.map_batches(bound, batch_format="pyarrow"))


SQL_STATE_ASOF = f"""
WITH {CHANGES_FROM_EVENTS_SQL}, {_VALID},
cut AS (SELECT MAX(commit_seq) // 2 AS s FROM dedup),
bounded AS (SELECT d.* FROM dedup d, cut WHERE d.commit_seq <= cut.s),
last AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY repo, path ORDER BY commit_seq DESC
    ) AS rn2 FROM bounded
  ) WHERE rn2 = 1
)
SELECT repo, path, lang,
       sha256(content)                                   AS content_sha256,
       "commit"                                          AS last_commit,
       commit_seq                                        AS last_commit_seq,
       CASE WHEN op = 'D' THEN make_timestamp(commit_seq) END AS delete_date,
       CAST(NULL AS BIGINT)                              AS size
FROM last
"""


def cdc_state_diff(sf_dir: str) -> rd.Dataset:
    """Incremental snapshot diff: what changed between sequence cuts
    A = max//3 and B = 2*max//3 — per (repo, path) one of
    'added' / 'modified' / 'deleted' with the content sha on each side.
    This is the CDC consumer's "what do I need to re-index since the
    last sync?" read (the reference's UPDATE-mode delta semantics,
    dest/I2b2QueryResultsHandler.java, expressed as a query).

    Scale plan — only TOUCHED keys ever shuffle: the window facts
    (A < seq <= B) define the touched key set; the prior history
    (seq <= A) SEMI-joins it distributed (``bucketed_join``, right keys
    deduped in-bucket — never a broadcast of a corpus-sized key set);
    the union groups per repo and a vectorized polars fold classifies
    each key from its last state at A vs at B.  Keys untouched in the
    window are provably unchanged and never enter the exchange — at
    100 TB the cost scales with the delta, not the corpus."""
    import polars as pl

    from ..stages.join import bucketed_join

    facts = _fact_cached(sf_dir)
    mx = int(facts.max("commit_seq"))
    a, b = mx // 3, (2 * mx) // 3

    def in_window(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.and_(pc.greater(t["commit_seq"], a), pc.less_equal(t["commit_seq"], b))
        )

    def upto_a(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(t["commit_seq"], a))

    win = facts.map_batches(in_window, batch_format="pyarrow")
    prior = facts.map_batches(upto_a, batch_format="pyarrow")
    # map-side dedup of the touched-key set: a key changed N times in the
    # window must ship ONE key row into the semi-join exchange, not N
    # (bucketed_join dedups right keys only after the all-to-all)
    touched = win.select_columns(["repo", "path"]).map_batches(
        lambda t: t.group_by(["repo", "path"]).aggregate([]),
        batch_format="pyarrow",
    )
    prior_t = bucketed_join(prior, touched, on=["repo", "path"], how="semi", num_buckets=32)
    hist = prior_t.union(win)

    def classify(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(
            g.select(["repo", "path", "commit_seq", "op", "content_sha256"])
        )
        agg = (
            df.sort("commit_seq", maintain_order=True)
            .group_by(["repo", "path"], maintain_order=True)
            .agg(
                pl.col("op").filter(pl.col("commit_seq") <= a).last().alias("op_a"),
                pl.col("content_sha256")
                .filter(pl.col("commit_seq") <= a)
                .last()
                .alias("sha_a"),
                pl.col("op").last().alias("op_b"),
                pl.col("content_sha256").last().alias("sha_b"),
            )
        )
        live_a = pl.col("op_a").is_not_null() & (pl.col("op_a") != "D")
        live_b = pl.col("op_b") != "D"
        return (
            agg.with_columns(
                pl.when(live_a & live_b & (pl.col("sha_a") != pl.col("sha_b")))
                .then(pl.lit("modified"))
                .when(live_a & ~live_b)
                .then(pl.lit("deleted"))
                .when(~live_a & live_b)
                .then(pl.lit("added"))
                .otherwise(None)
                .alias("change"),
                pl.when(live_a).then(pl.col("sha_a")).alias("sha_before"),
                pl.when(live_b).then(pl.col("sha_b")).alias("sha_after"),
            )
            .filter(pl.col("change").is_not_null())
            .select("repo", "path", "change", "sha_before", "sha_after")
            .to_arrow()
        )

    return hist.groupby("repo").map_groups(classify, batch_format="pyarrow")


SQL_STATE_DIFF = f"""
WITH {CHANGES_FROM_EVENTS_SQL}, {_VALID},
cut AS (SELECT MAX(commit_seq) // 3 AS a, 2 * MAX(commit_seq) // 3 AS b FROM dedup),
la AS (
  SELECT * FROM (
    SELECT d.*, ROW_NUMBER() OVER (
      PARTITION BY repo, path ORDER BY commit_seq DESC
    ) AS rn2 FROM dedup d, cut WHERE d.commit_seq <= cut.a
  ) WHERE rn2 = 1
),
lb AS (
  SELECT * FROM (
    SELECT d.*, ROW_NUMBER() OVER (
      PARTITION BY repo, path ORDER BY commit_seq DESC
    ) AS rn2 FROM dedup d, cut WHERE d.commit_seq <= cut.b
  ) WHERE rn2 = 1
),
j AS (
  SELECT lb.repo, lb.path,
         (la.op IS NOT NULL AND la.op <> 'D') AS live_a,
         (lb.op <> 'D')                       AS live_b,
         CASE WHEN la.op IS NOT NULL AND la.op <> 'D'
              THEN sha256(la.content) END     AS sha_before,
         CASE WHEN lb.op <> 'D'
              THEN sha256(lb.content) END     AS sha_after
  FROM lb LEFT JOIN la USING (repo, path)
)
SELECT repo, path,
       CASE WHEN live_a AND live_b THEN 'modified'
            WHEN live_a            THEN 'deleted'
            ELSE 'added' END AS change,
       sha_before, sha_after
FROM j
WHERE (live_a AND live_b AND sha_before <> sha_after)
   OR (live_a AND NOT live_b)
   OR (NOT live_a AND live_b)
"""


_SCD2_BUCKETS = 32


def cdc_scd2(sf_dir: str) -> rd.Dataset:
    """Type-2 (SCD2) history read: one validity interval per content
    VERSION of each (repo, path) — ``valid_from_seq`` is the version's
    commit_seq, ``valid_to_seq`` the NEXT change's seq (a later version
    or a tombstone; null while current), ``is_current`` = 1 iff the
    version is still live.  This is the lake-upsert engine's full-history
    product (Hudi/Delta-style SCD2) — the reference keeps the same
    history implicitly via UPDATE_DATE/DOWNLOAD_DATE audit columns on
    observation_fact (sql/i2b2_data_tables_1_7_h2.sql observation_fact
    DDL); here it is materialized as explicit intervals.

    Scale plan: an interval chain needs only ITS OWN key's rows
    co-located, so the shuffle key is ``bucket_hash(repo, path)`` — NOT
    ``repo`` (a mega-repo would pin one task; the bucket hash spreads its
    paths over all buckets with no skew).  Inside a bucket the whole
    chain computation is one vectorized polars sort + ``shift(-1) over
    (repo, path)`` — no per-key Python loop.  One keyed exchange total,
    carrying only the 5 projected columns."""
    return scd2_table(_fact_cached(sf_dir))


def scd2_table(facts: rd.Dataset) -> rd.Dataset:
    """Core of ``cdc_scd2`` over any deduped fact Dataset (see there)."""
    import polars as pl

    from ..functions.hashing import bucket_hash

    def prep(t: pa.Table) -> pa.Table:
        t = t.select(["repo", "path", "commit_seq", "op", "content_sha256"])
        return t.append_column(
            "_b", bucket_hash(t, ["repo", "path"], _SCD2_BUCKETS)
        )

    def intervals(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(
            g.select(["repo", "path", "commit_seq", "op", "content_sha256"])
        )
        return (
            df.sort(["repo", "path", "commit_seq"], maintain_order=True)
            .with_columns(
                pl.col("commit_seq")
                .shift(-1)
                .over(["repo", "path"])
                .cast(pl.Float64)  # float64 + null: both engines surface
                .alias("valid_to_seq")  # open intervals as NaN in pandas
            )
            .filter(pl.col("op") != "D")
            .select(
                "repo",
                "path",
                "content_sha256",
                pl.col("commit_seq").alias("valid_from_seq"),
                "valid_to_seq",
                pl.col("valid_to_seq").is_null().cast(pl.Int64).alias("is_current"),
            )
            .to_arrow()
        )

    return (
        facts.map_batches(prep, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(intervals, batch_format="pyarrow")
    )


SQL_SCD2 = f"""
WITH {CHANGES_FROM_EVENTS_SQL}, {_VALID},
v AS (
  SELECT repo, path, op, sha256(content) AS content_sha256, commit_seq,
         LEAD(commit_seq) OVER (
           PARTITION BY repo, path ORDER BY commit_seq
         ) AS valid_to_seq
  FROM dedup
)
SELECT repo, path, content_sha256,
       commit_seq                           AS valid_from_seq,
       CAST(valid_to_seq AS DOUBLE)         AS valid_to_seq,
       CAST(valid_to_seq IS NULL AS BIGINT) AS is_current
FROM v
WHERE op <> 'D'
"""


GAP_FACTOR = 4.0  # a gap is anomalous when > GAP_FACTOR x the repo's mean


def cdc_seq_audit(sf_dir: str) -> rd.Dataset:
    """Watermark-integrity audit: per repo, find anomalous HOLES in the
    commit-sequence tail — adjacent distinct commit_seqs whose delta
    exceeds ``GAP_FACTOR`` x that repo's mean delta.  A CDC consumer runs
    exactly this to detect a dropped binlog segment / compacted-away
    range before trusting a resume point (the engine's checkpoint
    manifest records per-partition watermarks; this query is the
    read-side verification of those watermarks over the landed stream).

    Scale plan — no single-repo task ever sees a whole repo:
    1. ONE distributed ``sort(repo, commit_seq)`` (the engine's only
       total-order primitive; range-partitioned, streaming).
    2. Per sorted block, vectorized ``np.diff`` emits within-block gap
       rows; each block also emits exactly its FIRST and LAST (repo,
       seq) pair.  Cross-block gaps fold on the driver from those
       2-rows-per-block summaries (block-count-sized, like the keymap
       prefix-sum), then union in as one tiny extra block.
    3. The per-repo mean needs NO second scan: adjacent-distinct deltas
       telescope, so ``AVG(gap) = (max-min)/(n_distinct-1)`` — every
       partial sum is integer-exact in float64, making the engine's mean
       bit-identical to DuckDB's AVG regardless of fold order.  Repo
       means (one row per repo) gather bounded and broadcast into the
       final threshold filter."""
    return seq_audit_table(_fact_cached(sf_dir))


def seq_audit_table(facts: rd.Dataset) -> rd.Dataset:
    """Core of ``cdc_seq_audit`` over any deduped fact Dataset (see
    there); split out so tests can drive it with forced block layouts."""
    import numpy as np
    import ray

    from ray.data.aggregate import Count, Sum

    from ..functions.numeric import round_half_away

    srt = facts.select_columns(["repo", "commit_seq"]).sort(["repo", "commit_seq"])

    def block_gaps(t: pa.Table) -> pa.Table:
        """Within-block adjacent-distinct deltas (dup seqs from the
        at-least-once tail collapse map-side), plus the block's FIRST and
        LAST distinct rows flagged with an ``_edge`` bitmask (1 = block
        first, 2 = block last, 3 = both — a single-distinct-row block)
        for the driver's cross-block fold."""
        if len(t) == 0:
            return pa.table(
                {
                    "repo": pa.array([], pa.string()),
                    "commit_seq": pa.array([], pa.int64()),
                    "gap": pa.array([], pa.int64()),
                    "_edge": pa.array([], pa.int32()),
                }
            )
        repos = t["repo"].to_numpy(zero_copy_only=False)
        seqs = t["commit_seq"].to_numpy()
        same = np.zeros(len(t), dtype=bool)
        same[1:] = (repos[1:] == repos[:-1]) & (seqs[1:] == seqs[:-1])
        repos, seqs = repos[~same], seqs[~same]
        gap = np.empty(len(seqs), dtype=np.int64)
        gap[0] = 0
        gap[1:] = np.where(repos[1:] == repos[:-1], np.diff(seqs), 0)
        keep = gap > 0
        keep[0] = keep[-1] = True  # edges always travel to the fold
        edge = np.zeros(len(seqs), dtype=np.int32)
        edge[0] |= 1
        edge[-1] |= 2
        return pa.table(
            {
                "repo": pa.array(repos[keep]),
                "commit_seq": pa.array(seqs[keep]),
                "gap": pa.array(gap[keep]),
                "_edge": pa.array(edge[keep]),
            }
        )

    gaps_all = srt.map_batches(block_gaps, batch_format="pyarrow").materialize()

    # driver fold: <=2 rows/block -> the gaps the block boundaries hide.
    # Sorting the edge rows by (repo, seq) reconstructs block order
    # (blocks are contiguous ranges of the sorted key space), so a
    # cross-block adjacent pair is exactly a LAST-flagged row followed by
    # a FIRST-flagged row; a same-block (first, last) adjacency pairs
    # 1-then-2 and is skipped — its span is already covered by the
    # block's own in-block diffs.
    edges = (
        gaps_all.map_batches(
            lambda t: t.filter(pc.greater(t["_edge"], 0)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values(["repo", "commit_seq"], kind="mergesort")
        .reset_index(drop=True)
    )
    xr = edges["repo"].to_numpy()
    xs = edges["commit_seq"].to_numpy()
    xe = edges["_edge"].to_numpy()
    brepo, bseq, bgap = [], [], []
    for i in range(1, len(xs)):
        if (
            (xe[i - 1] & 2)  # prev row closes a block
            and (xe[i] & 1)  # this row opens the next one
            and xr[i] == xr[i - 1]
            and xs[i] != xs[i - 1]  # equal = cross-block duplicate, no gap
        ):
            brepo.append(xr[i])
            bseq.append(int(xs[i]))
            bgap.append(int(xs[i] - xs[i - 1]))
    cross = pa.table(
        {
            "repo": pa.array(brepo, pa.string()),
            "commit_seq": pa.array(bseq, pa.int64()),
            "gap": pa.array(bgap, pa.int64()),
        }
    )

    intra = gaps_all.map_batches(
        lambda t: t.filter(pc.greater(t["gap"], 0)).select(
            ["repo", "commit_seq", "gap"]
        ),
        batch_format="pyarrow",
    )
    all_gaps = intra.union(rd.from_arrow(cross)) if len(cross) else intra

    stats = (
        all_gaps.groupby("repo")
        .aggregate(Sum("gap", alias_name="span"), Count(alias_name="n"))
        .to_pandas()  # one row per repo — bounded by the repo universe
    )
    means = {
        r: s / n for r, s, n in zip(stats["repo"], stats["span"], stats["n"])
    }
    means_ref = ray.put(means)

    class Flag:
        def __init__(self):
            self.means = ray.get(means_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table(
                    {
                        "repo": pa.array([], pa.string()),
                        "commit_seq": pa.array([], pa.int64()),
                        "gap": pa.array([], pa.int64()),
                        "gap_ratio": pa.array([], pa.float64()),
                    }
                )
            import pandas as pd

            avg = (
                pd.Series(t["repo"].to_numpy(zero_copy_only=False))
                .map(self.means)  # vectorized dict probe, no row loop
                .to_numpy(dtype=np.float64)
            )
            gap = t["gap"].to_numpy().astype(np.float64)
            keep = gap > GAP_FACTOR * avg
            t = t.filter(pa.array(keep))
            ratio = round_half_away(gap[keep] / avg[keep], 4)
            return pa.table(
                {
                    "repo": t["repo"],
                    "commit_seq": t["commit_seq"],
                    "gap": t["gap"],
                    "gap_ratio": pa.array(ratio),
                }
            )

    return all_gaps.map_batches(Flag, concurrency=(1, 4), batch_format="pyarrow")


SQL_SEQ_AUDIT = f"""
WITH {CHANGES_FROM_EVENTS_SQL}, {_VALID},
d AS (SELECT DISTINCT repo, commit_seq FROM dedup),
g AS (
  SELECT repo, commit_seq,
         commit_seq - LAG(commit_seq) OVER (
           PARTITION BY repo ORDER BY commit_seq
         ) AS gap
  FROM d
),
s AS (
  SELECT repo, AVG(CAST(gap AS DOUBLE)) AS avg_gap
  FROM g WHERE gap IS NOT NULL GROUP BY repo
)
SELECT g.repo, g.commit_seq, g.gap,
       ROUND(CAST(g.gap AS DOUBLE) / s.avg_gap, 4) AS gap_ratio
FROM g JOIN s USING (repo)
WHERE CAST(g.gap AS DOUBLE) > {GAP_FACTOR} * s.avg_gap
"""


def cdc_repo_map(sf_dir: str) -> rd.Dataset:
    """Repo-level surrogate mapping — the PATIENT_MAPPING analog
    (sql/i2b2_data_tables_1_7_h2.sql:122-134; EK_INSERT_PID_MAP_FROMTEMP
    assignment), the coarser sibling of ``cdc_key_map``'s
    ENCOUNTER_MAPPING: one row per distinct repo with a dense int64
    ``repo_num`` in repo order, the path count, and the reference's
    mapping-status flag ('A'ctive while any path is live, 'D'eleted once
    every path carries a tombstone — the patient_mapping STATUS_CD).

    Physical plan: per-batch combiner partials over the already-reduced
    path_dim (one row per (repo, path), so COUNT there == distinct-path
    count), ONE small keyed aggregate on repo, then the two-phase
    global-index id assignment (per-block counts -> driver prefix-sum) —
    no full-row shuffle, and nothing driver-side beyond one int per block."""
    import polars as pl

    from ray.data.aggregate import Sum

    from ..stages.keymap import global_index

    pdim = _path_dim_cached(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select(["repo", "delete_date"]))
            .group_by("repo")
            .agg(
                pl.len().cast(pl.Int64).alias("pn"),
                pl.col("delete_date").is_null().sum().cast(pl.Int64).alias("pv"),
            )
            .to_arrow()
        )

    agg = (
        pdim.map_batches(partial, batch_format="pyarrow")
        .groupby("repo")
        .aggregate(Sum("pn", alias_name="n_paths"), Sum("pv", alias_name="n_live"))
    )

    def finish(t: pa.Table) -> pa.Table:
        status = pc.if_else(
            pc.greater(t["n_live"], 0), pa.scalar("A"), pa.scalar("D")
        )
        return t.select(["repo", "n_paths"]).append_column("status", status)

    keyed = agg.map_batches(finish, batch_format="pyarrow")
    return global_index(keyed, ["repo"], id_name="repo_num")


SQL_REPO_MAP = f"""
WITH {CHANGES_FROM_EVENTS_SQL}, {_VALID}, {_LAST},
per AS (
  SELECT repo,
         CAST(COUNT(*) AS BIGINT) AS n_paths,
         CAST(SUM(CASE WHEN op <> 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_live
  FROM last GROUP BY repo
)
SELECT repo, n_paths,
       CASE WHEN n_live > 0 THEN 'A' ELSE 'D' END AS status,
       ROW_NUMBER() OVER (ORDER BY repo) AS repo_num
FROM per
"""


SQL_KEY_MAP = f"""
WITH {CHANGES_FROM_EVENTS_SQL}, {_VALID}, {_LAST}
SELECT repo, path,
       ROW_NUMBER() OVER (ORDER BY repo, path) AS path_num
FROM last
"""


SQL_REJECTED = f"""
WITH {CHANGES_FROM_EVENTS_SQL}
SELECT *, 'null_key' AS reason FROM changes
WHERE repo IS NULL OR repo = '' OR path IS NULL OR path = ''
   OR "commit" IS NULL OR "commit" = ''
"""


# --- operational reads: churn hot-list + tombstone GC plan -------------------
HOT_KEYS_K = 100


def cdc_hot_keys(sf_dir: str) -> rd.Dataset:
    """Churn hot-list: the top-``HOT_KEYS_K`` most-changed (repo, path)
    keys by applied-change count.  This is the read that FEEDS the
    engine's own skew machinery — its output is exactly the ``hot_keys``
    set ``stages.join.bucketed_join`` and the replay merger's salted
    sub-partitioning accept (the reference hits the same skew on
    mega-encounter patients; here it is measured, not guessed).

    Plan: per-batch combiner partials (each batch collapses to its
    distinct keys) -> ONE keyed Sum over the distinct-key table
    (dim-sized, not fact-sized) -> global sort-limit for the top-K with
    a deterministic (n DESC, repo, path) tiebreak."""
    import polars as pl

    from ray.data.aggregate import Sum

    facts = _fact_cached(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select(["repo", "path"]))
            .group_by(["repo", "path"])
            .agg(pl.len().cast(pl.Int64).alias("pn"))
            .to_arrow()
        )

    return (
        facts.map_batches(partial, batch_format="pyarrow")
        .groupby(["repo", "path"])
        .aggregate(Sum("pn", alias_name="n_changes"))
        .sort(["n_changes", "repo", "path"], descending=[True, False, False])
        .limit(HOT_KEYS_K)
    )


SQL_HOT_KEYS = f"""
WITH {CHANGES_FROM_EVENTS_SQL}, {_VALID}
SELECT repo, path, COUNT(*) AS n_changes
FROM dedup
GROUP BY repo, path
ORDER BY n_changes DESC, repo, path
LIMIT {HOT_KEYS_K}
"""


def cdc_tombstone_gc(sf_dir: str) -> rd.Dataset:
    """Tombstone GC plan: deleted keys whose tombstone is at or below the
    stream's midpoint sequence — safe to physically purge because every
    consumer checkpoint is past them (the compacted-topic / snapshot-
    expiry maintenance read; the reference's logical-delete rows get the
    same periodic sweep).  A stateless filter over the already-reduced
    path_dim: zero additional shuffle, streaming end to end."""
    pdim = _path_dim_cached(sf_dir)
    facts = _fact_cached(sf_dir)
    horizon = int(facts.max("commit_seq")) // 2

    def plan(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_valid(t["delete_date"]),
            pc.less_equal(t["last_commit_seq"], horizon),
        )
        return t.filter(keep).select(["repo", "path", "last_commit_seq"])

    return pdim.map_batches(plan, batch_format="pyarrow")


SQL_TOMBSTONE_GC = f"""
WITH {CHANGES_FROM_EVENTS_SQL}, {_VALID}, {_LAST},
cut AS (SELECT MAX(commit_seq) // 2 AS s FROM dedup)
SELECT repo, path, commit_seq AS last_commit_seq
FROM last, cut
WHERE op = 'D' AND commit_seq <= cut.s
"""


# --- operational read: rename detection across the converged state -----------
def cdc_renames(sf_dir: str) -> "rd.Dataset":
    """Rename detection (the git `-M`-style move heuristic over the
    converged CDC state): for every currently-DELETED (repo, path), find
    a live path in the same repo whose current content digest equals the
    deleted path's last pre-delete digest — content that "moved" rather
    than died.  The reference's key-remap tables
    (dest/table/PatientMappingHandler.java analog) answer the same
    question for re-identified entities.

    Physical plan: ONE streaming pass over the fact table builds, per
    (repo, path), the last row AND the last non-delete row as map-side
    argmax partials (both "last"s are associative, so each batch emits
    ≤ 2 rows per touched key); the fold groups by repo only — the inner
    per-path argmax is one vectorized polars pass, the same
    bounded-group pattern as ``_reduce_to_path_dim`` (paths per repo is
    bounded; repos are not).  Rename matching is repo-local by
    definition, and the repo-keyed sort has already co-located every
    repo's rows — so the dead-digest/live-digest join happens INSIDE the
    fold as a group-local polars hash join (one shuffle total; no second
    groupby, no cross-group join stage).  A per-(repo, digest) min-path
    pre-reduce inside the group keeps a mass-duplicated digest
    1:1-bounded instead of O(dead x live) candidate pairs."""
    return renames_table(_fact_cached(sf_dir))


def renames_table(facts: rd.Dataset) -> "rd.Dataset":
    """Core of ``cdc_renames`` over any deduped fact Dataset (see there);
    split out so tests can drive it with crafted change streams."""
    import polars as pl

    def last_partials(t: pa.Table) -> pa.Table:
        # _fact_cached is the base fact table (modifier_cd uniformly '@'),
        # so no fan-out rows need excluding here
        df = pl.from_arrow(
            t.select(["repo", "path", "commit_seq", "op", "content_sha256"])
        )
        a = (
            df.sort("commit_seq")
            .group_by(["repo", "path"], maintain_order=True)
            .last()
            .with_columns(pl.lit("a").alias("tag"))
        )
        l = (
            df.filter(pl.col("op") != "D")
            .sort("commit_seq")
            .group_by(["repo", "path"], maintain_order=True)
            .last()
            .with_columns(pl.lit("l").alias("tag"))
        )
        return pl.concat([a, l]).to_arrow()

    def fold(g: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(g)
            .sort("commit_seq")
            .group_by(["repo", "path", "tag"], maintain_order=True)
            .last()
        )
        last = df.filter(pl.col("tag") == "a")
        dead = last.filter(pl.col("op") == "D").select(["repo", "path"])
        pre = dead.join(
            df.filter(pl.col("tag") == "l"), on=["repo", "path"], how="inner"
        ).select(
            "repo",
            pl.col("path").alias("old_path"),
            pl.col("content_sha256").alias("digest"),
        )
        # SKEW GUARD: a mass-duplicated digest (license boilerplate,
        # vendored files — common in code corpora) would otherwise pair
        # every dead carrier with every live carrier (O(d x l) per
        # digest).  Only the MIN live path per (repo, digest) can ever be
        # the answer — and dead and live path sets are provably disjoint
        # per (repo, path) (each key has exactly ONE last state), so
        # min-over-all equals SQL's min-over-excluding-old_path.  The
        # pre-reduce keeps the group-local join 1:1-bounded.
        live_min = (
            last.filter(pl.col("op") != "D")
            .group_by("repo", pl.col("content_sha256").alias("digest"))
            .agg(pl.col("path").min().alias("new_path"))
        )
        return (
            pre.join(live_min, on=["repo", "digest"], how="inner")
            # kept for SQL parity; disjointness makes it a no-op
            .filter(pl.col("new_path") != pl.col("old_path"))
            .select(
                "repo",
                "old_path",
                "new_path",
                pl.col("digest").alias("content_sha256"),
            )
            .to_arrow()
        )

    out = (
        facts.map_batches(last_partials, batch_format="pyarrow")
        .groupby("repo")
        .map_groups(fold, batch_format="pyarrow")
        .materialize()  # bounded by true rename activity
    )
    if out.count() == 0:
        from ..util import empty_frame

        # all-blocks-empty loses the schema; return the typed empty frame
        return empty_frame(
            repo="string",
            old_path="string",
            new_path="string",
            content_sha256="string",
        )
    return out


SQL_RENAMES = f"""
WITH {CHANGES_FROM_EVENTS_SQL}, {_VALID}, {_LAST},
dead AS (SELECT repo, path FROM last WHERE op = 'D'),
pre AS (
  SELECT d.repo, d.path AS old_path, sha256(x.content) AS digest
  FROM dead d JOIN (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY repo, path ORDER BY commit_seq DESC
    ) AS rn3 FROM dedup WHERE op <> 'D'
  ) x ON x.repo = d.repo AND x.path = d.path AND x.rn3 = 1
),
live AS (SELECT repo, path, sha256(content) AS digest FROM last WHERE op <> 'D')
SELECT p.repo, p.old_path, MIN(l.path) AS new_path, p.digest AS content_sha256
FROM pre p
JOIN live l ON l.repo = p.repo AND l.digest = p.digest AND l.path <> p.old_path
GROUP BY p.repo, p.old_path, p.digest
"""


# --- operational read: per-path lang migrations (type-evolution audit) -------
def cdc_lang_migrations(sf_dir: str) -> "rd.Dataset":
    """Type-evolution audit: every (repo, path) whose ``lang``
    classification CHANGED across its change history, with the count of
    distinct langs and the first/last classification — the read a lake
    operator runs before trusting per-lang partitioning (the engine's
    lang_dim discovers values; this verifies per-key stability, the same
    drift the reference's XML-driven concept remapping absorbs,
    AbstractFactHandler.java's concept re-resolution).

    Physical plan: per-batch partials collapse to distinct
    (repo, path, lang) triples carrying (min_seq, max_seq) — one
    associative shape for BOTH the distinct-lang count and the
    deterministic first/last pick (ties on seq break by min lang, so the
    engine is fold-order independent and bit-identical to the windowed
    SQL); the fold groups by repo only (bounded groups, the
    ``_reduce_to_path_dim`` pattern) and the inner per-path rollup is one
    vectorized polars pass.  Nothing fact-sized ever shuffles — the
    exchange carries at most |paths| x |langs-per-path| rows."""
    return lang_migrations_table(_fact_cached(sf_dir))


def lang_migrations_table(facts: rd.Dataset) -> "rd.Dataset":
    """Core of ``cdc_lang_migrations`` (see there); split out so tests
    can drive it with crafted change streams."""
    import polars as pl

    def triple_partials(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select(["repo", "path", "lang", "commit_seq"]))
            .group_by(["repo", "path", "lang"])
            .agg(
                pl.col("commit_seq").min().alias("lo"),
                pl.col("commit_seq").max().alias("hi"),
            )
            .to_arrow()
        )

    def fold(g: pa.Table) -> pa.Table:
        per_lang = (
            pl.from_arrow(g)
            .group_by(["repo", "path", "lang"])
            .agg(pl.col("lo").min(), pl.col("hi").max())
        )
        return (
            per_lang.group_by(["repo", "path"])
            .agg(
                pl.len().cast(pl.Int64).alias("n_langs"),
                pl.col("lang")
                .filter(pl.col("lo") == pl.col("lo").min())
                .min()
                .alias("first_lang"),
                pl.col("lang")
                .filter(pl.col("hi") == pl.col("hi").max())
                .min()
                .alias("last_lang"),
            )
            .filter(pl.col("n_langs") > 1)
            .to_arrow()
        )

    return (
        facts.map_batches(triple_partials, batch_format="pyarrow")
        .groupby("repo")
        .map_groups(fold, batch_format="pyarrow")
    )


SQL_LANG_MIGRATIONS = f"""
WITH {CHANGES_FROM_EVENTS_SQL}, {_VALID},
per3 AS (
  SELECT repo, path, lang, MIN(commit_seq) AS lo, MAX(commit_seq) AS hi
  FROM dedup GROUP BY repo, path, lang
),
w AS (
  SELECT repo, path, lang, lo, hi,
         COUNT(*)  OVER (PARTITION BY repo, path) AS n_langs,
         MIN(lo)   OVER (PARTITION BY repo, path) AS lo_min,
         MAX(hi)   OVER (PARTITION BY repo, path) AS hi_max
  FROM per3
)
SELECT repo, path,
       CAST(MAX(n_langs) AS BIGINT)               AS n_langs,
       MIN(CASE WHEN lo = lo_min THEN lang END)   AS first_lang,
       MIN(CASE WHEN hi = hi_max THEN lang END)   AS last_lang
FROM w
GROUP BY repo, path
HAVING MAX(n_langs) > 1
"""


# --- operational read: cross-repo shared content (vendoring screen) ----------
def cdc_shared_content(sf_dir: str) -> "rd.Dataset":
    """Vendored/boilerplate screen over the converged state: content
    digests that appear LIVE in two or more repos, with how many repos
    and how many paths carry each — the read a code-corpus curator runs
    before per-repo dedup weights (license headers, vendored libraries,
    generated files), and the cross-repo complement of `dedup_exact`.

    Physical plan: the live state comes from the shared path_dim
    materialization (no fact re-scan); each block collapses to its
    distinct (digest, repo) pairs carrying a path count, so the first
    keyed exchange is pair-bounded (the q16 distinct-across-join
    pattern); a second combiner-first fold rolls pairs up to one row
    per digest (n_repos = pair count, n_paths = path-count sum) and the
    >=2-repos filter is vectorized."""
    return shared_content_table(_path_dim_cached(sf_dir))


def shared_content_table(pdim: rd.Dataset) -> "rd.Dataset":
    """Core of ``cdc_shared_content`` over any path_dim Dataset (see
    there); split out so tests can drive crafted states."""
    import polars as pl

    from ray.data.aggregate import Sum

    def pair_partial(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select(["repo", "content_sha256", "delete_date"]))
            .filter(pl.col("delete_date").is_null())
            .group_by(["content_sha256", "repo"])
            .agg(pl.len().cast(pl.Int64).alias("pp"))
            .to_arrow()
        )

    pairs = (
        pdim.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["content_sha256", "repo"])
        .aggregate(Sum("pp", alias_name="pair_paths"))
    )

    def digest_partial(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select(["content_sha256", "pair_paths"]))
            .group_by("content_sha256")
            .agg(
                pl.len().cast(pl.Int64).alias("pr"),
                pl.col("pair_paths").sum().alias("pn"),
            )
            .to_arrow()
        )

    out = (
        pairs.map_batches(digest_partial, batch_format="pyarrow")
        .groupby("content_sha256")
        .aggregate(Sum("pr", alias_name="n_repos"), Sum("pn", alias_name="n_paths"))
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["n_repos"], 2))
            if len(t) and "n_repos" in t.schema.names
            else pa.table(
                {
                    "content_sha256": pa.array([], pa.string()),
                    "n_repos": pa.array([], pa.int64()),
                    "n_paths": pa.array([], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()  # shared-digest-sized
    )
    if out.count() == 0:  # schema-stable empty result (SQL parity): an
        # all-deleted/all-rejected state has zero blocks, not typed ones
        from ..util import empty_frame

        return empty_frame(content_sha256="string", n_repos="int64", n_paths="int64")
    return out


SQL_SHARED_CONTENT = f"""
WITH {CHANGES_FROM_EVENTS_SQL}, {_VALID}, {_LAST},
live AS (SELECT repo, path, sha256(content) AS digest FROM last WHERE op <> 'D')
SELECT digest AS content_sha256,
       COUNT(DISTINCT repo) AS n_repos,
       COUNT(*)             AS n_paths
FROM live
GROUP BY digest
HAVING COUNT(DISTINCT repo) >= 2
"""


def cdc_reapply(sf_dir: str) -> rd.Dataset:
    """Full-redelivery convergence contract at the query surface: replay
    the change stream UNIONed with a complete second copy of itself (the
    worst-case at-least-once delivery — every change redelivered once)
    and reduce to path_dim.  The change-id dedup (first rn per
    (repo, path, commit), D4) must make the result IDENTICAL to the
    single-delivery ``cdc_path_dim``, so the oracle is ``SQL_PATH_DIM``
    itself — the exactly-once guarantee stated as an equality the driver
    hash-checks end-to-end (the checkpoint/crash-window pytest suite
    proves the same invariant for partial redelivery windows).

    Plan: both legs stream (two pruned reads); the doubled stream pays
    one normalize + one keyed exchange, same as the single-delivery
    path — dedup happens inside the per-partition merge state, nothing
    extra materializes."""
    doubled = changes_from_events(sf_dir).union(changes_from_events(sf_dir))
    return _reduce_to_path_dim(
        replay_table(doubled, emit="fact", num_partitions=_NP)
    )


SQL_REAPPLY = SQL_PATH_DIM  # convergence contract: redelivery is a no-op


def cdc_integrity(sf_dir: str) -> pa.Table:
    """Post-load referential-integrity census (A1 at repo granularity):
    per repo, the deduped change count, tombstone count, converged path
    count, live/deleted split, and distinct live languages — the
    counts-reconciliation read the reference logs after every load
    (table row counts vs. source counts) widened to the full star.  All
    columns are exact integers, so the oracle compare is drift-proof.

    Plan: two repo-keyed combiner-first folds over the shared fact and
    path_dim materializations (per-block polars partials, then a
    repo-count-sized groupby); the final repo-level join runs on the
    driver over dimension-sized tables (n_repos is config-bounded, the
    broadcast-dim discipline of ``cdc_repo_dim``)."""
    import polars as pl

    from ray.data.aggregate import Sum

    def fact_partial(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select(["repo", "op"]))
            .group_by("repo")
            .agg(
                pl.len().cast(pl.Int64).alias("pc"),
                (pl.col("op") == "D").sum().cast(pl.Int64).alias("pd"),
            )
            .to_arrow()
        )

    f = (
        _fact_cached(sf_dir)
        .map_batches(fact_partial, batch_format="pyarrow")
        .groupby("repo")
        .aggregate(Sum("pc", alias_name="n_changes"), Sum("pd", alias_name="n_deletes"))
        .to_pandas()  # repo-count-sized (config-bounded)
    )

    def pdim_partial(t: pa.Table) -> pa.Table:
        live = pl.col("delete_date").is_null()
        return (
            pl.from_arrow(t.select(["repo", "lang", "delete_date"]))
            .group_by("repo")
            .agg(
                pl.len().cast(pl.Int64).alias("pp"),
                live.sum().cast(pl.Int64).alias("pl"),
            )
            .to_arrow()
        )

    p = (
        _path_dim_cached(sf_dir)
        .map_batches(pdim_partial, batch_format="pyarrow")
        .groupby("repo")
        .aggregate(Sum("pp", alias_name="n_paths"), Sum("pl", alias_name="n_live"))
        .to_pandas()
    )

    # distinct live languages: per-block distinct pairs, then a pair-
    # bounded exact distinct (the q16 distinct-across-join pattern)
    def lang_pairs(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select(["repo", "lang", "delete_date"]))
            .filter(pl.col("delete_date").is_null())
            .select("repo", "lang")
            # NULL lang is not a language: COUNT(DISTINCT CASE...) in the
            # oracle skips NULLs, so the engine must too
            .drop_nulls("lang")
            .unique()
            .to_arrow()
        )

    from ray.data.aggregate import Count

    lp = (
        _path_dim_cached(sf_dir)
        .map_batches(lang_pairs, batch_format="pyarrow")
        .groupby(["repo", "lang"])
        .aggregate(Count(alias_name="_n"))
    )

    def lang_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "repo" not in t.schema.names:
            # sort-groupby emits schema-less blocks for empty reduce
            # partitions (the heavy_hitter_tokens lesson)
            return pa.table(
                {"repo": pa.array([], pa.string()), "pl": pa.array([], pa.int64())}
            )
        return (
            pl.from_arrow(t.select(["repo"]))
            .group_by("repo")
            .agg(pl.len().cast(pl.Int64).alias("pl"))
            .to_arrow()
        )

    nl = (
        lp.map_batches(lang_partial, batch_format="pyarrow")
        .groupby("repo")
        .aggregate(Sum("pl", alias_name="n_live_langs"))
        .to_pandas()
    )
    out = f.merge(p, on="repo").merge(nl, on="repo", how="left")
    out["n_live_langs"] = out["n_live_langs"].fillna(0).astype("int64")
    out = out.sort_values("repo").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_INTEGRITY = f"""
WITH {CHANGES_FROM_EVENTS_SQL}, {_VALID}, {_LAST},
f AS (
  SELECT repo,
         CAST(COUNT(*) AS BIGINT)                            AS n_changes,
         CAST(SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes
  FROM dedup GROUP BY repo
),
p AS (
  SELECT repo,
         CAST(COUNT(*) AS BIGINT)                                  AS n_paths,
         CAST(SUM(CASE WHEN op <> 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
         CAST(COUNT(DISTINCT CASE WHEN op <> 'D' THEN lang END) AS BIGINT) AS n_live_langs
  FROM last GROUP BY repo
)
SELECT f.repo, f.n_changes, f.n_deletes, p.n_paths, p.n_live, p.n_live_langs
FROM f JOIN p USING (repo)
"""
