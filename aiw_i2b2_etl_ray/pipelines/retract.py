"""Source-system-scoped retraction — the engine's analog of the reference's
``DELETE ... WHERE SOURCESYSTEM_CD IN (...)`` semi-join delete
(dest/I2b2QueryResultsHandler.java:1076-1093, J7): retract every row that
one source system (here: the ``lang`` column, set from the stream's source
tag) contributed, across all partitions of the star schema.

Physical plan: one Ray task per output partition file (partition-parallel,
no shuffle — the delete predicate is a per-row filter), rewriting fact /
path_dim / hot files in place (atomic tmp+rename) and refreshing each
touched partition's dimension partial so the driver can re-fold repo/lang
dims.  Retracted fact rows are archived rather than destroyed (the
reference's archive-keeps-history rule): each retraction run writes its
own ``archive/retractions/<run_id>/`` directory, so successive
retractions never overwrite each other's history and the merge-written
``archive/*.parquet`` table (ARCHIVE schema) stays uniformly readable.
"""

from __future__ import annotations

import glob
import os

import polars as pl
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..schemas import PATH_DIM, ensure_columns
from ..stages.merge import _atomic_write


@ray.remote
def _retract_fact_file(path: str, langs: tuple, archive_dir: str | None) -> int:
    t = pq.read_table(path)
    df = pl.from_arrow(t)
    hit = df.filter(pl.col("lang").is_in(list(langs)))
    if not len(hit):
        return 0
    keep = df.filter(~pl.col("lang").is_in(list(langs)))
    _atomic_write(ensure_columns(keep.to_arrow(), t.schema), path)
    if archive_dir is not None:
        base = os.path.basename(path).replace(".parquet", "")
        _atomic_write(
            hit.to_arrow(),
            os.path.join(archive_dir, f"retracted-fact-{base}.parquet"),
        )
    return len(hit)


@ray.remote
def _retract_path_file(path: str, langs: tuple, dimpart_dir: str | None) -> int:
    t = ensure_columns(pq.read_table(path), PATH_DIM)
    df = pl.from_arrow(t)
    hit = df.filter(pl.col("lang").is_in(list(langs)))
    if not len(hit):
        return 0
    keep = df.filter(~pl.col("lang").is_in(list(langs)))
    _atomic_write(ensure_columns(keep.to_arrow(), PATH_DIM), path)
    # refresh this partition's repo_live snapshot (canonical part files only)
    base = os.path.basename(path)
    if dimpart_dir is not None and base.startswith("part-"):
        dp_path = os.path.join(dimpart_dir, base)
        fresh_live = (
            keep.filter(pl.col("delete_date").is_null())
            .group_by("repo")
            .agg(pl.len().cast(pl.Int64).alias("live"))
            .select(
                pl.lit("repo_live").alias("kind"),
                pl.col("repo").alias("key"),
                pl.lit(None, dtype=pl.Int64).alias("mn"),
                pl.lit(None, dtype=pl.Int64).alias("mx"),
                "live",
            )
        )
        if os.path.exists(dp_path):
            prior = pl.from_arrow(pq.read_table(dp_path)).filter(
                pl.col("kind") != "repo_live"
            )
            fresh_live = pl.concat([prior, fresh_live])
        _atomic_write(fresh_live.to_arrow(), dp_path)
    return len(hit)


def retract_source(
    out_dir: str,
    langs: set[str],
    *,
    refold_dims: bool = True,
    run_id: str | None = None,
) -> dict:
    """Retract all rows a source system (``lang``) contributed, across every
    partition.  Returns counts.  ``refold_dims=True`` rebuilds
    repo_dim/lang_dim from the refreshed partials (min/max seq bounds keep
    their historical values — the reference's DELETE likewise leaves other
    tables' audit columns untouched).  ``run_id`` names this retraction's
    archive directory (auto-numbered when omitted) so repeated retractions
    keep independent history."""
    langs_t = tuple(sorted(langs))
    fact_files = sorted(glob.glob(os.path.join(out_dir, "change_fact", "*.parquet")))
    path_files = sorted(glob.glob(os.path.join(out_dir, "path_dim", "*.parquet")))
    retr_root = os.path.join(out_dir, "archive", "retractions")
    if run_id is None:
        # max existing number + 1, NOT count-of-dirs + 1: after a deleted
        # or renamed retraction dir the count can alias an id that still
        # exists, and the deterministic per-partition archive filenames
        # would silently overwrite that run's retracted-fact history
        taken = [
            int(os.path.basename(d)[1:])
            for d in glob.glob(os.path.join(retr_root, "r[0-9]*"))
            if os.path.basename(d)[1:].isdigit()
        ]
        run_id = f"r{max(taken, default=0) + 1:03d}"
    archive_dir = os.path.join(retr_root, run_id)
    if glob.glob(os.path.join(archive_dir, "*.parquet")):
        raise ValueError(
            f"retraction run_id {run_id!r} already has archived facts in "
            f"{archive_dir}; pick a fresh run_id (reuse would overwrite "
            "that run's retracted-fact history)"
        )
    os.makedirs(archive_dir, exist_ok=True)
    dimpart = os.path.join(out_dir, "_dimpart")

    fact_counts = ray.get(
        [_retract_fact_file.remote(f, langs_t, archive_dir) for f in fact_files]
    )
    path_counts = ray.get(
        [_retract_path_file.remote(f, langs_t, dimpart) for f in path_files]
    )

    # drop the retracted langs from every partition's fact partials so the
    # re-folded lang_dim no longer lists them
    for dp in sorted(glob.glob(os.path.join(dimpart, "*.parquet"))):
        df = pl.from_arrow(pq.read_table(dp))
        kept = df.filter(
            ~((pl.col("kind") == "lang") & pl.col("key").is_in(list(langs_t)))
        )
        if len(kept) != len(df):
            _atomic_write(kept.to_arrow(), dp)

    summary = {
        "facts_retracted": int(sum(fact_counts)),
        "paths_retracted": int(sum(path_counts)),
        "langs": list(langs_t),
        "run_id": run_id,
    }
    if refold_dims:
        from ..stages import dims as dims_mod
        from ..stages.merge import reduce_hot_rows

        hot_files = sorted(glob.glob(os.path.join(out_dir, "path_dim", "hot-*.parquet")))
        hot_all = None
        if hot_files:
            hot_all = reduce_hot_rows(
                pa.concat_tables(
                    [ensure_columns(pq.read_table(f), PATH_DIM) for f in hot_files]
                )
            )
        repo_t, lang_t, mod_t = dims_mod.fold_dim_partials(dimpart, hot_all)
        if len(repo_t):
            _atomic_write(repo_t, os.path.join(out_dir, "repo_dim", "repo_dim.parquet"))
            _atomic_write(lang_t, os.path.join(out_dir, "lang_dim", "lang_dim.parquet"))
    return summary
