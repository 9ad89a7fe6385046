"""The flagship pipeline: full CDC replay to a converged Parquet star schema.

Logical plan (one wide shuffle total):

    read_parquet (pruned)                          # sources.read_changes
      -> map_batches(Normalizer, pyarrow, actors)  # digest + validate + pkey
      -> [filter: skip committed partitions]       # resume path
      -> groupby(pkey).map_groups(PartitionMerger) # THE shuffle + merge
      -> [driver] fold hot-key winners             # tiny per-key reduce
      -> dims from the (already reduced) fact output

Reference lifecycle parity (dest/I2b2QueryResultsHandler.java): start() ->
config + broadcast state; handleQueryResult -> Normalizer; finish() ->
merge procs == PartitionMerger; the count/report queries (:751-837) ->
lineage manifest.
"""

from __future__ import annotations

import glob
import os
import sys
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..config import ReplaySpec, out_paths
from ..sources.changes import read_changes
from ..stages import dims as dims_mod
from ..stages.merge import PartitionMerger, reduce_hot_rows
from ..stages.normalize import Normalizer
from ..state import manifest as mf
from ..util import worker_runtime_env


HOT_TOPK_PER_BLOCK = 512


def find_hot_keys(ds: rd.Dataset, threshold: int) -> set[str]:
    """Pre-pass hot-key discovery, heavy-hitters style: each block emits
    only its top-K key counts (a tiny partial, no shuffle at all); the
    driver sums the partials and thresholds.

    This can UNDER-count a key that never makes a block's top-K, so apply a
    0.5 safety factor — a miss only costs salting (performance), never
    correctness.  Far cheaper than an exact groupby over every (repo, path):
    the full rows never leave their block."""
    import polars as pl

    def partial(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select(["repo", "path"]))
            # null/empty keys are rejected rows downstream — never hot.
            .filter(pl.col("repo").is_not_null() & pl.col("path").is_not_null())
            .group_by(["repo", "path"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .top_k(HOT_TOPK_PER_BLOCK, by="n")
            .to_arrow()
        )

    mat = ds.map_batches(
        partial, batch_format="pyarrow", **worker_runtime_env()
    ).materialize()  # single execution; partials are tiny
    tbls = [t for t in ray.get(mat.to_arrow_refs()) if len(t)]
    if not tbls:
        return set()
    merged = (
        pl.from_arrow(pa.concat_tables(tbls))
        .group_by(["repo", "path"])
        .agg(pl.col("n").sum())
        .filter(pl.col("n") >= max(1, threshold // 2))
    )
    return {
        f"{r}\x1f{p}" for r, p in zip(merged["repo"].to_list(), merged["path"].to_list())
    }


def find_hot_keys_local(files: list[str], threshold: int) -> set[str]:
    """Driver-local exact variant of find_hot_keys for small sampled inputs
    (column-pruned scan; no Ray stage startup cost).  Uses DuckDB because
    its thread pool is independent of the POLARS_MAX_THREADS=1 cap the
    harness sets for Ray workers — the driver-side scan should use every
    core."""
    import duckdb

    con = duckdb.connect()
    # file list + threshold go through parameter binding, never string
    # interpolation — a quote in a file name must not break the query
    rows = con.execute(
        """
        SELECT repo, path FROM read_parquet($files, union_by_name=true)
        WHERE repo IS NOT NULL AND path IS NOT NULL
        GROUP BY repo, path
        HAVING COUNT(*) >= $thr
        """,
        {"files": list(files), "thr": max(1, threshold // 2)},
    ).fetchall()
    con.close()
    return {f"{r}\x1f{p}" for r, p in rows}


def normalized(
    changes: rd.Dataset,
    spec: ReplaySpec,
    hot_keys: set[str] | None = None,
    modifier_specs: tuple = (),
) -> rd.Dataset:
    hot_ref = ray.put(hot_keys) if hot_keys else None
    # stateless tasks, not an actor pool: elastic parallelism, no pool
    # ramp-up; the Normalizer instance is pickled into each task (tiny —
    # the hot set travels by ObjectRef and is fetched from the local
    # object store inside the worker)
    # no explicit batch_size: one call per read block avoids a re-batching
    # copy (sha/hash kernels are size-agnostic)
    return changes.map_batches(
        Normalizer(spec.num_partitions, spec.salt_buckets, hot_ref, modifier_specs),
        batch_format="pyarrow",
        zero_copy_batch=True,
        **worker_runtime_env(),
    )


def merged_groups(norm: rd.Dataset, merger_kwargs: dict, spec: ReplaySpec) -> rd.Dataset:
    # AUTOSCALING actor pool (1, ~cpus): merge actors only exist after the
    # sort barrier releases blocks; a fixed pre-started pool would squat on
    # CPUs (num_cpus=1 each) while idle and starve read/normalize/sort —
    # measured 3x slower than autoscaling on the 10M-event bench.
    conc = spec.merge_concurrency
    if conc is None:
        conc = (1, max(2, int(ray.cluster_resources().get("CPU", 8))))
    kwargs = {"concurrency": conc}
    return norm.groupby("pkey").map_groups(
        PartitionMerger,
        fn_constructor_kwargs=merger_kwargs,
        batch_format="pyarrow",
        num_cpus=1,
        **worker_runtime_env(),
        **kwargs,
    )


def replay(
    input_path: str | rd.Dataset,
    spec: ReplaySpec,
    *,
    resume: bool = False,
    run_id: str | None = None,
    modifier_specs: tuple = (),
    _debug_skip_partitions=None,
) -> dict:
    """Entry point: runs :func:`_replay_impl` under the spec's shuffle
    strategy (push-based sort shuffle by default — measured ~18% faster on
    the keyed exchange single-node, and the multi-node-friendly scatter),
    restoring the session DataContext afterwards."""
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    prev = ctx.shuffle_strategy
    if spec.shuffle == "push":
        ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    # NOTE: ShuffleStrategy.HASH_SHUFFLE was evaluated for this exchange
    # (the merge needs co-location, not order, so a sort looks like wasted
    # work) and REJECTED: 3-6x slower than push-based sort shuffle at the
    # 2M-event scale, and its dedicated aggregator actors deadlock against
    # the autoscaling merge pool under constrained CPU (hangs at
    # num_cpus=8) — the same actor-pool-starves-internal-tasks failure
    # mode as the round-2 pool-before-sort livelock (BASELINE.md).
    try:
        return _replay_impl(
            input_path,
            spec,
            resume=resume,
            run_id=run_id,
            modifier_specs=modifier_specs,
            _debug_skip_partitions=_debug_skip_partitions,
        )
    finally:
        ctx.shuffle_strategy = prev


def _replay_impl(
    input_path: str | rd.Dataset,
    spec: ReplaySpec,
    *,
    resume: bool = False,
    run_id: str | None = None,
    modifier_specs: tuple = (),
    _debug_skip_partitions=None,
) -> dict:
    """Full checkpointed replay.  Returns output paths + lineage summary.

    - ``spec.mode == "replace"``: fresh build (existing outputs cleared).
    - ``spec.mode == "update"``: incremental tail apply on an existing
      out_dir — events at/below each partition's watermark are dropped
      (exactly-once across redeliveries).
    - ``resume=True``: crash recovery — partitions already committed by
      *this* run_id are skipped wholesale before the shuffle.
    - ``_debug_skip_partitions``: test hook simulating a mid-run crash (the
      listed partitions are dropped before merge, leaving them uncommitted).
    """
    run_id = run_id or uuid.uuid4().hex[:8]
    paths = out_paths(spec)

    # resolve BOTH hooks before touching any output: a run configured with
    # a missing hook must fail before it clears tables, and the pre-hook
    # (index-disable analog) must see the warehouse as the previous run
    # left it (dest/I2b2QueryResultsHandler.java:97-161).
    from ..config import resolve_hook

    pre_fn = resolve_hook(spec.pre_hook) if spec.pre_hook else None
    post_fn = resolve_hook(spec.post_hook) if spec.post_hook else None
    pre_result = pre_fn(spec, run_id) if pre_fn else None

    if spec.mode == "replace" and not resume:
        for p in paths.values():
            if os.path.isdir(p):
                for f in glob.glob(os.path.join(p, "*")):
                    os.remove(f)
    for p in paths.values():
        os.makedirs(p, exist_ok=True)
        # reap orphan tmp files from a SIGKILLed prior run: every writer is
        # atomic (tmp + os.replace), so a kill between open and rename can
        # leave a partially-written `*.tmp-*` file that directory-scan
        # readers (ray.data.read_parquet(dir)) would otherwise pick up.  A
        # tmp file is only meaningful inside the process that created it
        # (uuid-suffixed, renamed in the same call), so at replay start any
        # survivor is garbage by construction.
        for f in glob.glob(os.path.join(p, "*.tmp-*")):
            os.remove(f)
    # same reap for the job-manifest tmp at the out_dir root
    for f in glob.glob(os.path.join(spec.out_dir, "*.tmp-*")):
        os.remove(f)

    changes = read_changes(input_path) if isinstance(input_path, str) else input_path
    if spec.min_seq is not None or spec.max_seq is not None:
        # date-bound replay (reference DateTimeFilter analog): a vectorized
        # predicate right after the scan — rows outside the bound never
        # reach the digest or the shuffle
        lo, hi = spec.min_seq, spec.max_seq

        def seq_bound(t: pa.Table) -> pa.Table:
            mask = pa.array([True] * len(t))
            if lo is not None:
                mask = pc.and_(mask, pc.greater_equal(t["commit_seq"], lo))
            if hi is not None:
                mask = pc.and_(mask, pc.less(t["commit_seq"], hi))
            return t.filter(mask)

        changes = changes.map_batches(seq_bound, batch_format="pyarrow")

    hot_keys = None
    if spec.salt_buckets > 1 and spec.hot_key_threshold > 0:
        if isinstance(input_path, str):
            # Sampled pre-pass: every k-th log segment (~25% of files, spread
            # across commit time), threshold scaled by the sampled fraction.
            # Hot-key detection is a performance heuristic — a missed
            # borderline key costs salting, never correctness.
            files = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
            if not files:
                files = [input_path]
            sample = files[::4] if len(files) >= 8 else files
            frac = len(sample) / len(files)
            thr = max(1, int(spec.hot_key_threshold * frac))
            sample_bytes = sum(os.path.getsize(f) for f in sample)
            if sample_bytes < 2 << 30:
                # small sample: a driver-local polars scan (column-pruned)
                # beats spinning up a Ray stage by seconds of fixed cost
                hot_keys = find_hot_keys_local(sample, thr) or None
            else:
                key_ds = read_changes(sample, with_content=False)
                hot_keys = find_hot_keys(key_ds, thr) or None
        else:
            hot_keys = find_hot_keys(changes, spec.hot_key_threshold) or None

    # exactly-once requires a STABLE event->partition mapping across runs:
    # update mode must replay with the same partitioning parameters, and a
    # key once salted stays salted (else a redelivered event lands on a
    # partition whose watermark doesn't cover it and re-applies).
    job = mf.read_job_manifest(spec.out_dir)
    if spec.mode == "update" and job is not None:
        if (
            job["num_partitions"] != spec.num_partitions
            or job["salt_buckets"] != spec.salt_buckets
        ):
            raise ValueError(
                "update-mode partitioning mismatch: job manifest has "
                f"num_partitions={job['num_partitions']}, salt_buckets="
                f"{job['salt_buckets']}; spec has {spec.num_partitions}/"
                f"{spec.salt_buckets}. Replay with matching parameters or "
                "rebuild in replace mode."
            )
        # Event->partition routing uses polars' hash(), which is NOT
        # guaranteed stable across polars versions.  After an upgrade a
        # redelivered event could silently land on a partition whose
        # watermark doesn't cover it and re-apply — so refuse to update a
        # job built under a different polars.
        import polars as _pl

        job_plv = job.get("polars_version")
        if job_plv is not None and job_plv != _pl.__version__:
            raise ValueError(
                f"update-mode hash-provider mismatch: job was built with "
                f"polars {job_plv}, this process runs {_pl.__version__}; "
                "partition routing is not guaranteed stable across polars "
                "versions. Rebuild in replace mode."
            )
        persisted_hot = set(job.get("hot_keys", []))
        if persisted_hot:
            hot_keys = (hot_keys or set()) | persisted_hot

    # --- newly-hot transition, BEFORE the merge ---------------------------
    # Keys crossing the salting threshold THIS run may have prior state in
    # their canonical partition files.  Extract that state now and raise the
    # watermark of every salt bucket the key can route to, up to the key's
    # last applied seq — so a pre-transition event redelivered IN THIS VERY
    # RUN routes salted and is dropped by a bucket watermark that already
    # covers it.  (Running this after the merge left that redelivery window
    # open; the bump is safe because commit_seq is globally monotonic in the
    # log, so genuinely new events always exceed any previously applied seq.)
    from ..stages.merge import (
        _atomic_write,
        _bump_salted_watermarks,
        extract_keys_from_parts,
        remove_keys_from_parts,
    )

    persisted_prior = set((job or {}).get("hot_keys", []))
    newly_hot = (hot_keys or set()) - persisted_prior
    if newly_hot and spec.mode == "update":
        # DURABILITY ordering: (1) read-only extract, (2) persist the
        # extracted state as a hot-transition file, (3) bump watermarks,
        # (4) only THEN destructively remove the keys from the canonical
        # parts.  The state always exists in >=1 durable place: a crash
        # before (4) leaves keys in both parts and the hot file — the LWW
        # merge-on-read folds the duplicates and a resumed run re-runs
        # all four phases idempotently.  (The previous one-pass expunge
        # rewrote parts while holding the extracted rows only in driver
        # memory — a crash mid-loop lost them unrecoverably.)
        extracted = extract_keys_from_parts(
            spec.out_dir, newly_hot, spec.num_partitions
        )
        if len(extracted):
            # hot-*.parquet glob + LWW reduce below absorbs this file
            # exactly like a hot-run file, so no in-memory hand-off needed
            _atomic_write(
                extracted,
                os.path.join(paths["path_dim"], f"hot-transition-{run_id}.parquet"),
            )
            _bump_salted_watermarks(
                spec.out_dir, extracted, spec.num_partitions, spec.salt_buckets, run_id
            )
            remove_keys_from_parts(spec.out_dir, newly_hot, spec.num_partitions)

    norm = normalized(changes, spec, hot_keys, modifier_specs)

    skip = set()
    if resume:
        # Crash recovery. replace mode: the out_dir belongs to this build,
        # so every committed partition (manifest present) is skipped
        # wholesale. update mode: prior runs committed every partition, so
        # only partitions committed by THIS run_id (pass the crashed run's
        # id) are skipped; the rest re-filter via their watermark.
        skip |= mf.completed_partitions(
            spec.out_dir, run_id=run_id if spec.mode == "update" else None
        )
    if _debug_skip_partitions:
        skip |= set(_debug_skip_partitions)
    if skip:
        skip_arr = pa.array(sorted(skip), pa.int32())
        norm = norm.map_batches(
            lambda t: t.filter(pc.invert(pc.is_in(t["pkey"], value_set=skip_arr))),
            batch_format="pyarrow",
        )

    wm_ref = ray.put(mf.watermarks(spec.out_dir) if spec.mode == "update" else {})
    merger_kwargs = dict(
        emit="checkpoint",
        out_dirs=paths,
        watermarks_ref=wm_ref,
        run_id=run_id,
        mode=spec.mode,
        schema_version=spec.schema_version,
        merge_policy=spec.merge_policy,
        modifier_names=tuple(s.name for s in modifier_specs),
        state_cap_rows=spec.state_cap_rows,
    )
    hot_rows_ds = merged_groups(norm, merger_kwargs, spec)

    # hot winners: tiny (|hot keys| x salt_buckets rows) -> driver reduce
    # materialize() executes the merge exactly once; the result (hot-key
    # winners only) is tiny.  to_arrow_refs() on the raw plan would trigger
    # a second full execution for schema inference.
    hot_mat = hot_rows_ds.materialize()
    if os.environ.get("GRAFT_REPLAY_STATS"):  # per-stage wall-time breakdown
        print(hot_mat.stats(), file=sys.stderr)
    hot_tbls = [t for t in ray.get(hot_mat.to_arrow_refs()) if len(t)]
    # extracted pre-transition state is already on disk as
    # hot-transition-<run_id>.parquet (written before the merge) and joins
    # the fold via the hot-*.parquet glob below — a key's state lives
    # exclusively in hot runs (otherwise dimension partials double-count it)

    folded = None
    if hot_tbls:
        folded = reduce_hot_rows(pa.concat_tables(hot_tbls))
        _atomic_write(
            folded, os.path.join(paths["path_dim"], f"hot-{run_id}.parquet")
        )
    # all hot runs (incl. prior update-mode runs), LWW-reduced, contribute
    # the live counts the partition partials exclude
    hot_files = sorted(glob.glob(os.path.join(paths["path_dim"], "hot-*.parquet")))
    hot_all = None
    if hot_files:
        hot_all = reduce_hot_rows(
            pa.concat_tables([pq.read_table(f) for f in hot_files])
        )

    # dims: fold the per-partition partials the mergers wrote (tiny driver
    # reduce — the fact table is never re-read)
    summary: dict = {"run_id": run_id, "out": paths}
    repo_t, lang_t, mod_t = dims_mod.fold_dim_partials(paths["_dimpart"], hot_all)
    if len(repo_t):
        _atomic_write(repo_t, os.path.join(paths["repo_dim"], "repo_dim.parquet"))
        _atomic_write(lang_t, os.path.join(paths["lang_dim"], "lang_dim.parquet"))
    if len(mod_t):
        _atomic_write(
            mod_t, os.path.join(paths["modifier_dim"], "modifier_dim.parquet")
        )

    import polars as _pl

    from .. import __version__ as _engine_version

    mf.write_job_manifest(
        spec.out_dir,
        {
            "num_partitions": spec.num_partitions,
            "salt_buckets": spec.salt_buckets,
            "hot_keys": sorted(hot_keys or ()),
            "merge_policy": spec.merge_policy,
            "schema_version": spec.schema_version,
            # routing-stability provenance (update runs refuse a mismatch)
            "polars_version": _pl.__version__,
            "engine_version": _engine_version,
        },
    )

    # consolidated manifest table (the `_manifest` logical table)
    mt = mf.manifest_table(spec.out_dir)
    pq.write_table(mt, os.path.join(paths["_manifest"], "manifest.parquet"))
    summary["lineage"] = {
        name: (pc.sum(mt[name]).as_py() if len(mt) else 0)
        for name in ("rows_applied", "dups_dropped", "conflicts_resolved", "rows_rejected")
    }
    summary["partitions"] = len(mt)

    # post-hook runs only after EVERY output and manifest is durably
    # committed (the enable-indexes / gather-stats slot): a crash inside
    # the hook loses nothing, and a resumed run re-fires it.
    if pre_fn and pre_result is not None:
        summary["pre_hook"] = pre_result
    if post_fn:
        post_result = post_fn(spec, run_id, summary)
        if post_result is not None:
            summary["post_hook"] = post_result
    return summary


# --- pure (non-writing) variants for the correctness harness ---------------


def replay_table(
    changes: rd.Dataset,
    *,
    emit: str,
    num_partitions: int = 16,
    modifier_specs: tuple = (),
) -> rd.Dataset:
    """Run normalize+merge and return one logical output as a Dataset
    (emit='path_dim' or 'fact'); nothing is written.  Used by the
    driver-facing queries() and by tests."""
    spec = ReplaySpec(num_partitions=num_partitions, salt_buckets=1, hot_key_threshold=0)
    norm = normalized(changes, spec, None, modifier_specs)
    return merged_groups(
        norm,
        {"emit": emit, "modifier_names": tuple(s.name for s in modifier_specs)},
        spec,
    )
