"""Persistent, incrementally-maintained MinHash-LSH dedup index.

The batch pipelines (pipelines/dedup.py) re-sketch the whole corpus per
run.  A growing training corpus needs the INCREMENTAL form: fold each
newly ingested document slice into durable index state and surface only
the near-dup pairs that involve a new document — the same
tail-apply-against-persisted-state discipline as the CDC merge
(stages/merge.py) and the persistent ontology (pipelines/ontology_store.py),
applied to the dedup family.

State layout (under ``out_dir/dedup_index/``): one band-row parquet run
directory per update — ``bands/run-<run_id>/`` holding ``(band_id:int32,
band_key:int64, doc_id:int64)`` rows (24 B/row, the same digest unit the
batch LSH shuffle moves; the index never stores text).  Appending runs is
LSM-style: lookups read the union of runs; no rewrite of prior state.

Per update, candidate discovery is ONE keyed exchange over (band_id,
band_key) of prior ∪ new band rows, emitting id pairs where at least one
side is new.  Pairs among two OLD docs are suppressed — they were emitted
by the run that made their younger member new, so across any partition of
the corpus into update runs the UNION of per-run pair sets equals the
one-shot LSH candidate set exactly (set equality, not approximation):
every pair is emitted by precisely the run that ingested its younger
member.  That convergence is what `dedup_incremental` proves against the
same exact-Jaccard SQL oracle as `dedup_minhash`.

Scale notes: new band rows stream through `map_batches` (never
driver-side); the exchange carries ids only; prior runs are read
column-pruned from parquet.  A compaction verb (fold run dirs into one)
would mirror `compact_path_dim` but is unnecessary for correctness —
bucket membership is a union.
"""

from __future__ import annotations

import glob
import os
import uuid

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..util import worker_runtime_env
from .dedup import _PAIR_COLS, _spread, band_rows, verify_candidate_pairs

_BANDS_SCHEMA = pa.schema(
    [
        ("band_id", pa.int32()),
        ("band_key", pa.int64()),
        ("doc_id", pa.int64()),
    ]
)


def _bands_root(out_dir: str) -> str:
    return os.path.join(out_dir, "dedup_index", "bands")


def _run_dirs(out_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(_bands_root(out_dir), "run-*")))


def index_update(
    sf_dir: str,
    out_dir: str,
    *,
    row_filter=None,
    run_id: str | None = None,
) -> tuple[dict, rd.Dataset]:
    """Fold one document slice into the index; return (summary, candidate
    id-pair Dataset) where every pair involves at least one NEW doc.

    ``row_filter`` (pyarrow dataset expression) selects the slice from
    ``sf_dir/documents.parquet`` with predicate pushdown."""
    run_id = run_id or uuid.uuid4().hex[:8]
    prior_dirs = _run_dirs(out_dir)

    kwargs = {"columns": ["doc_id", "text"]}
    if row_filter is not None:
        kwargs["filter"] = row_filter
    docs = _spread(rd.read_parquet(f"{sf_dir}/documents.parquet", **kwargs))

    new_bands = docs.map_batches(
        band_rows, batch_format="pyarrow", zero_copy_batch=True, **worker_runtime_env()
    )
    # ATOMIC run commit: write to a tmp dir (excluded from the run-* glob)
    # and rename into place — a crashed update must not leave a partial
    # run that later updates would treat as committed prior state (its
    # docs would never pair with future ingests), and a same-run_id retry
    # must not merge fresh files with stale ones.
    run_dir = os.path.join(_bands_root(out_dir), f"run-{run_id}")
    tmp_dir = os.path.join(_bands_root(out_dir), f".tmp-run-{run_id}")
    import shutil

    shutil.rmtree(tmp_dir, ignore_errors=True)
    shutil.rmtree(run_dir, ignore_errors=True)  # same-run_id retry: replace
    os.makedirs(tmp_dir)
    new_bands.write_parquet(tmp_dir)
    os.replace(tmp_dir, run_dir)

    def flag(is_new: bool):
        def add(t: pa.Table) -> pa.Table:
            return t.append_column(
                "is_new", pa.array(np.full(len(t), is_new, dtype=bool))
            )

        return add

    def _files(dirs: list[str]) -> list[str]:
        return [
            f for d in dirs for f in sorted(glob.glob(os.path.join(d, "*.parquet")))
        ]

    run_files = sorted(glob.glob(os.path.join(run_dir, "*.parquet")))
    if not run_files:
        # empty update slice (no docs, or only empty-shingle docs): a
        # benign no-op — no new band rows means no pair can involve a new
        # doc, so skip the exchange entirely
        empty = rd.from_arrow(
            pa.table({c: pa.array([], t) for c, t in _PAIR_COLS.items()})
        ).materialize()
        return (
            {
                "run_id": run_id,
                "prior_runs": len(prior_dirs),
                "new_band_rows": 0,
                "candidate_pairs": 0,
            },
            empty,
        )
    new_ds = rd.read_parquet(run_files).map_batches(flag(True), batch_format="pyarrow")
    parts = [new_ds]
    prior_files = _files(prior_dirs)
    if prior_files:
        parts.append(
            rd.read_parquet(prior_files).map_batches(
                flag(False), batch_format="pyarrow"
            )
        )
    union = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]

    def bucket_pairs_new(g: pa.Table) -> pa.Table:
        # NOTE degenerate-bucket exposure differs from the batch path's
        # BAND_BUCKET_CAP star-sparsification (dedup.bucket_pairs): here
        # old-old pairs are excluded, so one bucket emits at most
        # |new in bucket| x |bucket| pairs — bounded by the INCREMENT
        # size, which an operator controls, not by corpus history.  The
        # persisted 3-column band-row format therefore stays unchanged
        # (adding a digest column would break existing run files).
        ids = g["doc_id"].to_numpy()
        newf = g["is_new"].to_numpy(zero_copy_only=False)
        # per-id new flag (a doc re-ingested in a later run counts as new)
        uids, inv = np.unique(ids, return_inverse=True)
        unew = np.zeros(uids.size, dtype=bool)
        np.maximum.at(unew, inv, newf)
        if uids.size < 2 or not unew.any():
            return pa.table({c: pa.array([], t) for c, t in _PAIR_COLS.items()})
        iu = np.triu_indices(uids.size, k=1)
        keep = unew[iu[0]] | unew[iu[1]]
        return pa.table(
            {"doc_a": pa.array(uids[iu[0]][keep]), "doc_b": pa.array(uids[iu[1]][keep])}
        )

    cands = (
        union.groupby(["band_id", "band_key"])
        .map_groups(bucket_pairs_new, batch_format="pyarrow")
        .materialize()
    )
    import pyarrow.parquet as pq

    n_new = sum(  # footer metadata only — counting the lazy new_bands
        pq.ParquetFile(f).metadata.num_rows  # would re-run the sketch pass
        for f in glob.glob(os.path.join(run_dir, "*.parquet"))
    )
    summary = {
        "run_id": run_id,
        "prior_runs": len(prior_dirs),
        "new_band_rows": n_new,
        "candidate_pairs": cands.count(),
    }
    return summary, cands


def index_compact(out_dir: str) -> dict:
    """Fold all band-row run dirs into one canonical run (the LSM
    compaction analog of stages.merge.compact_path_dim).  Pure
    optimization — bucket membership is a union, so correctness never
    needs it; it bounds the file count a lookup reads."""
    import shutil

    dirs = _run_dirs(out_dir)
    if len(dirs) <= 1:
        return {"runs_folded": 0}
    ds = rd.read_parquet(
        [f for d in dirs for f in sorted(glob.glob(os.path.join(d, "*.parquet")))]
    )
    # Crash-safe ordering: write to a tmp dir (excluded from the run-*
    # glob), RENAME the compacted run into place, and only then delete
    # the source runs.  A crash mid-deletion leaves the compacted run
    # plus some originals — duplicate band rows, which pair generation
    # tolerates (buckets unique their ids) and a re-run of compaction
    # folds away.  The old delete-then-rename order lost the whole index
    # on a crash in between.  Unique name per compaction: os.replace
    # cannot atomically replace a non-empty directory.
    tmp = os.path.join(_bands_root(out_dir), ".tmp-compaction")
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    ds.write_parquet(tmp)
    os.replace(
        tmp,
        os.path.join(_bands_root(out_dir), f"run-compacted-{uuid.uuid4().hex[:8]}"),
    )
    for d in dirs:
        shutil.rmtree(d)
    return {"runs_folded": len(dirs)}


def dedup_incremental(sf_dir: str) -> rd.Dataset:
    """Catalog surface: a genuine two-increment index build (docs with
    ``doc_id < 100`` first, then the rest), candidate pairs unioned across
    both updates, exact-verified against the corpus texts.  By the
    younger-member argument (module docstring) the union of per-update
    candidates equals the one-shot LSH candidate set, so the verified
    result must equal `dedup_minhash` — and shares its exact
    inverted-index SQL oracle."""
    import shutil
    import tempfile

    import pyarrow.dataset as pads

    out = tempfile.mkdtemp(prefix="aiw-dedup-index-")
    try:
        _, c1 = index_update(
            sf_dir, out, row_filter=(pads.field("doc_id") < 100), run_id="inc1"
        )
        _, c2 = index_update(
            sf_dir, out, row_filter=(pads.field("doc_id") >= 100), run_id="inc2"
        )
        cands = c1.union(c2).materialize()
        docs = _spread(
            rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        )
        # safe to drop the temp index now: cands is materialized (object
        # store) and the verify graph reads only cands + the sf_dir corpus
        return verify_candidate_pairs(cands, docs)
    finally:
        shutil.rmtree(out, ignore_errors=True)
