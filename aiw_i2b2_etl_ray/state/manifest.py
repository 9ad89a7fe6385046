"""Checkpoint manifest.

The reference has NO checkpoint/resume — temp tables are truncated at start
and a failed run restarts from scratch (dest/I2b2QueryResultsHandler.java:
405-416; SURVEY.md §4 'checkpoint / resume').  The manifest is the engine's
replacement: one JSON per hash partition, written atomically AFTER that
partition's outputs, holding the per-partition monotonic watermark
(last applied commit_seq), lineage counters, and schema version.  A resumed
run (same out_dir, resume=True) skips partitions whose manifest run_id
matches, and an incremental (mode="update") run filters events at or below
each partition's watermark — together with change-id dedup this yields
exactly-once application.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa

from ..schemas import MANIFEST


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def read_manifest(out_dir: str) -> list[dict]:
    recs = []
    for f in sorted(glob.glob(os.path.join(manifest_dir(out_dir), "part-*.json"))):
        with open(f) as fh:
            recs.append(json.load(fh))
    return recs


def watermarks(out_dir: str) -> dict[int, int]:
    return {r["partition_id"]: r["watermark_seq"] for r in read_manifest(out_dir)}


def completed_partitions(out_dir: str, run_id: str | None = None) -> set[int]:
    """Partitions already committed (optionally: by this very run_id — used
    by crash-resume to skip work finished before the crash)."""
    return {
        r["partition_id"]
        for r in read_manifest(out_dir)
        if run_id is None or r.get("run_id") == run_id
    }


def job_manifest_path(out_dir: str) -> str:
    return os.path.join(manifest_dir(out_dir), "job.json")


def write_job_manifest(out_dir: str, payload: dict) -> None:
    """Job-level invariants: partitioning parameters and the persisted
    hot-key set.  Exactly-once depends on a STABLE event->partition mapping
    across runs — a redelivered event must land on the partition whose
    watermark covers it.  So update-mode runs must reuse the same
    num_partitions/salt_buckets AND keep previously-hot keys salted even if
    this run's sample wouldn't flag them."""
    import uuid

    tmp = job_manifest_path(out_dir) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, job_manifest_path(out_dir))


def read_job_manifest(out_dir: str) -> dict | None:
    p = job_manifest_path(out_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def manifest_table(out_dir: str) -> pa.Table:
    recs = read_manifest(out_dir)
    cols = {
        name: [r.get(name) for r in recs] for name in MANIFEST.names
    }
    return pa.table(
        {n: pa.array(cols[n], MANIFEST.field(n).type) for n in MANIFEST.names}
    )
