"""Seeded synthetic change-event log generator (FIXTURES.md §1).

Produces a deterministic CDC log over `(repo, path, commit, lang, content)`
with the required event mix: inserts, updates, deletes + re-inserts, exact
duplicate change-ids, one hot repo (>=30% of events), one churned hot path
(salting test), a rejected-row fraction (null/empty keys), and a
schema-evolution segment (upper commit_seq range carries an added ``size``
column) — mirroring the reference's CDC fixtures
(/root/reference/src/test/resources/testData.xml: soft-deleted + updated
rows) at parametric scale.

Layout: ``out_dir/part-{i:05d}.parquet`` chunks of ~``rows_per_file`` rows;
chunks whose events are all past the evolution point carry the extra
``size`` column (schema evolution happens *between files*, as it would in a
real log tail).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = np.array(
    "py js ts go rs java c cpp rb php cs kt swift scala sh sql md yaml json toml".split()
)


def generate_changes(
    out_dir: str,
    n_events: int,
    *,
    n_repos: int = 20,
    paths_per_repo: int = 50,
    seed: int = 42,
    hot_repo_frac: float = 0.35,
    hot_path_frac: float = 0.06,
    delete_frac: float = 0.05,
    dup_frac: float = 0.02,
    reject_frac: float = 0.005,
    evo_frac: float = 0.75,
    content_len: tuple[int, int] = (24, 240),
    rows_per_file: int = 100_000,
) -> str:
    """Write a deterministic change log; returns ``out_dir``.

    Deterministic in all parameters; no wall clock, no global RNG state.
    """
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    # --- key assignment -----------------------------------------------------
    # repo 0 is the hot repo; the rest share the remainder ~uniformly.
    hot = rng.random(n_events) < hot_repo_frac
    repo_idx = np.where(hot, 0, rng.integers(1, max(n_repos, 2), n_events))
    # path: within the hot repo, one churned path soaks up hot_path_frac of
    # ALL events (the mega-churned-key skew case, SURVEY.md §7.5 item 3).
    path_idx = rng.integers(0, paths_per_repo, n_events)
    churn = rng.random(n_events) < (hot_path_frac / max(hot_repo_frac, 1e-9))
    path_idx = np.where(hot & churn, 0, path_idx)

    commit_seq = np.arange(n_events, dtype=np.int64)

    # --- ops ----------------------------------------------------------------
    is_delete = rng.random(n_events) < delete_frac
    # first event for a key is I, later ones U (computed exactly below when
    # materializing strings; op correctness only needs D to be explicit —
    # the merge treats I and U identically, like the reference's merge
    # procs which upsert regardless).
    key_id = repo_idx.astype(np.int64) * paths_per_repo + path_idx
    first_seen = np.zeros(n_events, dtype=bool)
    _, first_idx = np.unique(key_id, return_index=True)
    first_seen[first_idx] = True
    op = np.where(is_delete, "D", np.where(first_seen, "I", "U"))

    # --- rejected rows: blank out a key field -------------------------------
    reject = rng.random(n_events) < reject_frac
    reject_kind = rng.integers(0, 2, n_events)  # 0: empty path, 1: null repo

    # --- langs: stable per path, occasional change (lang update case) -------
    base_lang = LANGS[key_id % len(LANGS)]
    lang_flip = rng.random(n_events) < 0.02
    flipped = LANGS[(key_id + 7) % len(LANGS)]
    lang = np.where(lang_flip, flipped, base_lang)

    # --- content ------------------------------------------------------------
    lo, hi = content_len
    clen = rng.integers(lo, hi, n_events)

    evo_point = int(n_events * evo_frac)

    out_files = []
    n_files = max(1, (n_events + rows_per_file - 1) // rows_per_file)
    for fi in range(n_files):
        a, b = fi * rows_per_file, min((fi + 1) * rows_per_file, n_events)
        sl = slice(a, b)
        repos = [f"repo_{i}" for i in repo_idx[sl]]
        paths = [
            f"src/dir{p % 7}/file_{p}.{l}" for p, l in zip(path_idx[sl], base_lang[sl])
        ]
        commits = [f"c{s:012x}" for s in commit_seq[sl]]
        contents = [
            (f"// {r}/{p} @ {s}\n" + "x" * int(cl))
            for r, p, s, cl in zip(repos, paths, commit_seq[sl], clen[sl])
        ]
        # blank out rejected rows' key fields
        for j in np.nonzero(reject[sl])[0]:
            if reject_kind[sl][j] == 0:
                paths[j] = ""
            else:
                repos[j] = None

        cols = {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(lang[sl].tolist(), pa.string()),
            "content": pa.array(contents, pa.large_string()),
            "commit_seq": pa.array(commit_seq[sl]),
            "op": pa.array(op[sl].tolist(), pa.string()),
        }
        if a >= evo_point:
            # schema-evolution segment: added column
            cols["size"] = pa.array((clen[sl] * 2).astype(np.int64))
        t = pa.table(cols)

        # exact duplicate change-ids: re-append a deterministic sample of
        # this chunk's rows (same (repo,path,commit) AND same commit_seq —
        # a redelivered event).
        n_dup = int((b - a) * dup_frac)
        if n_dup:
            dup_idx = rng.integers(0, b - a, n_dup)
            t = pa.concat_tables([t, t.take(pa.array(dup_idx))])

        f = os.path.join(out_dir, f"part-{fi:05d}.parquet")
        # Bounded row groups (the pyarrow default is one giant row group
        # per file): keeps any reader's per-row-group decode memory bounded
        # and lets predicate-pushed scans skip at row-group granularity.
        # Decode PARALLELISM is set by file count (Ray assigns whole files
        # to read tasks) — hence the 100k-row default file size above.
        pq.write_table(t, f, row_group_size=64_000)
        out_files.append(f)

    return out_dir


def fingerprint(**params) -> str:
    """Stable cache key for a generated dataset (used by bench.py)."""
    s = ",".join(f"{k}={params[k]}" for k in sorted(params))
    return hashlib.sha256(s.encode()).hexdigest()[:16]
