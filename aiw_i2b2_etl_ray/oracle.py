"""Single-process, obviously-correct replay oracle.

Plays the same role as the reference's reviewed golden truth files
(/root/reference/src/test/resources/truth/*.xml + the dumpTruth hook,
dest/AbstractI2b2DestLoadTest.java:55-62): a dict-based replayer whose
correctness is evident by inspection, used to produce expected final state
for the distributed engine's tests.  Not distributed, not fast — test-only.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import pandas as pd
import pyarrow as pa

from .schemas import CHANGE_FACT, LANG_DIM, PATH_DIM, REPO_DIM
from .stages.normalize import _OP_ALIASES


def _sha(s: str | None) -> str | None:
    return None if s is None else hashlib.sha256(s.encode("utf-8")).hexdigest()


@dataclass
class OracleResult:
    path_dim: pd.DataFrame
    repo_dim: pd.DataFrame
    lang_dim: pd.DataFrame
    change_fact: pd.DataFrame
    rejected: pd.DataFrame
    counters: dict = field(default_factory=dict)


def replay(events: pa.Table) -> OracleResult:
    """Replay a change-event table (any row order; ordering is given by
    ``commit_seq``) into converged final state.

    Rules (SURVEY.md §7.1): an event applies iff its change-id
    ``(repo, path, commit)`` has not been applied before; events apply in
    ``commit_seq`` order; last writer wins per ``(repo, path)``; ``op='D'``
    is a logical delete (delete_date = commit_seq as µs-epoch timestamp);
    events with null/empty repo or path are rejected.
    """
    df = events.to_pandas()
    df = df.sort_values(["commit_seq", "repo", "path", "commit"], kind="mergesort")

    applied: dict[tuple, dict] = {}  # (repo,path) -> state
    seen_ids: set[tuple] = set()
    facts, rejects = [], []
    dups = conflicts = 0

    for row in df.itertuples(index=False):
        r = row._asdict() if hasattr(row, "_asdict") else dict(row)
        # mirror the engine's tolerant op-token canonicalization
        # (stages/normalize.canonical_op): lowercased first char through
        # the alias map, unknown tokens pass through (merge as upserts)
        op_raw = r.get("op")
        if isinstance(op_raw, str) and op_raw:
            r["op"] = _OP_ALIASES.get(op_raw[0].lower(), op_raw)
        repo, path, commit = r.get("repo"), r.get("path"), r.get("commit")
        if not repo or not path or not commit:
            rejects.append({**r, "reason": "null_key"})
            continue
        cid = (repo, path, commit)
        if cid in seen_ids:
            dups += 1
            continue
        seen_ids.add(cid)
        key = (repo, path)
        if key in applied:
            conflicts += 1
        content = r.get("content")
        facts.append(
            {
                "repo": repo,
                "path": path,
                "commit": commit,
                "commit_seq": r["commit_seq"],
                "op": r["op"],
                "lang": r.get("lang"),
                "content_sha256": _sha(content),
                "content_len": None if content is None else len(content),
                # base fact row default (fan-out tested via replay specs)
                "modifier_cd": "@",
                "tval_modifier": None,
            }
        )
        applied[key] = {
            "repo": repo,
            "path": path,
            "lang": r.get("lang"),
            "content_sha256": _sha(content),
            "last_commit": commit,
            "last_commit_seq": r["commit_seq"],
            "delete_date": (
                pd.Timestamp(r["commit_seq"], unit="us") if r["op"] == "D" else pd.NaT
            ),
            "size": r.get("size") if "size" in r else None,
        }

    path_dim = pd.DataFrame(list(applied.values()), columns=PATH_DIM.names)
    fact = pd.DataFrame(facts, columns=CHANGE_FACT.names)

    # repo_dim from applied facts + live paths
    if len(fact):
        g = fact.groupby("repo")["commit_seq"]
        repo_dim = pd.DataFrame(
            {"first_commit_seq": g.min(), "last_commit_seq": g.max()}
        )
        live = (
            path_dim[path_dim["delete_date"].isna()].groupby("repo").size()
            if len(path_dim)
            else pd.Series(dtype=int)
        )
        repo_dim["n_paths_live"] = live.reindex(repo_dim.index).fillna(0).astype(int)
        repo_dim["delete_date"] = repo_dim.apply(
            lambda r: pd.Timestamp(r["last_commit_seq"], unit="us")
            if r["n_paths_live"] == 0
            else pd.NaT,
            axis=1,
        )
        repo_dim = repo_dim.reset_index()[REPO_DIM.names]
        lang_dim = (
            fact.groupby("lang")["commit_seq"].min().reset_index()
        ).rename(columns={"commit_seq": "first_seen_seq"})[LANG_DIM.names]
    else:
        repo_dim = pd.DataFrame(columns=REPO_DIM.names)
        lang_dim = pd.DataFrame(columns=LANG_DIM.names)

    rejected = pd.DataFrame(rejects)
    return OracleResult(
        path_dim=path_dim.sort_values(["repo", "path"]).reset_index(drop=True),
        repo_dim=repo_dim.sort_values("repo").reset_index(drop=True),
        lang_dim=lang_dim.sort_values("lang").reset_index(drop=True),
        change_fact=fact.sort_values(["repo", "path", "commit_seq"]).reset_index(
            drop=True
        ),
        rejected=rejected,
        counters={"dups_dropped": dups, "conflicts_resolved": conflicts},
    )
