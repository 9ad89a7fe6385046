"""Edge semantics of the repo-mining reads (cdc_cochange, cdc_ownership,
cdc_path_lifetimes) on crafted change streams — the cases the sf-level
oracle runs can't isolate: the mega-session cap, redelivered change-ids,
resurrection counting vs a brute-force fold, and cross-block dedup."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd


def _changes(rows, *, parts: int = 4):
    """rows: (repo, path, seq, op, author_id).  Exact-copy redelivery is
    expressed by repeating a tuple."""
    return rd.from_arrow(
        pa.table(
            {
                "repo": pa.array([r[0] for r in rows], pa.string()),
                "path": pa.array([r[1] for r in rows], pa.string()),
                "commit": pa.array([f"c{r[2]}" for r in rows], pa.string()),
                "lang": pa.array(["py"] * len(rows), pa.string()),
                "content": pa.array(["x"] * len(rows), pa.large_string()),
                "commit_seq": pa.array([r[2] for r in rows], pa.int64()),
                "op": pa.array([r[3] for r in rows], pa.string()),
                "author_id": pa.array([r[4] for r in rows], pa.string()),
                "author_name": pa.array([r[4] + "_n" for r in rows], pa.string()),
            }
        )
    ).repartition(parts)


def _pdf(out) -> pd.DataFrame:
    return out if isinstance(out, pd.DataFrame) else out.to_pandas()


# --- cochange ----------------------------------------------------------------


def test_cochange_counts_sessions_not_rows():
    from aiw_i2b2_etl_ray.pipelines.cdc_mining import cochange_table

    rows = [
        # session 0 (bucket 0..9): a+b together, a touched twice (one
        # session counts once)
        ("r1", "a.py", 1, "U", "u1"),
        ("r1", "a.py", 2, "U", "u1"),
        ("r1", "b.py", 3, "U", "u2"),
        # session 1: a+b again, plus c (pairs a-c, b-c hit once only)
        ("r1", "a.py", 11, "U", "u1"),
        ("r1", "b.py", 12, "U", "u1"),
        ("r1", "c.py", 13, "U", "u1"),
    ]
    out = _pdf(cochange_table(_changes(rows), bucket=10)).sort_values(
        ["path_a", "path_b"]
    )
    assert out.to_dict("records") == [
        {"repo": "r1", "path_a": "a.py", "path_b": "b.py", "n_sessions": 2}
    ]


def test_cochange_min_sessions_one_keeps_single_hits():
    from aiw_i2b2_etl_ray.pipelines.cdc_mining import cochange_table

    rows = [
        ("r1", "a.py", 1, "U", "u1"),
        ("r1", "b.py", 2, "U", "u1"),
    ]
    out = _pdf(cochange_table(_changes(rows), bucket=10, min_sessions=1))
    assert out.to_dict("records") == [
        {"repo": "r1", "path_a": "a.py", "path_b": "b.py", "n_sessions": 1}
    ]


def test_cochange_no_cross_repo_or_cross_session_pairs():
    from aiw_i2b2_etl_ray.pipelines.cdc_mining import cochange_table

    rows = [
        ("r1", "a.py", 1, "U", "u1"),
        ("r2", "b.py", 2, "U", "u1"),  # other repo, same bucket
        ("r1", "c.py", 11, "U", "u1"),  # same repo, other bucket
    ]
    out = _pdf(cochange_table(_changes(rows), bucket=10, min_sessions=1))
    assert len(out) == 0
    # schema-stable empty (the driver compares sorted column names)
    assert sorted(out.columns) == ["n_sessions", "path_a", "path_b", "repo"]


def test_cochange_mega_session_cap_bounds_pairs():
    from aiw_i2b2_etl_ray.pipelines.cdc_mining import cochange_table

    # one bot session touching 200 paths: uncapped -> C(200,2) = 19900
    # pairs; capped at 20 -> C(20,2) = 190 pairs over the lexicographically
    # first 20 paths (deterministic truncation)
    rows = [("r1", f"p{i:04d}.py", i, "U", "bot") for i in range(200)]
    out = _pdf(
        cochange_table(
            _changes(rows), bucket=1000, min_sessions=1, max_session_paths=20
        )
    )
    assert len(out) == 190
    assert out["path_a"].max() <= "p0019.py"
    full = _pdf(cochange_table(_changes(rows), bucket=1000, min_sessions=1))
    assert len(full) == 19900


# --- ownership ---------------------------------------------------------------


def test_ownership_dedups_redelivered_change_ids():
    from aiw_i2b2_etl_ray.pipelines.cdc_mining import ownership_table

    rows = [
        ("r1", "a.py", 1, "U", "u1"),
        ("r1", "a.py", 1, "U", "u1"),  # exact redelivery — must not count
        ("r1", "a.py", 2, "U", "u2"),
        ("r1", "a.py", 3, "U", "u2"),
    ]
    out = _pdf(ownership_table(_changes(rows)))
    assert out.to_dict("records") == [
        {
            "repo": "r1",
            "path": "a.py",
            "n_authors": 2,
            "n_changes": 3,
            "top_author_id": "u2",
            "top_changes": 2,
        }
    ]


def test_ownership_tie_breaks_min_author_id():
    from aiw_i2b2_etl_ray.pipelines.cdc_mining import ownership_table

    rows = [
        ("r1", "a.py", 1, "U", "u9"),
        ("r1", "a.py", 2, "U", "u1"),
    ]
    out = _pdf(ownership_table(_changes(rows)))
    assert out.loc[0, "top_author_id"] == "u1"
    assert out.loc[0, "top_changes"] == 1


def test_ownership_blank_paths_rejected():
    from aiw_i2b2_etl_ray.pipelines.cdc_mining import ownership_table

    rows = [("r1", "", 1, "U", "u1")]
    out = _pdf(ownership_table(_changes(rows)))
    assert len(out) == 0
    assert "top_author_id" in out.columns


# --- path lifetimes ----------------------------------------------------------


def test_lifetimes_counts_resurrections():
    from aiw_i2b2_etl_ray.pipelines.cdc_mining import path_lifetimes_table

    rows = [
        ("r1", "a.py", 1, "U", "u1"),
        ("r1", "a.py", 2, "D", "u1"),
        ("r1", "a.py", 3, "U", "u1"),  # resurrection 1
        ("r1", "a.py", 4, "D", "u1"),
        ("r1", "a.py", 5, "D", "u1"),  # D->D is not a resurrection
        ("r1", "a.py", 6, "U", "u1"),  # resurrection 2
    ]
    out = _pdf(path_lifetimes_table(_changes(rows)))
    assert out.to_dict("records") == [
        {
            "repo": "r1",
            "path": "a.py",
            "first_seq": 1,
            "last_seq": 6,
            "n_changes": 6,
            "n_deletes": 3,
            "n_resurrections": 2,
        }
    ]


def test_lifetimes_redelivery_does_not_fake_transitions():
    from aiw_i2b2_etl_ray.pipelines.cdc_mining import path_lifetimes_table

    rows = [
        ("r1", "a.py", 1, "D", "u1"),
        ("r1", "a.py", 1, "D", "u1"),  # redelivered tombstone
        ("r1", "a.py", 2, "U", "u1"),
    ]
    out = _pdf(path_lifetimes_table(_changes(rows)))
    rec = out.to_dict("records")[0]
    assert rec["n_changes"] == 2
    assert rec["n_deletes"] == 1
    assert rec["n_resurrections"] == 1


def test_lifetimes_matches_bruteforce_on_random_stream():
    import random

    from aiw_i2b2_etl_ray.pipelines.cdc_mining import path_lifetimes_table

    rng = random.Random(7)
    rows = []
    for seq in range(300):
        rows.append(
            (
                f"r{rng.randrange(3)}",
                f"p{rng.randrange(8)}.py",
                seq,
                "D" if rng.random() < 0.3 else "U",
                f"u{rng.randrange(5)}",
            )
        )
    out = (
        _pdf(path_lifetimes_table(_changes(rows, parts=7)))
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    # brute force
    from collections import defaultdict

    byk = defaultdict(list)
    for r in rows:
        byk[(r[0], r[1])].append((r[2], r[3]))
    exp = []
    for (repo, path), evs in sorted(byk.items()):
        evs.sort()
        ops = [op for _, op in evs]
        res = sum(
            1 for i in range(1, len(ops)) if ops[i - 1] == "D" and ops[i] != "D"
        )
        exp.append(
            {
                "repo": repo,
                "path": path,
                "first_seq": evs[0][0],
                "last_seq": evs[-1][0],
                "n_changes": len(evs),
                "n_deletes": ops.count("D"),
                "n_resurrections": res,
            }
        )
    assert out.to_dict("records") == exp


# --- scale behaviors -----------------------------------------------------------


def test_mining_exchanges_are_bounded_and_spread():
    """(a) cochange's map-side distinct collapses redelivered / repeated
    rows BEFORE the exchange (the shuffle carries distinct (repo, bkt,
    path) triples, not the stream); (b) the ownership/lifetimes bucket
    hash spreads a single mega-repo's paths over many buckets instead of
    pinning one task."""
    import pyarrow as pa

    from aiw_i2b2_etl_ray.functions.hashing import bucket_hash

    # (a): 1000 stream rows over 5 paths in one session -> <= 5 triples
    rows = [("r1", f"p{i % 5}.py", i, "U", "u1") for i in range(1000)]
    t = pa.table(
        {
            "repo": pa.array([r[0] for r in rows]),
            "path": pa.array([r[1] for r in rows]),
            "commit": pa.array([f"c{r[2]}" for r in rows]),
            "commit_seq": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    import polars as pl

    from aiw_i2b2_etl_ray.pipelines.cdc_mining import _valid_mask

    triples = (
        pl.from_arrow(_valid_mask(t).select(["repo", "path", "commit_seq"]))
        .select("repo", (pl.col("commit_seq") // 1000).alias("bkt"), "path")
        .unique()
    )
    assert len(triples) == 5

    # (b): one repo, 500 paths -> the bucket column takes many values
    mega = pa.table(
        {
            "repo": pa.array(["mega"] * 500),
            "path": pa.array([f"p{i}.py" for i in range(500)]),
        }
    )
    b = bucket_hash(mega, ["repo", "path"], 32)
    assert len(set(b.to_pylist())) > 16


def test_ownership_counts_merge_equals_full_recompute():
    """The mergeable-census contract on a crafted stream: per-segment
    redelivery dedups inside the segment fold, and a (repo, path, author)
    active in BOTH segments sums across the merge — the merged result is
    identical to the full recompute."""
    from aiw_i2b2_etl_ray.pipelines.cdc_mining import (
        ownership_counts,
        ownership_from_counts,
        ownership_table,
    )

    seg_a = [
        ("r1", "a.py", 1, "U", "u1"),
        ("r1", "a.py", 1, "U", "u1"),  # redelivery inside segment A
        ("r1", "a.py", 2, "U", "u2"),
    ]
    seg_b = [
        ("r1", "a.py", 3, "U", "u2"),  # u2 spans both segments -> n=2
        ("r1", "b.py", 4, "D", "u3"),
    ]
    merged = _pdf(
        ownership_from_counts(
            ownership_counts(_changes(seg_a)).union(ownership_counts(_changes(seg_b)))
        )
    ).sort_values("path").reset_index(drop=True)
    full = (
        _pdf(ownership_table(_changes(seg_a + seg_b)))
        .sort_values("path")
        .reset_index(drop=True)
    )
    assert merged.to_dict("records") == full.to_dict("records")
    rec = merged.to_dict("records")[0]
    assert rec == {
        "repo": "r1",
        "path": "a.py",
        "n_authors": 2,
        "n_changes": 3,
        "top_author_id": "u2",
        "top_changes": 2,
    }


def test_cochange_matches_bruteforce_on_random_stream():
    import random
    from collections import defaultdict
    from itertools import combinations

    from aiw_i2b2_etl_ray.pipelines.cdc_mining import cochange_table

    rng = random.Random(11)
    rows = []
    for seq in range(400):
        rows.append(
            (
                f"r{rng.randrange(4)}",
                f"p{rng.randrange(12)}.py",
                seq,
                "U",
                f"u{rng.randrange(3)}",
            )
        )
        if rng.random() < 0.15:  # redelivery
            rows.append(rows[-1])
    B = 50
    out = (
        _pdf(cochange_table(_changes(rows, parts=9), bucket=B, min_sessions=1))
        .sort_values(["repo", "path_a", "path_b"])
        .reset_index(drop=True)
    )
    sess = defaultdict(set)
    for repo, path, seq, _, _ in rows:
        sess[(repo, seq // B)].add(path)
    counts = defaultdict(int)
    for (repo, _), paths in sess.items():
        for a, b in combinations(sorted(paths), 2):
            counts[(repo, a, b)] += 1
    exp = [
        {"repo": k[0], "path_a": k[1], "path_b": k[2], "n_sessions": v}
        for k, v in sorted(counts.items())
    ]
    assert out.to_dict("records") == exp
