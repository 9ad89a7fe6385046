"""Edge semantics of the rename-detection read (cdc_renames) on crafted
change streams — the cases the sf-level oracle runs can't isolate:
re-created paths, multi-target digest ties, cross-repo non-matches, and
content changed after the move."""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import ray.data as rd


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def _facts(rows):
    """rows: (repo, path, seq, op, content)."""
    return rd.from_arrow(
        pa.table(
            {
                "repo": pa.array([r[0] for r in rows], pa.string()),
                "path": pa.array([r[1] for r in rows], pa.string()),
                "commit": pa.array([f"c{r[2]}" for r in rows], pa.string()),
                "commit_seq": pa.array([r[2] for r in rows], pa.int64()),
                "op": pa.array([r[3] for r in rows], pa.string()),
                "lang": pa.array(["py"] * len(rows), pa.string()),
                "content_sha256": pa.array([_sha(r[4]) for r in rows], pa.string()),
                "content_len": pa.array([len(r[4]) for r in rows], pa.int64()),
            }
        )
    ).repartition(4)


def _run(rows) -> pd.DataFrame:
    from aiw_i2b2_etl_ray.pipelines.cdc_queries import renames_table

    out = renames_table(_facts(rows))
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    return out.sort_values(["repo", "old_path"]).reset_index(drop=True)


def test_simple_move_detected():
    out = _run(
        [
            ("r1", "a.py", 1, "I", "body"),
            ("r1", "a.py", 2, "D", ""),
            ("r1", "b.py", 3, "I", "body"),
        ]
    )
    assert out.to_dict("records") == [
        {
            "repo": "r1",
            "old_path": "a.py",
            "new_path": "b.py",
            "content_sha256": _sha("body"),
        }
    ]


def test_recreated_same_path_is_not_a_rename():
    # delete then re-insert at the SAME path: the live path equals the
    # old path, so the l.path <> old_path predicate must drop it
    out = _run(
        [
            ("r1", "a.py", 1, "I", "body"),
            ("r1", "a.py", 2, "D", ""),
            ("r1", "a.py", 3, "I", "body"),
        ]
    )
    assert len(out) == 0


def test_multi_target_tie_picks_min_path():
    out = _run(
        [
            ("r1", "old.py", 1, "I", "dup"),
            ("r1", "old.py", 2, "D", ""),
            ("r1", "zzz.py", 3, "I", "dup"),
            ("r1", "aaa.py", 4, "I", "dup"),
        ]
    )
    assert out.to_dict("records") == [
        {
            "repo": "r1",
            "old_path": "old.py",
            "new_path": "aaa.py",
            "content_sha256": _sha("dup"),
        }
    ]


def test_no_cross_repo_match_and_no_match_after_edit():
    out = _run(
        [
            # same digest lands in ANOTHER repo: not a rename
            ("r1", "a.py", 1, "I", "one"),
            ("r1", "a.py", 2, "D", ""),
            ("r2", "b.py", 3, "I", "one"),
            # moved-and-edited: digests differ, not detected (heuristic)
            ("r1", "c.py", 4, "I", "two"),
            ("r1", "c.py", 5, "D", ""),
            ("r1", "d.py", 6, "I", "two-edited"),
        ]
    )
    assert len(out) == 0


def test_everything_deleted_yields_empty():
    # dead side non-empty, live side EMPTY: the join must come back
    # schema-stable empty (no live targets exist)
    out = _run(
        [
            ("r1", "a.py", 1, "I", "body"),
            ("r1", "a.py", 2, "D", ""),
            ("r1", "b.py", 3, "I", "body"),
            ("r1", "b.py", 4, "D", ""),
        ]
    )
    assert len(out) == 0
    assert sorted(out.columns) == [
        "content_sha256",
        "new_path",
        "old_path",
        "repo",
    ]


def test_mass_duplicate_digest_stays_bounded():
    # 30 live carriers of one digest + 3 dead: the pre-reduced live side
    # means each dead path pairs with exactly ONE candidate (the min)
    rows = [("r1", f"live{i:02d}.py", 100 + i, "I", "boiler") for i in range(30)]
    for j in range(3):
        rows += [
            ("r1", f"dead{j}.py", 200 + 2 * j, "I", "boiler"),
            ("r1", f"dead{j}.py", 201 + 2 * j, "D", ""),
        ]
    out = _run(rows)
    assert len(out) == 3
    assert (out["new_path"] == "live00.py").all()


def test_pre_delete_digest_is_last_nondelete_version():
    # a.py was edited (v1 -> v2) before the delete; only the v2 digest
    # should match — a live copy of v1 is NOT the moved content
    out = _run(
        [
            ("r1", "a.py", 1, "I", "v1"),
            ("r1", "a.py", 2, "U", "v2"),
            ("r1", "a.py", 3, "D", ""),
            ("r1", "v1copy.py", 4, "I", "v1"),
            ("r1", "v2copy.py", 5, "I", "v2"),
        ]
    )
    assert out.to_dict("records") == [
        {
            "repo": "r1",
            "old_path": "a.py",
            "new_path": "v2copy.py",
            "content_sha256": _sha("v2"),
        }
    ]


def test_shared_content_empty_live_state_keeps_schema():
    """All paths deleted: shared_content must return a typed empty frame,
    not a column-less one (the zero-blocks schema-loss class)."""
    import pyarrow as pa
    import ray.data as rd

    from aiw_i2b2_etl_ray.pipelines.cdc_queries import shared_content_table

    pdim = rd.from_arrow(
        pa.table(
            {
                "repo": pa.array(["r1", "r2"], pa.string()),
                "path": pa.array(["a", "b"], pa.string()),
                "lang": pa.array(["py", "py"], pa.string()),
                "content_sha256": pa.array(["x" * 64, "x" * 64], pa.string()),
                "last_commit": pa.array(["c1", "c2"], pa.string()),
                "last_commit_seq": pa.array([1, 2], pa.int64()),
                "delete_date": pa.array([1, 2], pa.timestamp("us")),  # all dead
                "size": pa.array([None, None], pa.int64()),
            }
        )
    )
    out = shared_content_table(pdim)
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    assert len(out) == 0
    assert sorted(out.columns) == ["content_sha256", "n_paths", "n_repos"]


def test_shared_content_counts_cross_repo_digests():
    import pyarrow as pa
    import ray.data as rd

    from aiw_i2b2_etl_ray.pipelines.cdc_queries import shared_content_table

    d1, d2 = "a" * 64, "b" * 64
    pdim = rd.from_arrow(
        pa.table(
            {
                "repo": pa.array(["r1", "r2", "r2", "r1"], pa.string()),
                "path": pa.array(["a", "b", "c", "d"], pa.string()),
                "lang": pa.array(["py"] * 4, pa.string()),
                # d1 lives in r1+r2 (3 paths); d2 only in r1
                "content_sha256": pa.array([d1, d1, d1, d2], pa.string()),
                "last_commit": pa.array(["c"] * 4, pa.string()),
                "last_commit_seq": pa.array([1, 2, 3, 4], pa.int64()),
                "delete_date": pa.array([None] * 4, pa.timestamp("us")),
                "size": pa.array([None] * 4, pa.int64()),
            }
        )
    ).repartition(3)
    out = shared_content_table(pdim)
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    assert out.to_dict("records") == [
        {"content_sha256": d1, "n_repos": 2, "n_paths": 3}
    ]
