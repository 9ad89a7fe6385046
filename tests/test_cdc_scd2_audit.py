"""Unit tests for the SCD2 history read and the commit-sequence audit
(cdc_queries.scd2_table / seq_audit_table) — crafted histories and forced
multi-block layouts; oracle parity is covered by test_queries_vs_duckdb."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from aiw_i2b2_etl_ray.pipelines.cdc_queries import (
    GAP_FACTOR,
    scd2_table,
    seq_audit_table,
)


def _facts(rows):
    t = pa.table(
        {
            "repo": pa.array([r[0] for r in rows], pa.string()),
            "path": pa.array([r[1] for r in rows], pa.string()),
            "commit_seq": pa.array([r[2] for r in rows], pa.int64()),
            "op": pa.array([r[3] for r in rows], pa.string()),
            "content_sha256": pa.array([r[4] for r in rows], pa.string()),
        }
    )
    return rd.from_arrow(t)


def test_scd2_interval_chain_with_tombstone():
    """U,U,D,U on one path: the delete CLOSES version 2's interval (its
    valid_to is the tombstone's seq, not version 3's), the reborn version
    is the only current one, and the tombstone itself emits no row."""
    rows = [
        ("r0", "a.txt", 1, "U", "s1"),
        ("r0", "a.txt", 5, "U", "s2"),
        ("r0", "a.txt", 9, "D", "s_del"),
        ("r0", "a.txt", 12, "U", "s3"),
        ("r0", "b.txt", 3, "U", "sb"),
    ]
    df = (
        scd2_table(_facts(rows))
        .to_pandas()
        .sort_values(["path", "valid_from_seq"])
        .reset_index(drop=True)
    )
    a = df[df["path"] == "a.txt"]
    assert list(a["valid_from_seq"]) == [1, 5, 12]
    assert list(a["valid_to_seq"].fillna(-1)) == [5.0, 9.0, -1]  # D closes v2
    assert list(a["is_current"]) == [0, 0, 1]
    b = df[df["path"] == "b.txt"]
    assert list(b["valid_from_seq"]) == [3] and list(b["is_current"]) == [1]
    # exactly one current version per live path, none for deleted spans
    cur = df.groupby(["repo", "path"])["is_current"].sum()
    assert (cur <= 1).all()


def test_scd2_mega_repo_spreads_over_buckets():
    """One repo with many paths must NOT collapse into one group: the
    shuffle key is bucket_hash(repo, path), so a mega-repo's paths land
    in many buckets (the skew guarantee the docstring promises)."""
    from aiw_i2b2_etl_ray.functions.hashing import bucket_hash

    rows = [("mega", f"f{i}.txt", i + 1, "U", f"s{i}") for i in range(500)]
    t = pa.table(
        {
            "repo": pa.array([r[0] for r in rows]),
            "path": pa.array([r[1] for r in rows]),
        }
    )
    buckets = np.asarray(bucket_hash(t, ["repo", "path"], 32))
    assert len(np.unique(buckets)) > 16  # spread, not pinned
    out = scd2_table(_facts(rows)).to_pandas()
    assert len(out) == 500 and out["is_current"].sum() == 500


def test_seq_audit_finds_planted_gap_across_many_blocks():
    """Plant one huge hole in an otherwise-dense per-repo tail and force
    a many-block layout (repartition 32): the cross-block driver fold
    must still see every adjacent pair exactly once — the planted gap is
    reported once, and no spurious same-block (first,last) pair is."""
    seqs = list(range(1, 101)) + [1000] + list(range(1001, 1040))
    rows = [("r0", f"f{s}.txt", s, "U", f"s{s}") for s in seqs]
    # second repo: dense, no anomalies — must produce no rows
    rows += [("r1", f"g{s}.txt", s, "U", f"t{s}") for s in range(1, 80)]
    ds = _facts(rows).repartition(32)
    out = seq_audit_table(ds).to_pandas()
    r0 = out[out["repo"] == "r0"]
    assert len(r0) == 1
    assert int(r0.iloc[0]["commit_seq"]) == 1000
    assert int(r0.iloc[0]["gap"]) == 900
    # mean gap: (1039-1)/139 ~ 7.47 -> ratio ~ 120; threshold respected
    assert r0.iloc[0]["gap_ratio"] > GAP_FACTOR
    assert (out["repo"] == "r1").sum() == 0


def test_seq_audit_duplicate_seqs_collapse():
    """At-least-once duplicates (same (repo, seq) appearing twice, even
    straddling block boundaries after the sort) must not create phantom
    zero-gaps or double-counted pairs."""
    seqs = [1, 2, 2, 3, 3, 3, 4, 50, 51, 52]
    rows = [
        ("r0", f"f{s}_{i}.txt", s, "U", f"s{s}_{i}") for i, s in enumerate(seqs)
    ]
    out = seq_audit_table(_facts(rows).repartition(8)).to_pandas()
    # distinct seqs: 1,2,3,4,50,51,52 -> gaps 1,1,1,46,1,1; mean 51/6=8.5
    assert len(out) == 1
    assert int(out.iloc[0]["gap"]) == 46
    assert abs(out.iloc[0]["gap_ratio"] - round(46 / 8.5, 4)) < 1e-9


def test_scd2_current_versions_match_path_dim_live_rows():
    """Invariant tying the SCD2 read to the flagship output: the set of
    CURRENT (repo, path, sha) versions must equal path_dim's live rows
    (delete_date null) — both are 'the state now', derived by different
    reductions over the same deduped stream."""
    from aiw_i2b2_etl_ray.pipelines.cdc_queries import cdc_path_dim, cdc_scd2

    sf = "/root/testdata/sf0.001"
    cur = cdc_scd2(sf).to_pandas()
    cur = cur[cur["is_current"] == 1][["repo", "path", "content_sha256"]]
    pdim = cdc_path_dim(sf).to_pandas()
    live = pdim[pdim["delete_date"].isna()][["repo", "path", "content_sha256"]]
    key = lambda df: set(map(tuple, df.itertuples(index=False)))
    assert key(cur) == key(live)


def test_hot_keys_feed_salted_join_measure_then_apply():
    """Integration of the measure->apply loop cdc_hot_keys documents:
    the measured hot-key set, fed as bucketed_join(hot_keys=...), must
    leave join results IDENTICAL to the unsalted plan (salting is a
    physical rewrite only)."""
    from aiw_i2b2_etl_ray.pipelines.cdc_queries import cdc_hot_keys
    from aiw_i2b2_etl_ray.stages.join import bucketed_join

    sf = "/root/testdata/sf0.001"
    hot = cdc_hot_keys(sf).to_pandas().head(5)
    hot_set = set(map(tuple, hot[["repo", "path"]].itertuples(index=False)))
    assert len(hot_set) == 5

    from aiw_i2b2_etl_ray.pipelines.cdc_queries import _fact_cached

    facts = _fact_cached(sf).select_columns(["repo", "path", "commit_seq"])
    dim = _fact_cached(sf).select_columns(["repo", "path", "lang"]).map_batches(
        lambda t: t.group_by(["repo", "path"]).aggregate([("lang", "max")]),
        batch_format="pyarrow",
    )

    def runs(**kw):
        out = bucketed_join(facts, dim, on=["repo", "path"], num_buckets=8, **kw)
        df = out.to_pandas().sort_values(["repo", "path", "commit_seq"]).reset_index(drop=True)
        return df

    plain = runs()
    salted = runs(hot_keys=hot_set, salt=4)
    # column order may differ between plans; compare on shared sorted cols
    cols = sorted(plain.columns)
    assert plain[cols].equals(salted[cols])
