"""Property-based correctness for the operational CDC reads added in
round 5 (rename detection, lang-migration audit): random deduped fact
streams must match a brute-force pure-Python reference, regardless of
block layout (the streams repartition to force multi-block folds)."""

from __future__ import annotations

import hashlib

import hypothesis.strategies as st
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import HealthCheck, given, settings

facts_strategy = st.lists(
    st.tuples(
        st.sampled_from(["r1", "r2"]),  # repo
        st.sampled_from(["a", "b", "c", "d", "e"]),  # path
        st.sampled_from(["py", "go", "rs"]),  # lang
        st.sampled_from(["x", "y", "z", "w"]),  # content token
        st.sampled_from(["I", "U", "D"]),  # op
    ),
    min_size=1,
    max_size=40,
)


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def _to_facts(rows):
    """Deduped fact rows: commit_seq = list position (unique), digest =
    sha of the content token (deletes share their predecessor-free
    tombstone digest of '')."""
    return rd.from_arrow(
        pa.table(
            {
                "repo": pa.array([r[0] for r in rows], pa.string()),
                "path": pa.array([r[1] for r in rows], pa.string()),
                "commit": pa.array([f"c{i}" for i in range(len(rows))], pa.string()),
                "commit_seq": pa.array(list(range(len(rows))), pa.int64()),
                "op": pa.array([r[4] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "content_sha256": pa.array(
                    [_sha("" if r[4] == "D" else r[3]) for r in rows], pa.string()
                ),
                "content_len": pa.array(
                    [0 if r[4] == "D" else len(r[3]) for r in rows], pa.int64()
                ),
            }
        )
    ).repartition(3)


def _ref_renames(rows):
    """Brute-force reference of renames_table's contract."""
    last = {}  # (repo,path) -> (seq, op, digest)
    last_live = {}  # (repo,path) -> (seq, digest)
    for i, (repo, path, _lang, tok, op) in enumerate(rows):
        digest = _sha("" if op == "D" else tok)
        last[(repo, path)] = (i, op, digest)
        if op != "D":
            last_live[(repo, path)] = (i, digest)
    live = {
        k: v[2] for k, v in last.items() if v[1] != "D"
    }  # (repo,path) -> current digest
    out = []
    for (repo, path), (_seq, op, _dig) in last.items():
        if op != "D" or (repo, path) not in last_live:
            continue
        pre_digest = last_live[(repo, path)][1]
        targets = [
            p
            for (r2, p), d in live.items()
            if r2 == repo and d == pre_digest and p != path
        ]
        if targets:
            out.append((repo, path, min(targets), pre_digest))
    return sorted(out)


def _ref_lang_migrations(rows):
    """Brute-force reference of lang_migrations_table's contract."""
    per = {}  # (repo,path) -> {lang: [lo, hi]}
    for i, (repo, path, lang, _tok, _op) in enumerate(rows):
        langs = per.setdefault((repo, path), {})
        lo_hi = langs.setdefault(lang, [i, i])
        lo_hi[0] = min(lo_hi[0], i)
        lo_hi[1] = max(lo_hi[1], i)
    out = []
    for (repo, path), langs in per.items():
        if len(langs) < 2:
            continue
        lo_min = min(v[0] for v in langs.values())
        hi_max = max(v[1] for v in langs.values())
        first = min(l for l, v in langs.items() if v[0] == lo_min)
        last = min(l for l, v in langs.items() if v[1] == hi_max)
        out.append((repo, path, len(langs), first, last))
    return sorted(out)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(facts_strategy)
def test_renames_match_bruteforce(rows):
    from aiw_i2b2_etl_ray.pipelines.cdc_queries import renames_table

    res = renames_table(_to_facts(rows))
    res = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    got = sorted(
        (r.repo, r.old_path, r.new_path, r.content_sha256)
        for r in res.itertuples()
    )
    assert got == _ref_renames(rows)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(facts_strategy)
def test_lang_migrations_match_bruteforce(rows):
    from aiw_i2b2_etl_ray.pipelines.cdc_queries import lang_migrations_table

    res = lang_migrations_table(_to_facts(rows))
    res = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    got = sorted(
        (r.repo, r.path, int(r.n_langs), r.first_lang, r.last_lang)
        for r in res.itertuples()
    )
    assert got == _ref_lang_migrations(rows)
