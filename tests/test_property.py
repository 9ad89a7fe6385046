"""Property-based correctness: random change streams (hypothesis) must
converge to the oracle's state under the pure merge — the engine's
randomized extension of the reference's fixed-fixture golden tests."""

import hypothesis.strategies as st
import pyarrow as pa
import ray.data as rd
from hypothesis import HealthCheck, given, settings

from aiw_i2b2_etl_ray import oracle
from aiw_i2b2_etl_ray.pipelines.cdc_replay import replay_table

from .util import assert_table_eq

events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["r1", "r2", ""]),  # repo ('' -> rejected)
        st.sampled_from(["a", "b", "c", "d"]),  # path
        st.integers(0, 30),  # commit number
        st.sampled_from(["py", "go"]),  # lang
        st.text(alphabet="xyz", max_size=8),  # content
        st.sampled_from(["I", "U", "D"]),  # op
    ),
    min_size=1,
    max_size=60,
)


def _to_table(rows):
    # commit id derives from the commit number; commit_seq is its first
    # position in the list.  Re-occurrences of the same (key, commit) are
    # canonicalized to exact replicas of the first occurrence — a genuine
    # redelivery (the exactly-once contract covers identical redelivered
    # events; two *different* events sharing a change-id are undefined).
    seqs, seen = [], {}
    canon = []
    for i, row in enumerate(rows):
        repo, path, cn, lang, content, op = row
        cid = (repo, path, cn)
        if cid in seen:
            seq, first = seen[cid]
            canon.append(first)
            seqs.append(seq)
        else:
            seen[cid] = (i, row)
            canon.append(row)
            seqs.append(i)
    rows = canon
    return pa.table(
        {
            "repo": pa.array([r[0] for r in rows], pa.string()),
            "path": pa.array([r[1] for r in rows], pa.string()),
            "commit": pa.array([f"c{r[2]}" for r in rows], pa.string()),
            "lang": pa.array([r[3] for r in rows], pa.string()),
            "content": pa.array([r[4] for r in rows], pa.large_string()),
            "commit_seq": pa.array(seqs, pa.int64()),
            "op": pa.array([r[5] for r in rows], pa.string()),
        }
    )


@given(events_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
def test_random_streams_match_oracle(rows):
    t = _to_table(rows)
    expected = oracle.replay(t)
    got = replay_table(rd.from_arrow(t), emit="path_dim", num_partitions=4).to_pandas()
    assert_table_eq(got, expected.path_dim, ["repo", "path"])
