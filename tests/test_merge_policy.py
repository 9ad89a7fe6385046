"""MergePolicy hook: first-writer-wins variant (the provider-dedup rule)."""

import pyarrow as pa
import ray.data as rd

from aiw_i2b2_etl_ray.pipelines.cdc_replay import merged_groups, normalized
from aiw_i2b2_etl_ray.config import ReplaySpec


def _mk_changes():
    return rd.from_arrow(
        pa.table(
            {
                "repo": ["r"] * 3,
                "path": ["a", "a", "a"],
                "commit": ["c1", "c2", "c3"],
                "lang": ["py", "py", "go"],
                "content": pa.array(["v1", "v2", "v3"], pa.large_string()),
                "commit_seq": [1, 2, 3],
                "op": ["I", "U", "U"],
            }
        )
    )


def _run(policy):
    spec = ReplaySpec(num_partitions=2, salt_buckets=1, hot_key_threshold=0)
    norm = normalized(_mk_changes(), spec, None)
    out = merged_groups(
        norm, {"emit": "path_dim", "merge_policy": policy}, spec
    ).to_pandas()
    return out.iloc[0]


def test_last_writer_wins_default():
    row = _run("last_writer_wins")
    assert row["last_commit"] == "c3" and row["lang"] == "go"


def test_first_writer_wins():
    row = _run("first_writer_wins")
    assert row["last_commit"] == "c1" and row["lang"] == "py"
