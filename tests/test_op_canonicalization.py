"""Tolerant op-token canonicalization: real-world binlog/WAL tails emit
source-specific tokens (Debezium c/u/d/r, full words, uppercase); the
normalizer maps them to the engine's I/U/D contract by lowercased first
character, and rows already canonical pass through bit-equal."""

from __future__ import annotations

import pyarrow as pa

from aiw_i2b2_etl_ray.stages.normalize import canonical_op


def test_aliases_map_by_first_char():
    ops = pa.array(
        [
            "insert",
            "INSERT",
            "create",
            "c",
            "r",  # Debezium snapshot-read -> insert
            "update",
            "u",
            "delete",
            "DELETE",
            "d",
        ]
    )
    assert canonical_op(ops).to_pylist() == [
        "I",
        "I",
        "I",
        "I",
        "I",
        "U",
        "U",
        "D",
        "D",
        "D",
    ]


def test_canonical_and_unknown_pass_through():
    ops = pa.array(["I", "U", "D", "x", "truncate", "", None])
    assert canonical_op(ops).to_pylist() == ["I", "U", "D", "x", "truncate", "", None]


def test_full_word_delete_lands_in_replay(tmp_path):
    """End to end: a 'delete' op row must set delete_date in path_dim."""
    import pyarrow.parquet as pq

    from aiw_i2b2_etl_ray.pipelines.cdc_replay import replay_table
    import ray.data as rd

    t = pa.table(
        {
            "repo": pa.array(["r1", "r1"], pa.string()),
            "path": pa.array(["f", "f"], pa.string()),
            "commit": pa.array(["c1", "c2"], pa.string()),
            "lang": pa.array(["py", "py"], pa.string()),
            "content": pa.array(["body", ""], pa.large_string()),
            "commit_seq": pa.array([1, 2], pa.int64()),
            "op": pa.array(["insert", "delete"], pa.string()),
        }
    )
    pdim = replay_table(rd.from_arrow(t), emit="path_dim", num_partitions=2).to_pandas()
    assert len(pdim) == 1
    assert pdim["delete_date"].notna().all()
