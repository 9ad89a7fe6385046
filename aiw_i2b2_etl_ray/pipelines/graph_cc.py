"""Connected components over an edge Dataset — iterative min-label
propagation, the clustering step that turns near-duplicate PAIRS into
duplicate GROUPS (pick-one-per-cluster is what a dedup pipeline actually
ships; pairs alone are not actionable).

Physical plan per iteration (all Dataset ops, no driver-side graph):

    labels(n, lbl)  --rename n->a-->  join edges(a, b) on a   # bucketed
    -> messages (n=b, lbl)
    -> union(labels) -> groupby(n).min(lbl) -> new labels

Labels only ever decrease, so SUM(lbl) is a monotone convergence metric:
iterate until it stops changing (<= graph diameter rounds; duplicate
clusters are short chains, so 3-5 rounds in practice).  Everything is
deterministic — component id = min doc_id in the component.

At 100 TB the same loop holds: edges and labels are both hash-partitioned
on the node key by the bucketed join, each round moves O(|E|) id pairs
(24 B/row), and the label table never exceeds one row per node.  The
reference has no graph subsystem; this serves the training-data dedup
family (SURVEY.md §2.7 extension), composing with dedup_minhash_pairs.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Min, Sum

from ..stages.join import bucketed_join
from ..util import worker_runtime_env


def connected_components(
    edges: rd.Dataset,
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 20,
    num_buckets: int = 16,
) -> rd.Dataset:
    """(node, component) for every node appearing in ``edges``; component
    id is the minimum node id reachable over undirected edges."""

    def to_und(t: pa.Table) -> pa.Table:
        fwd = pa.table({"a": t[src], "b": t[dst]})
        rev = pa.table({"a": t[dst], "b": t[src]})
        return pa.concat_tables([fwd, rev]).combine_chunks()

    und = edges.map_batches(to_und, batch_format="pyarrow", **worker_runtime_env()).materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"n": t["a"], "lbl": t["a"]})

    labels = (
        und.map_batches(init_labels, batch_format="pyarrow")
        .groupby("n")
        .aggregate(Min("lbl", alias_name="lbl"))
        .materialize()
    )

    def _metric(ds: rd.Dataset) -> int:
        return int(ds.aggregate(Sum("lbl"))["sum(lbl)"])

    prev = _metric(labels)
    for _ in range(max_iters):

        def as_keyed(t: pa.Table) -> pa.Table:  # labels keyed by edge source
            return pa.table({"a": t["n"], "lbl": t["lbl"]})

        msgs = bucketed_join(
            und,
            labels.map_batches(as_keyed, batch_format="pyarrow"),
            on=["a"],
            num_buckets=num_buckets,
        ).map_batches(
            lambda t: pa.table({"n": t["b"], "lbl": t["lbl"]}),
            batch_format="pyarrow",
        )
        labels = (
            labels.union(msgs)
            .groupby("n")
            .aggregate(Min("lbl", alias_name="lbl"))
            .materialize()
        )
        cur = _metric(labels)
        if cur == prev:  # labels are monotone non-increasing -> fixpoint
            break
        prev = cur

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["n"].cast(pa.int64()),
                "cluster_id": t["lbl"].cast(pa.int64()),
            }
        )

    return labels.map_batches(finish, batch_format="pyarrow")


def dedup_clusters(sf_dir: str) -> rd.Dataset:
    """Duplicate clusters from the MinHash+LSH verified pairs: each doc in
    any near-dup pair is labeled with its component's min doc_id (the
    canonical survivor a keep-one policy would retain)."""
    from .dedup import dedup_minhash_pairs

    pairs = dedup_minhash_pairs(sf_dir)
    edges = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array(pairs["doc_a"].to_numpy(), pa.int64()),
                "doc_b": pa.array(pairs["doc_b"].to_numpy(), pa.int64()),
            }
        )
    )
    return connected_components(edges)


def _pairs_cte() -> str:
    from .dedup import SQL_DEDUP_MINHASH

    return SQL_DEDUP_MINHASH


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE pairs AS ({_pairs_cte()}),
und AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
walk(n, m) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM und)
  UNION
  SELECT w.n, u.b FROM walk w JOIN und u ON u.a = w.m
)
SELECT n AS doc_id, CAST(MIN(m) AS BIGINT) AS cluster_id
FROM walk GROUP BY n
"""
