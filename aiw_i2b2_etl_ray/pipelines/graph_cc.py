"""Connected components over an edge Dataset — distributed hash-to-min
(Rastogi et al., "Finding Connected Components in MapReduce"), the
clustering step that turns near-duplicate PAIRS into duplicate GROUPS
(pick-one-per-cluster is what a dedup pipeline actually ships; pairs
alone are not actionable).

Physical plan per round — groupby-only, no joins:

    adjacency (src, dst) --groupby(src)--> each node u computes
    m = min(neighborhood ∪ {u}) and emits (m, v) + (v, m) for every v —
    i.e. attaches its whole neighborhood to its current minimum.
    The emitted pairs (deduped by the same groupby next round) ARE the
    next round's adjacency; shortcut edges accumulate, so the component
    minimum reaches every node in O(log diameter) rounds, not O(diameter).

SUM over every node of min(neighborhood ∪ {u}) is monotone non-increasing
and stable exactly at the fixpoint (star graphs around each component
minimum), so it doubles as the convergence test.  Deterministic —
component id = min doc_id in the component.

At 100 TB: one keyed shuffle per round over id pairs only (16 B/row);
intermediate adjacency is bounded by O(component size) per component
(hash-to-min's known communication bound is O(n log n) total).  The
reference has no graph subsystem; this serves the training-data dedup
family (SURVEY.md §2.7 extension), composing with dedup_minhash_pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Min, Sum

from ..util import worker_runtime_env


def connected_components(
    edges: rd.Dataset,
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 30,
) -> rd.Dataset:
    """(node, component) for every node appearing in ``edges``; component
    id is the minimum node id reachable over undirected edges.  Raises if
    the fixpoint is not reached within ``max_iters`` rounds (hash-to-min
    needs ~log2(diameter) + 2, so 30 covers any practical graph)."""

    def to_und(t: pa.Table) -> pa.Table:
        fwd = pa.table({"src": t[src].cast(pa.int64()), "dst": t[dst].cast(pa.int64())})
        rev = pa.table({"src": t[dst].cast(pa.int64()), "dst": t[src].cast(pa.int64())})
        return pa.concat_tables([fwd, rev]).combine_chunks()

    adj = edges.map_batches(to_und, batch_format="pyarrow", **worker_runtime_env())

    def hash_to_min(g: pa.Table) -> pa.Table:
        u = g["src"][0].as_py()
        nbrs = np.unique(g["dst"].to_numpy())
        m = min(u, int(nbrs[0]))  # nbrs sorted ascending
        nodes = nbrs[nbrs != m]
        out_src = np.concatenate([np.full(len(nodes), m, dtype=np.int64), nodes])
        out_dst = np.concatenate([nodes, np.full(len(nodes), m, dtype=np.int64)])
        if u != m:  # keep u attached to m as well
            out_src = np.concatenate([out_src, [m, u]])
            out_dst = np.concatenate([out_dst, [u, m]])
        return pa.table({"src": pa.array(out_src), "dst": pa.array(out_dst)})

    def _metric(a: rd.Dataset) -> tuple:
        # (sum over nodes of min(neighborhood), node count, edge count):
        # the sum is monotone non-increasing; counts guard against a
        # theoretical plateau where the sum stalls while structure still
        # evolves.  All three are stable exactly at the star fixpoint.
        mins = a.groupby("src").aggregate(Min("dst", alias_name="m")).materialize()
        return (
            int(mins.aggregate(Sum("m"))["sum(m)"]),
            mins.count(),
            a.count(),
        )

    prev = None
    for it in range(max_iters):
        adj = (
            adj.groupby("src")
            .map_groups(hash_to_min, batch_format="pyarrow")
            .materialize()
        )
        cur = _metric(adj)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds"
        )

    def finish(g: pa.Table) -> pa.Table:
        u = g["src"][0].as_py()
        m = min(u, int(pa.compute.min(g["dst"]).as_py()))
        return pa.table(
            {"doc_id": pa.array([u], pa.int64()), "cluster_id": pa.array([m], pa.int64())}
        )

    return adj.groupby("src").map_groups(finish, batch_format="pyarrow")


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
