"""Derivation-graph traversal as a dataset operator — the engine's J2
analog (dest/table/PropositionFactHandler.java:56-58,78-81,110-132): the
reference walks a bounded per-key record graph (encounter -> referenced
propositions -> their forward derivations, 2 hops) inside each patient's
handleQueryResult group.

Partitioning assumption (same as the reference's): derivation edges NEVER
cross the partition key — every edge connects records of the same key
(patient there, ``user_id`` here) — so one ``groupby(user_id)`` co-locates
each key's whole subgraph and the walk is a per-group in-memory BFS, no
iterative joins.  A graph with cross-key edges would instead need the
iterative edges-dataset join (one bucketed join per hop, SURVEY.md J2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

MAX_DEPTH = 2  # the reference's bounded 2-hop walk
ROOT_TYPE = "signup"  # roots of the walk (encounter analog)


def derivation_reach(sf_dir: str) -> rd.Dataset:
    """For every root event (type ``signup``), the events reachable through
    the per-user derivation chain (each event derives the user's next
    event) within MAX_DEPTH hops.  Output: (root_id, reached_id, depth)."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type"]
    )

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id")
        ids = g["event_id"].to_numpy()
        # edge i -> i+1 (the user's next event is its forward derivation)
        nxt = {int(ids[i]): int(ids[i + 1]) for i in range(len(ids) - 1)}
        roots = g.loc[g["event_type"] == ROOT_TYPE, "event_id"].to_numpy()
        out_r, out_e, out_d = [], [], []
        for r in roots:
            cur = int(r)
            for depth in range(1, MAX_DEPTH + 1):
                cur = nxt.get(cur)
                if cur is None:
                    break
                out_r.append(int(r))
                out_e.append(cur)
                out_d.append(depth)
        return pd.DataFrame(
            {
                "root_id": pd.Series(out_r, dtype="int64"),
                "reached_id": pd.Series(out_e, dtype="int64"),
                "depth": pd.Series(np.asarray(out_d, dtype=np.int64), dtype="int64"),
            }
        )

    return ds.groupby("user_id").map_groups(walk, batch_format="pandas")


SQL_DERIVATION_REACH = f"""
WITH ordered AS (
  SELECT event_id, user_id, event_type,
         LEAD(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS nxt
  FROM events
),
e1 AS (SELECT event_id AS src, nxt AS dst FROM ordered WHERE nxt IS NOT NULL),
roots AS (SELECT event_id FROM events WHERE event_type = '{ROOT_TYPE}')
SELECT r.event_id AS root_id, a.dst AS reached_id, CAST(1 AS BIGINT) AS depth
FROM roots r JOIN e1 a ON a.src = r.event_id
UNION ALL
SELECT r.event_id, b.dst, CAST(2 AS BIGINT)
FROM roots r JOIN e1 a ON a.src = r.event_id JOIN e1 b ON b.src = a.dst
"""
