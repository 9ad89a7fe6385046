"""Stream-shaped operators over the ordered ``events`` log.

Ray Data has no event-time windows (ray_guide.md §streaming); the engine
expresses them as: partition by key (the shuffle), order by timestamp
within the group, then vectorized window logic — the same
ordered-replay-within-partition contract the CDC merge relies on.

Reference analog: per-key interval ordering before fact emission
(AllPropositionIntervalComparator at dest/table/PropositionFactHandler.java:53-54,
:86-96) and the monotonic instance-num assignment
(dest/table/IncrNumFactory.java:28-38 — here made deterministic as a
per-key rank, SURVEY.md ST9).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

WINDOW_US = 3600 * 1_000_000  # 1h tumbling
SESSION_GAP_US = 30 * 60 * 1_000_000  # 30min inactivity closes a session


def event_rank(sf_dir: str) -> rd.Dataset:
    """Deterministic per-key sequence numbers: rank of each event within
    its user ordered by (ts, event_id) — the IncrNumFactory analog."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        g["instance_num"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["event_id", "user_id", "instance_num"]]

    return ds.groupby("user_id").map_groups(rank, batch_format="pandas")


SQL_EVENT_RANK = """
SELECT event_id, user_id,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS instance_num
FROM events
"""


def tumbling_counts(sf_dir: str) -> rd.Dataset:
    """1-hour tumbling-window counts per user: window assignment is a
    stateless vectorized map (epoch µs // width), then a grouped count with
    per-batch partial pre-aggregation — windows never shuffle raw rows."""
    import polars as pl

    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).with_columns(
            (pl.col("ts").cast(pl.Datetime("us")).cast(pl.Int64) // WINDOW_US).alias(
                "window_id"
            )
        )
        return (
            df.group_by(["user_id", "window_id"])
            .agg(pl.len().cast(pl.Int64).alias("pn"))
            .to_arrow()
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "window_id"])
        .aggregate(Sum("pn", alias_name="n_events"))
    )


SQL_TUMBLING_COUNTS = f"""
SELECT user_id,
       CAST(epoch_us(ts) // {WINDOW_US} AS BIGINT) AS window_id,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id, window_id
"""


def session_windows(sf_dir: str) -> rd.Dataset:
    """Gap-based sessionization: per user, a new session starts when the
    gap since the previous event exceeds 30 min; emits one row per session
    with bounds and count.  Requires only per-key ordering — the engine's
    standard partitioned-sort contract."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        # normalize to µs epoch (ns-written parquet would be 1000x off)
        ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        new = np.ones(len(g), dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > SESSION_GAP_US
        sid = np.cumsum(new)
        out = (
            pd.DataFrame({"ts": g["ts"].values, "sid": sid})
            .groupby("sid")
            .agg(session_start=("ts", "min"), session_end=("ts", "max"), n_events=("ts", "size"))
            .reset_index(drop=True)
        )
        out.insert(0, "user_id", g["user_id"].iloc[0])
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


SQL_SESSION_WINDOWS = f"""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {SESSION_GAP_US}
              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
tagged AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM tagged GROUP BY user_id, sid
"""


HOP_US = WINDOW_US // 2  # hopping window: size WINDOW_US, hop = size/2


def hopping_counts(sf_dir: str) -> rd.Dataset:
    """Hopping (sliding) window counts per user: size = 1h, hop = 30min —
    each event contributes to exactly size/hop (=2) overlapping windows.
    Window assignment is a stateless fan-out map (2 rows per event, ids
    only), then the same partial-preaggregated grouped count as the
    tumbling variant — raw rows never shuffle, only (user, window, partial
    count) triples."""
    import polars as pl

    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    arms = WINDOW_US // HOP_US

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).with_columns(
            (pl.col("ts").cast(pl.Datetime("us")).cast(pl.Int64) // HOP_US).alias("h")
        )
        parts = [
            df.with_columns((pl.col("h") - i).alias("window_hop"))
            for i in range(arms)
        ]
        return (
            pl.concat(parts)
            .group_by(["user_id", "window_hop"])
            .agg(pl.len().cast(pl.Int64).alias("pn"))
            .to_arrow()
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "window_hop"])
        .aggregate(Sum("pn", alias_name="n_events"))
    )


SQL_HOPPING_COUNTS = f"""
WITH h AS (
  SELECT user_id, CAST(epoch_us(ts) // {HOP_US} AS BIGINT) AS h FROM events
),
fanned AS (
  SELECT user_id, h - 0 AS window_hop FROM h
  UNION ALL
  SELECT user_id, h - 1 FROM h
)
SELECT user_id, window_hop, CAST(COUNT(*) AS BIGINT) AS n_events
FROM fanned GROUP BY user_id, window_hop
"""
