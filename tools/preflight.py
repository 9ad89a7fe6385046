"""Replicate the driver's correctness gate locally.

Runs the first N (default 50 — the driver's window) entries of
``__ray_entry__.queries()`` against their DuckDB oracles on the given
sf dir with the driver's exact compare: row count, schema as sorted
column names, and an order-insensitive value hash over stringified
cells.  Entries without an oracle get the driver's weaker rows-only
record.  Exit code 1 if anything mismatches.

Usage:
    python tools/preflight.py [--sf-dir /root/testdata/sf0.01] [--window 50]
    python tools/preflight.py --window 0        # the whole catalog
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _hash(df) -> str:
    import pandas as pd

    df = df[sorted(df.columns)].sort_values(sorted(df.columns)).reset_index(drop=True)
    return hashlib.sha256(
        pd.util.hash_pandas_object(df.astype(str)).values.tobytes()
    ).hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--window", type=int, default=50, help="0 = whole catalog")
    ap.add_argument(
        "--num-cpus",
        type=int,
        default=8,
        help="Ray session size; run once at 8 AND once at 32 — block-layout-"
        "dependent bugs (empty reduce partitions) only surface at high "
        "parallelism (CORRECTNESS_r04 heavy_hitter_tokens)",
    )
    args = ap.parse_args()

    import duckdb
    import pandas as pd
    import ray

    from aiw_i2b2_etl_ray.util import cap_kernel_threads

    cap_kernel_threads()
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    names = list(qs)[: args.window] if args.window else list(qs)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    fails = []
    for name in names:
        t0 = time.perf_counter()
        try:
            actual = qs[name](args.sf_dir)
            actual = actual if isinstance(actual, pd.DataFrame) else actual.to_pandas()
            if name in sqls:
                expected = con.sql(sqls[name]).df()
                ok = (
                    len(actual) == len(expected)
                    and sorted(actual.columns) == sorted(expected.columns)
                    and _hash(actual) == _hash(expected)
                )
                status = "green" if ok else "MISMATCH"
            else:
                status, ok = f"rows-only({len(actual)})", True
        except Exception as ex:  # noqa: BLE001 - a failing query is the finding
            status, ok = f"ERROR: {str(ex)[:160]}", False
        print(f"{name:32s} {status:20s} {time.perf_counter() - t0:6.2f}s", flush=True)
        if not ok:
            fails.append(name)
    print("FAILS:", fails if fails else "none")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
