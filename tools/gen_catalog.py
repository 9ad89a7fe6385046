"""Regenerate CATALOG.md from ``__ray_entry__.queries()``.

Usage: python tools/gen_catalog.py
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __ray_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    rows = []
    for name in sorted(q):
        fn = q[name]
        mod = fn.__module__.replace("aiw_i2b2_etl_ray.", "")
        doc = (inspect.getdoc(fn) or "").split("\n")[0][:68]
        check = "oracle" if name in o else "rows-only"
        rows.append(f"| `{name}` | {mod} | {doc} | {check} |")
    hdr = (
        "# Query catalog\n\n"
        f"Auto-generated from `__ray_entry__.queries()` — {len(q)} queries, "
        f"{len(o)} with DuckDB value-hash oracles.\n"
        "Regenerate: `python tools/gen_catalog.py`.\n\n"
        "| query | module | what it does | check |\n|---|---|---|---|\n"
    )
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CATALOG.md")
    with open(path, "w") as f:
        f.write(hdr + "\n".join(rows) + "\n")
    print(f"wrote {len(rows)} rows to {path}")


if __name__ == "__main__":
    main()
