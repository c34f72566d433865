"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

REPO = "/root/repo"
sys.path.insert(0, REPO)


def main() -> int:
    import __spark_entry__ as entrymod
    from postgresql_transfer_tool_spark.session import get_spark
    from postgresql_transfer_tool_spark.testing import compare_query, duckdb_connection

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("correctness-check")
    con = duckdb_connection(sf_dir)

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = compare_query(spark, con, name, fn, oracles.get(name), sf_dir)
        except Exception:
            print(f"FAIL  {name}: raised")
            traceback.print_exc()
            failures.append(name)
            continue
        dt = time.time() - t0
        if not res.ok:
            print(f"FAIL  {name}: " + "; ".join(res.problems))
            failures.append(name)
        elif name not in oracles:
            print(f"ok?   {name}: rows-only ({res.n_rows} rows, {dt:.1f}s) [no oracle]")
        else:
            print(f"PASS  {name} ({res.n_rows} rows, {dt:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
