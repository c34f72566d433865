"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python tools/check_correctness.py [sf_dir] [query ...]

When run over the FULL registry (no query filter), also writes the
per-query results to CORRECTNESS_LOCAL.json at the repo root —
committed per round as CORRECTNESS_LOCAL_r{N}.json (VERDICT r4
directive #7) so audits can distinguish "stale driver row" from
"locally re-verified at HEAD": the driver's 50-slot gate takes 4
rounds to rotate through all registered queries, this artifact covers
every oracle-backed query each round.
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
    records = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = compare_query(spark, con, name, fn, oracles.get(name), sf_dir)
        except Exception as exc:
            print(f"FAIL  {name}: raised")
            traceback.print_exc()
            failures.append(name)
            records.append(
                {"query": name, "status": "raised", "error": repr(exc)[:300]}
            )
            continue
        dt = time.time() - t0
        status = (
            "fail" if not res.ok
            else "rows_only" if name not in oracles
            else "pass"
        )
        records.append(
            {
                "query": name,
                "status": status,
                "n_rows": res.n_rows,
                "seconds": round(dt, 2),
                **({"problems": res.problems} if not res.ok else {}),
            }
        )
        if not res.ok:
            print(f"FAIL  {name}: " + "; ".join(res.problems))
            failures.append(name)
        elif name not in oracles:
            print(f"ok?   {name}: rows-only ({res.n_rows} rows, {dt:.1f}s) [no oracle]")
        else:
            print(f"PASS  {name} ({res.n_rows} rows, {dt:.1f}s)")

    if not only:  # full-registry run: persist the artifact
        import json
        import subprocess

        head = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "HEAD"],
            capture_output=True, text=True,
        ).stdout.strip()
        artifact = {
            "sf_dir": sf_dir,
            "git_head": head,
            "generated_unix": int(time.time()),
            "n_queries": len(records),
            "n_pass": sum(1 for r in records if r["status"] == "pass"),
            "n_rows_only": sum(1 for r in records if r["status"] == "rows_only"),
            "n_failed": len(failures),
            "results": records,
        }
        with open(f"{REPO}/CORRECTNESS_LOCAL.json", "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
        print(f"wrote CORRECTNESS_LOCAL.json ({len(records)} queries)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
