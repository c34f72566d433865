"""Capture .explain('formatted') for named queries into plans/<round>/.

Usage: python tools/capture_plans.py <suffix> <query> [query ...]

Writes plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<suffix>.txt (suffix is
'before' or 'after'; round defaults to r15). The judge checks plan
claims in OPTIMIZATION_r{N}.md against these files.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"))


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    import __spark_entry__ as entrymod
    from postgresql_transfer_tool_spark.plans import physical_plan
    from postgresql_transfer_tool_spark.session import get_spark

    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("plan-capture")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = physical_plan(df)
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir} [{suffix}]\n")
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
