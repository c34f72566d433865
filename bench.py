"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed once to warm the JVM/page cache (timed run is the
second execution), and fully materialized via a count-style action so the
measured time covers scan→shuffle→final stage, not lazy plan building.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

#: headline set: flagship + the heaviest representative per operator family
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "fk_orphan_check",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_bruteforce_topk",
    "text_quality_score",
    "sessionization_gap_30m",
    "count_per_table",
]


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    return float(base.replace("sf", "")) if base.startswith("sf") else -1.0


def main() -> None:
    import __spark_entry__ as entrymod
    from postgresql_transfer_tool_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")

    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n not in HEADLINE
    ]
    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        try:
            fn(spark, sf_dir).collect()  # warmup: JVM JIT + file cache
            t0 = time.time()
            fn(spark, sf_dir).collect()
            timings[name] = round(time.time() - t0, 4)
        except Exception as exc:  # never let one query kill the bench
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0
    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_from_dir(sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
