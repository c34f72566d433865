"""Synthesize an N× (default 10×) fixture directory for the scaling
witness (r14 VERDICT "Next round" #8): at sf0.1 every headliner runs
FASTER at 8 cores than at 32 — the whole suite is fixed-job-overhead
bound at that input size, so the c8/c32 ratio can't witness parallelism.
This builds the "largest available" dataset the verdict asks for so a
spot-bench (tools/time_queries.py at SPARK_GRAFT_CPUS=8 vs 32) can show
real scaling on fact-table work; results land in SCALE.md.

Usage: python tools/build_scale10.py <out_dir> [copies]

Construction (witness-grade — deterministic, FK-consistent, NOT an
oracle fixture):
- documents/embeddings: tests/scale_corpus.build_scaled_corpus — the
  bijective per-copy perturbations that keep near-dup pair growth
  LINEAR in the copy count (exact duplicate copies would grow true
  pairs quadratically and drown any engine).
- TPC-H facts (customer/orders/lineitem/part/supplier): per-copy key
  OFFSETS on every PK/FK column, so each copy is an FK-closed replica
  (orders of copy k reference customers of copy k, etc.) and orphan
  counts stay exactly N× the sf0.1 counts.
- events: event_id/user_id offsets per copy (sessionization groups by
  user — distinct users grow N×, per-user series lengths unchanged).
- nation/region: copied once (true fixed-cardinality dimensions).

Output layout mirrors the fixtures (<out>/<table>.parquet), written as
directory datasets with n_files splits each so scans parallelize
(catalog's footer readers handle directories).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: key offset between copies — far above any sf0.1 key (max ~1.5M)
KEY_STRIDE = 100_000_000

#: (table, [key columns to offset])
FACT_KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
}


def main() -> int:
    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from scale_corpus import SF_MID, build_scaled_corpus

    from postgresql_transfer_tool_spark.catalog import load_table
    from postgresql_transfer_tool_spark.session import get_spark

    out_dir = sys.argv[1]
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_files = 32
    spark = get_spark("build-scale10")
    os.makedirs(out_dir, exist_ok=True)

    spark.sparkContext.setJobDescription("scale10: documents/embeddings")
    build_scaled_corpus(spark, out_dir, copies, n_files=n_files)

    for table, keys in FACT_KEYS.items():
        spark.sparkContext.setJobDescription(f"scale10: {table}")
        base = load_table(spark, SF_MID, table)
        parts = []
        for k in range(copies):
            cols = [
                (F.col(c) + F.lit(k * KEY_STRIDE)).alias(c) if c in keys else F.col(c)
                for c in base.columns
            ]
            parts.append(base.select(*cols))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        # events.ts must stay TIMESTAMP(µs-compatible): load_table
        # already normalized it; write as TIMESTAMP_NTZ-free µs
        df.repartition(n_files).write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )

    for table in ("nation", "region"):
        spark.sparkContext.setJobDescription(f"scale10: {table}")
        load_table(spark, SF_MID, table).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{table}.parquet")

    print(f"wrote {copies}x fixture to {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
