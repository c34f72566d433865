"""Decade-scale point for the keyed two-phase prefix sum (VERDICT r11
#1 "done" criterion): grow ONE source 10× and show the keyed form's
wall-clock stays ~flat while the naive per-source window serializes the
grown source through a single WindowExec task.

Synthetic (source, doc_id, n_tok) relations, generated distributed via
spark.range — no fixture dependence, the shape is the contract:

  point A: 8 sources × BASE rows each
  point B: the same, but source 's0' holds 10 × BASE rows

Both forms compute the identical per-source running sum and are
materialized with a count(). Run:

    python tools/keyed_cumsum_scale.py [BASE_ROWS]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F
from pyspark.sql.window import Window

sys.path.insert(0, ".")

from postgresql_transfer_tool_spark.functions.cumsum import keyed_running_sum  # noqa: E402
from postgresql_transfer_tool_spark.session import get_spark  # noqa: E402

N_SOURCES = 8


def _rel(spark, base_rows: int, big_factor: int):
    """8 sources of base_rows each; source s0 scaled by big_factor.
    doc_id is globally unique and a total order within each source."""
    small = spark.range((N_SOURCES - 1) * base_rows).select(
        F.concat(F.lit("s"), (F.col("id") % (N_SOURCES - 1) + 1).cast("string")
                 ).alias("source"),
        F.col("id").alias("doc_id"),
        (F.col("id") % 97 + 3).alias("n_tok"),
    )
    big = spark.range(base_rows * big_factor).select(
        F.lit("s0").alias("source"),
        (F.col("id") + 10_000_000_000).alias("doc_id"),
        (F.col("id") % 89 + 3).alias("n_tok"),
    )
    return small.unionByName(big).localCheckpoint(eager=True)


def _naive(df):
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("cum", F.sum("n_tok").over(w))


def _keyed(df):
    return keyed_running_sum(
        df, ["source"], [F.col("doc_id")], F.col("n_tok"), "cum"
    )


def _time(df) -> float:
    # aggregate over the RESULT column — a bare count() lets Catalyst
    # prune the unused Window node and times nothing
    t0 = time.monotonic()
    df.select(F.sum("cum")).collect()
    return time.monotonic() - t0


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    factors = (
        [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2
        else [1, 10]
    )
    spark = get_spark("keyed-cumsum-scale")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"base rows/source = {base}, sources = {N_SOURCES}; "
          f"s0 grows by factor, others fixed")
    for factor in factors:
        rel = _rel(spark, base, factor)
        n_rows = (N_SOURCES - 1) * base + base * factor
        out = {}
        for form, fn in (("naive", _naive), ("keyed", _keyed)):
            _time(fn(rel))  # warm the relation + plan once
            out[form] = min(_time(fn(rel)) for _ in range(3))
        rel.unpersist()
        print(f"s0 x{factor:<3} ({n_rows / 1e6:6.1f}M rows): "
              f"naive {out['naive']:6.2f}s   keyed {out['keyed']:6.2f}s")


if __name__ == "__main__":
    main()
