"""Physical-plan regression tests: the scale-survival assertions.

Correctness says the numbers match; these say the *plan* is the one
you'd want at 100 TB — filters pushed to the scan, projections pruned,
small dimensions broadcast, codegen on.
"""

from __future__ import annotations

from postgresql_transfer_tool_spark.operators.joins import (
    broadcast_join_orders_by_region,
    q3_shipping_priority,
)
from postgresql_transfer_tool_spark.operators.relational import (
    projection_customer,
    q1_pricing_summary,
)
from postgresql_transfer_tool_spark.operators.incremental import hwm_incremental_batch
from postgresql_transfer_tool_spark.plans import (
    assert_pushed_filter,
    assert_read_schema_only,
    has_broadcast_join,
    has_wholestage_codegen,
)


def test_q1_filter_pushdown(spark, sf_dir):
    df = q1_pricing_summary(spark, sf_dir)
    assert_pushed_filter(df, "l_shipdate")


def test_q1_column_pruning(spark, sf_dir):
    # 7 columns used out of 11 — the scan must not read the other 4
    df = q1_pricing_summary(spark, sf_dir)
    assert_read_schema_only(
        df,
        "lineitem",
        {
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        },
    )


def test_q1_wholestage_codegen(spark, sf_dir):
    assert has_wholestage_codegen(q1_pricing_summary(spark, sf_dir))


def test_projection_prunes_scan(spark, sf_dir):
    df = projection_customer(spark, sf_dir)
    assert_read_schema_only(df, "customer", {"c_custkey", "c_name", "c_mktsegment"})


def test_dimension_joins_broadcast(spark, sf_dir):
    assert has_broadcast_join(broadcast_join_orders_by_region(spark, sf_dir))


def test_q3_pushes_date_filters(spark, sf_dir):
    df = q3_shipping_priority(spark, sf_dir)
    assert_pushed_filter(df, "o_orderdate")
    assert_pushed_filter(df, "l_shipdate")


def test_hwm_predicate_reaches_scan(spark, sf_dir):
    # incremental reads must prune row groups via the ts min/max stats
    assert_pushed_filter(hwm_incremental_batch(spark, sf_dir), "ts")
