"""Bucketed-layout tests: the write-once/join-forever shuffle trade.

Asserts the property that matters at 100 TB — a fact-to-fact join of
two tables bucketed on the join key compiles with ZERO Exchange — and
that the bucketed result is row-identical to the plain shuffled join.
"""

from __future__ import annotations

import pytest

from postgresql_transfer_tool_spark.catalog import load_table
from postgresql_transfer_tool_spark.functions.bucketing import (
    colocated_join,
    write_bucketed,
)
from postgresql_transfer_tool_spark.plans import count_exchanges, physical_plan


@pytest.fixture
def no_broadcast(spark):
    """Force the join planner's hand: a broadcast join would hide the
    Exchange this test is about (fixture tables are tiny; 100 TB fact
    tables are not broadcastable)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_zero_exchanges(spark, sf_dir, tmp_path, no_broadcast):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    try:
        write_bucketed(
            orders.withColumnRenamed("o_orderkey", "k"),
            "b_orders", str(tmp_path / "b_orders"), "k", 8,
        )
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "k"),
            "b_lineitem", str(tmp_path / "b_lineitem"), "k", 8,
        )

        joined = colocated_join(spark, "b_orders", "b_lineitem", "k")
        assert count_exchanges(joined) == 0, physical_plan(joined)

        # identical rows to the plain shuffled join
        plain = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        )
        assert joined.count() == plain.count()
        # spot-check an aggregate over the join
        from pyspark.sql import functions as F

        a = joined.agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))).first()[0]
        b = plain.agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))).first()[0]
        assert a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_groupby_avoids_shuffle(spark, sf_dir, tmp_path, no_broadcast):
    """Aggregation on the bucket key also rides the layout: groupBy
    (bucket_key) needs no Exchange before the final aggregate."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    try:
        write_bucketed(
            orders, "b_orders_g", str(tmp_path / "b_orders_g"), "o_custkey", 8
        )
        agg = (
            spark.table("b_orders_g")
            .groupBy("o_custkey")
            .agg(F.count("*").alias("n"))
        )
        assert count_exchanges(agg) == 0, physical_plan(agg)
        assert agg.count() == orders.select("o_custkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders_g")
