"""Salted aggregation/join must be result-identical to the direct form."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresql_transfer_tool_spark.catalog import load_table
from postgresql_transfer_tool_spark.functions.exact import dec
from postgresql_transfer_tool_spark.functions.skew import (
    broadcast_salted_join,
    salted_count_sum,
)


def test_salted_count_sum_matches_direct(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    direct = {
        r["event_type"]: (r["n"], r["total"])
        for r in e.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum(dec("value", 14, 4)).alias("total"))
        .collect()
    }
    salted = {
        r["event_type"]: (r["n"], r["total"])
        for r in salted_count_sum(e, "event_type", dec("value", 14, 4), n_salts=16).collect()
    }
    assert salted == direct  # decimal sums: exact equality incl. the salted path


def test_salted_join_matches_direct(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    customer = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    )
    direct = sorted(
        tuple(r) for r in orders.join(customer, "o_custkey").collect()
    )
    salted = sorted(
        tuple(r)
        for r in broadcast_salted_join(orders, customer, "o_custkey", n_salts=4)
        .select("o_custkey", "o_totalprice", "c_mktsegment")
        .collect()
    )
    assert salted == direct


def test_salt_is_deterministic(spark, sf_dir):
    from postgresql_transfer_tool_spark.functions.skew import with_salt

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    a = {r["event_id"]: r["_salt"] for r in with_salt(e, 8).collect()}
    b = {r["event_id"]: r["_salt"] for r in with_salt(e, 8).collect()}
    assert a == b
