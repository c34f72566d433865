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


def test_aqe_splits_skewed_join_partition(spark, sf_dir):
    """Runtime skew mitigation: AQE must detect the planted hot key and
    split its shuffle partition (plan shows the skew marker) — the
    no-code-change path that complements explicit salting at 100 TB.

    Two preconditions this test documents (both bite in production):
    - the skewed side must arrive from MULTIPLE mappers — AQE splits a
      skewed reduce partition along map-output boundaries, so a
      single-file scan (one mapper) is unsplittable; hence the
      repartition(16) standing in for a many-task scan;
    - BOTH join children must read directly from their own shuffle
      (Sort over ShuffleQueryStage). An aggregation directly under the
      join (e.g. `.distinct()`) absorbs the child's exchange and the
      skew rule's pattern no longer matches — one reason explicit
      salting (functions/skew.py) still earns its keep. The dim side
      is localCheckpoint'd to cut that lineage.
    """
    confs = {
        # force SMJ at plan time AND at AQE re-plan time: the scenario
        # emulates a fact-fact join whose sides are too big to
        # broadcast at 100 TB — without the runtime override, AQE's
        # broadcast conversion preempts the skew-split rule on this
        # (deliberately tiny) fixture
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "10KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "10KB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem").repartition(16).select(
            # plant skew: ~90% of rows share join key 0
            F.when(F.col("l_orderkey") % 10 < 9, F.lit(0))
            .otherwise(F.col("l_orderkey"))
            .alias("k"),
            "l_quantity",
        )
        dim = (
            load_table(spark, sf_dir, "orders")
            .select(
                F.when(F.col("o_orderkey") % 10 < 9, F.lit(0))
                .otherwise(F.col("o_orderkey"))
                .alias("k")
            )
            .distinct()
            .localCheckpoint()  # cut the agg lineage under the join
        )
        joined = li.join(dim, "k")
        n = len(joined.collect())
        assert n == li.count()  # dim holds every key exactly once
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final
        assert "skewed" in final, final  # AQEShuffleRead ... skewed
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
