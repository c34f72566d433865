"""OLAP analytic operators: rollup/cube/grouping sets, pivot, and the
join shapes Spark lacks natively (as-of, range).

Not reference features (SURVEY.md §2.6) — they complete the "every query
a PostgreSQL user runs today" surface. The as-of join is implemented as
a composition of existing DataFrame ops (union + tagged window carry-
forward) per the custom-operator preference order; its oracle is
DuckDB's native ASOF JOIN, so the composition is verified against a real
as-of implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum
from .registry import query
from .relational import dd


@query(
    "rollup_revenue_by_region_nation",
    oracle=f"""
    SELECT
      CASE WHEN GROUPING(r_name) = 1 THEN '(all)' ELSE r_name END AS region,
      CASE WHEN GROUPING(n_name) = 1 THEN '(all)' ELSE n_name END AS nation,
      CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS INTEGER) AS lvl,
      {dd("SUM(CAST(o_totalprice AS DECIMAL(12,2)))")} AS revenue,
      COUNT(*) AS n_orders
    FROM orders, customer, nation, region
    WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def rollup_revenue_by_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP region→nation→grand-total. At scale the rollup is a single
    pass: Spark expands grouping sets into one aggregate with a grouping
    id — no per-level rescan."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = load_table(spark, sf_dir, "region")
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            (F.grouping("r_name") * 2 + F.grouping("n_name")).cast("int").alias("lvl"),
            dsum("o_totalprice", 12, 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.when(F.col("lvl") >= 2, "(all)").otherwise(F.col("r_name")).alias("region"),
            F.when(F.col("lvl") % 2 == 1, "(all)").otherwise(F.col("n_name")).alias("nation"),
            "lvl",
            "revenue",
            "n_orders",
        )
    )


@query(
    "cube_events",
    oracle="""
    SELECT
      CASE WHEN GROUPING(event_type) = 1 THEN '(all)' ELSE event_type END AS etype,
      CASE WHEN GROUPING(d) = 1 THEN -1 ELSE d END AS dow,
      COUNT(*) AS n
    FROM (SELECT event_type, CAST(dayofweek(ts) AS INTEGER) AS d FROM events) t
    GROUP BY CUBE(event_type, d)
    """,
)
def cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day-of-week). DuckDB dayofweek is 0-6
    Sunday-start; Spark dayofweek() is 1-7 — normalized here via dow-1."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", (F.dayofweek("ts") - 1).cast("int").alias("d")
    )
    return (
        e.cube("event_type", "d")
        .agg(
            F.count("*").alias("n"),
            F.grouping("event_type").alias("g_et"),
            F.grouping("d").alias("g_d"),
        )
        .select(
            F.when(F.col("g_et") == 1, "(all)").otherwise(F.col("event_type")).alias("etype"),
            F.when(F.col("g_d") == 1, -1).otherwise(F.col("d")).alias("dow"),
            "n",
        )
    )


@query(
    "pivot_orderstatus_by_priority",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_F,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_O,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_P,
           {dd("SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2)) END)")}
             AS revenue_F
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_orderstatus_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT expressed as conditional aggregation (the shuffle-equivalent
    form pivot() compiles to; explicit so the oracle matches names)."""
    o = load_table(spark, sf_dir, "orders")

    def status_count(s: str):
        return F.count(F.when(F.col("o_orderstatus") == s, 1)).alias(f"status_{s}")

    return o.groupBy("o_orderpriority").agg(
        status_count("F"),
        status_count("O"),
        status_count("P"),
        F.sum(
            F.when(
                F.col("o_orderstatus") == "F",
                F.col("o_totalprice").cast("decimal(12,2)"),
            )
        )
        .cast("double")
        .alias("revenue_F"),
    )


@query(
    "asof_join_purchase_last_error",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    errors AS (
      SELECT user_id, ts FROM events WHERE event_type = 'error'
    )
    SELECT p.event_id, p.user_id,
           epoch_us(p.ts) - epoch_us(e.ts) AS us_since_last_error
    FROM purchases p
    ASOF LEFT JOIN errors e
      ON p.user_id = e.user_id AND p.ts >= e.ts
    """,
)
def asof_join_purchase_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (most recent error at or before each purchase, per
    user). Spark has no native as-of; this composes it from a tagged
    union + window carry-forward:

      union(errors tagged, purchases tagged)
        → window per user ordered by (ts, tag)  [error sorts first on tie]
        → last non-null error-ts carried forward
        → keep purchase rows.

    One shuffle on user_id, one per-partition sort — the same cost as a
    sort-merge join, scale-clean. Oracle: DuckDB's native ASOF JOIN.
    """
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("tag"), F.lit(None).cast("timestamp").alias("err_ts")
    )
    errors = e.filter(F.col("event_type") == "error").select(
        F.lit(None).cast("bigint").alias("event_id"),
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.col("ts").alias("err_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = purchases.unionByName(errors).withColumn(
        "last_err_ts", F.last("err_ts", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("tag") == 1).select(
        "event_id",
        "user_id",
        (F.unix_micros("ts") - F.unix_micros("last_err_ts")).alias(
            "us_since_last_error"
        ),
    )


@query(
    "range_join_value_bands",
    oracle="""
    WITH bands AS (
      SELECT 'low' AS band, 0.0 AS lo, 50.0 AS hi
      UNION ALL SELECT 'mid', 50.0, 200.0
      UNION ALL SELECT 'high', 200.0, 1e9
    )
    SELECT b.band, COUNT(*) AS n, MIN(e.value) AS min_v, MAX(e.value) AS max_v
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    """,
)
def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: non-equi join against a tiny broadcast bands
    table — the idiomatic Spark shape (broadcast-nested-loop over ~3
    rows; never a shuffle on the big side)."""
    e = load_table(spark, sf_dir, "events")
    bands = e.sparkSession.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 200.0), ("high", 200.0, 1e9)],
        "band string, lo double, hi double",
    )
    return (
        e.join(
            F.broadcast(bands),
            (e.value >= bands.lo) & (e.value < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
    )


@query(
    "unpivot_priority_counts",
    oracle="""
    WITH wide AS (
      SELECT o_orderpriority,
             COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_F,
             COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_O,
             COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_P
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, status, n FROM (
      SELECT o_orderpriority, 'F' AS status, status_F AS n FROM wide
      UNION ALL SELECT o_orderpriority, 'O', status_O FROM wide
      UNION ALL SELECT o_orderpriority, 'P', status_P FROM wide
    ) t
    """,
)
def unpivot_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide per-status counts back to long form via
    DataFrame.unpivot — the inverse of pivot_orderstatus_by_priority."""
    from .relational import dd as _  # noqa: F401  (keep import graph simple)

    wide = pivot_orderstatus_by_priority(spark, sf_dir).drop("revenue_F")
    return (
        wide.unpivot(
            "o_orderpriority",
            ["status_F", "status_O", "status_P"],
            "status",
            "n",
        )
        .withColumn("status", F.substring("status", 8, 1))
    )


@query(
    "grouping_sets_sql",
    oracle=f"""
    SELECT
      CASE WHEN GROUPING(c_mktsegment) = 1 THEN '(all)' ELSE c_mktsegment END AS segment,
      CASE WHEN GROUPING(c_nationkey) = 1 THEN -1 ELSE c_nationkey END AS nationkey,
      COUNT(*) AS n,
      {dd("SUM(CAST(c_acctbal AS DECIMAL(12,2)))")} AS total_bal
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """,
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS through the SQL API (same Catalyst expansion as
    rollup/cube — one aggregate pass)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_gs")
    return spark.sql(
        """
        SELECT
          CASE WHEN GROUPING(c_mktsegment) = 1 THEN '(all)' ELSE c_mktsegment END
            AS segment,
          CASE WHEN GROUPING(c_nationkey) = 1 THEN -1 ELSE c_nationkey END
            AS nationkey,
          COUNT(*) AS n,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
        FROM customer_gs
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


@query(
    "salted_hotkey_value_sum",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(14,4))) AS VARCHAR) AS DOUBLE)
             AS total_value
    FROM events GROUP BY event_type
    """,
)
def salted_hotkey_value_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe aggregation through a salted intermediate key
    (functions/skew.py), driver-verified against the plain GROUP BY —
    the point of salting is that it is CORRECTNESS-NEUTRAL: sum/count
    decompose over the salt, so both plans produce identical values
    while the salted one spreads each hot key over n_salts reducers.
    The fixture's event_type column has single-digit cardinality over
    hundreds of thousands of rows — exactly the shape where a plain
    groupBy funnels everything through ~5 reducers and a 100 TB run
    stalls on the hottest one. (Spark's own partial aggregation already
    combines map-side; the salt additionally splits the REDUCE side,
    which matters when per-key reduce state is large — collect_list,
    exact distinct — or AQE skew handling is unavailable mid-pipeline.)
    The decimal sum keeps the total exact so the salted regrouping is
    bit-identical to the oracle's single-pass sum under any row
    distribution. Reference analog: none (scale-infrastructure family,
    SURVEY §2.8 derivative; see also tests/test_skew.py)."""
    from ..functions.skew import salted_count_sum

    events = load_table(spark, sf_dir, "events")
    out = salted_count_sum(
        events,
        "event_type",
        F.col("value").cast("decimal(14,4)"),
        n_salts=16,
    )
    return out.select(
        "event_type",
        "n",
        F.col("total").cast("string").cast("double").alias("total_value"),
    )
