"""Core relational operators: scans, projections, predicates, aggregates.

Covers the reference inventory S2/S3 (scans), P1/P3 (projection,
exclusion predicate), A1-A4 (COUNT/MAX/COALESCE aggregates) from
SURVEY.md §2.1-§2.3, plus the flagship TPC-H-Q1-style pricing summary
(SURVEY.md §7.1).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import TABLES, balance_scan, list_tables, load_table
from ..functions.exact import davg, dec, dsum
from .registry import query


def dd(expr: str) -> str:
    """Oracle-side decimal→double conversion, via VARCHAR.

    DuckDB's direct ``CAST(DECIMAL AS DOUBLE)`` double-rounds (int128 →
    double, then ×10^-scale) and can land one ulp away from the correctly
    rounded result; decimal→string→double is correctly rounded in both
    engines and matches Spark's ``Decimal.toDouble`` bit-for-bit.
    """
    return f"CAST(CAST(({expr}) AS VARCHAR) AS DOUBLE)"

# ---------------------------------------------------------------------------
# Flagship: TPC-H-Q1-style pricing summary.
# Scan → pushed-down filter → hash aggregate (partial/final, map-side
# combine) → small sort. At 100 TB: the filter and the 4-column projection
# reach the parquet reader (verified in tests/test_plans.py), the groupBy
# shuffles only ~6 groups × n_partitions of partial aggregates — the job
# is scan-bound, which is optimal for this shape.
# ---------------------------------------------------------------------------


_Q1_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * CAST(1 - CAST(l_discount AS DECIMAL(6,4)) AS DECIMAL(7,4))"
)
_Q1_CHARGE = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * CAST(CAST(1 - CAST(l_discount AS DECIMAL(6,4)) AS DECIMAL(7,4))"
    "        * CAST(1 + CAST(l_tax AS DECIMAL(6,4)) AS DECIMAL(7,4)) AS DECIMAL(15,8))"
)


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {dd("SUM(CAST(l_quantity AS DECIMAL(12,2)))")} AS sum_qty,
      {dd("SUM(CAST(l_extendedprice AS DECIMAL(12,2)))")} AS sum_base_price,
      {dd(f"SUM({_Q1_DISC_PRICE})")} AS sum_disc_price,
      {dd(f"SUM({_Q1_CHARGE})")} AS sum_charge,
      {dd("SUM(CAST(l_quantity AS DECIMAL(12,2)))")} / COUNT(l_quantity) AS avg_qty,
      {dd("SUM(CAST(l_extendedprice AS DECIMAL(12,2)))")} / COUNT(l_extendedprice) AS avg_price,
      {dd("SUM(CAST(l_discount AS DECIMAL(6,4)))")} / COUNT(l_discount) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    # Intermediate decimal widths are capped explicitly so that *both*
    # engines stay in exact decimal arithmetic: an uncapped triple product
    # exceeds width 38 in DuckDB, which then silently falls back to
    # (order-dependent) DOUBLE summation.
    one = F.lit(1).cast("decimal(1,0)")
    one_minus_disc = (one - dec("l_discount", 6, 4)).cast("decimal(7,4)")
    one_plus_tax = (one + dec("l_tax", 6, 4)).cast("decimal(7,4)")
    disc_price = dec("l_extendedprice", 12, 2) * one_minus_disc
    charge = dec("l_extendedprice", 12, 2) * (one_minus_disc * one_plus_tax).cast(
        "decimal(15,8)"
    )
    filtered = l.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    # r14 (guide §2.5): the fold's partial aggregation runs fused into
    # the scan stage; on a layout whose row-group count caps scan
    # parallelism below the core budget, balance first (filter stays
    # pushed at the scan — the exchange sits above it). No-op at scale.
    filtered = balance_scan(spark, filtered, sf_dir, "lineitem")
    return (
        filtered
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 12, 2).alias("sum_qty"),
            dsum("l_extendedprice", 12, 2).alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity", 12, 2).alias("avg_qty"),
            davg("l_extendedprice", 12, 2).alias("avg_price"),
            davg("l_discount", 6, 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# S2 — full-table scan (reference `session.query(table)`,
# transfer_data_script.py:109-110). Identity projection; stays columnar.
# ---------------------------------------------------------------------------


@query("full_scan_region", oracle="SELECT r_regionkey, r_name FROM region")
def full_scan_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")


# ---------------------------------------------------------------------------
# P1 — column projection (reference row→dict materialization,
# transfer_data_script.py:121-125). In Spark the projection is pruned at
# the parquet scan: only these three columns are read off disk.
# ---------------------------------------------------------------------------


@query(
    "projection_customer",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer",
)
def projection_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")


# ---------------------------------------------------------------------------
# S3 — paginated scan. The reference pages with unordered OFFSET/LIMIT
# (transfer_data_script.py:107-114) which is non-deterministic and
# O(N²) server work (SURVEY.md §4 O1-O2). The engine's literal-semantics
# version forces a total order on the PK first; the *bulk-copy* use case
# instead disappears into partitioned scans (sources/jdbc.py).
# ---------------------------------------------------------------------------


@query(
    "paginated_scan_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100
    """,
)
def paginated_scan_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(50)
    )


# ---------------------------------------------------------------------------
# P3 — exclusion-list predicate (reference skips blacklisted tables,
# transfer_data_script.py:26-27,46-48; here applied both at the table
# level in the transfer pipeline and at the row level).
# ---------------------------------------------------------------------------


@query(
    "exclusion_filter_events",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events
    WHERE event_type NOT IN ('error', 'signup')
    GROUP BY event_type
    """,
)
def exclusion_filter_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .filter(~F.col("event_type").isin("error", "signup"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# A1 — COUNT(*) per table (reference drives its chunk loop and validation
# off this, transfer_data_script.py:102-105). One cheap count-star job per
# table; parquet row-group metadata makes these metadata-only scans.
# ---------------------------------------------------------------------------


def _counts_oracle() -> str:
    return "\nUNION ALL\n".join(
        f"SELECT '{t}' AS table_name, COUNT(*) AS row_count FROM {t}" for t in TABLES
    )


@query("count_per_table", oracle=_counts_oracle())
def count_per_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = [
        load_table(spark, sf_dir, t).agg(
            F.lit(t).alias("table_name"), F.count("*").alias("row_count")
        )
        for t in list_tables(sf_dir)
    ]
    return reduce(DataFrame.unionByName, parts)


# ---------------------------------------------------------------------------
# A2/A3 — MAX of serial columns (sequence high-water marks,
# after-running-script.sql:20,54,65).
# ---------------------------------------------------------------------------


@query(
    "max_serial_hwm",
    oracle="""
    SELECT MAX(event_id) AS max_id, MAX(user_id) AS max_history_id FROM events
    """,
)
def max_serial_hwm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").agg(
        F.max("event_id").alias("max_id"), F.max("user_id").alias("max_history_id")
    )


# ---------------------------------------------------------------------------
# A4 — COALESCE(MAX(id),0)+1: NULL-safe next-sequence-value, including the
# empty-table case (after-running-script.sql:100-113).
# ---------------------------------------------------------------------------


@query(
    "sequence_next_values",
    oracle="""
    SELECT 'orders' AS table_name,
           CAST(COALESCE(MAX(o_orderkey), 0) + 1 AS BIGINT) AS next_val
    FROM orders
    UNION ALL
    SELECT 'orders_empty' AS table_name,
           CAST(COALESCE(MAX(o_orderkey), 0) + 1 AS BIGINT) AS next_val
    FROM orders WHERE o_orderkey < 0
    """,
)
def sequence_next_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def next_val(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("table_name"),
            (F.coalesce(F.max("o_orderkey"), F.lit(0)) + F.lit(1))
            .cast("bigint")
            .alias("next_val"),
        )

    return next_val(orders, "orders").unionByName(
        next_val(orders.filter(F.col("o_orderkey") < 0), "orders_empty")
    )


# ---------------------------------------------------------------------------
# Grouped aggregation over the events stream table (extends the
# reference's whole-table-only aggregates to GROUP BY — needed by the
# validators in §2.5 and every extension operator).
# ---------------------------------------------------------------------------


@query(
    "events_by_type",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {dd("SUM(CAST(value AS DECIMAL(14,4)))")} AS total_value,
           {dd("MIN(CAST(value AS DECIMAL(14,4)))")} AS min_value,
           {dd("MAX(CAST(value AS DECIMAL(14,4)))")} AS max_value,
           {dd("SUM(CAST(value AS DECIMAL(14,4)))")} / COUNT(value) AS avg_value
    FROM events
    GROUP BY event_type
    """,
)
def events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value", 14, 4).alias("total_value"),
            F.min(dec("value", 14, 4)).cast("double").alias("min_value"),
            F.max(dec("value", 14, 4)).cast("double").alias("max_value"),
            davg("value", 14, 4).alias("avg_value"),
        )
    )


@query("distinct_mktsegment", oracle="SELECT DISTINCT c_mktsegment FROM customer")
def distinct_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()


# ---------------------------------------------------------------------------
# S4 — catalog listing as a query (the reference's pg_tables scan,
# after-running-script.sql:7-10; here the reflected fixture universe).
# ---------------------------------------------------------------------------


def _catalog_oracle() -> str:
    return "\nUNION ALL\n".join(
        f"SELECT '{t}' AS table_name, 'public' AS table_schema" for t in TABLES
    )


@query("catalog_list_tables", oracle=_catalog_oracle())
def catalog_list_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.createDataFrame(
        [(t, "public") for t in list_tables(sf_dir)],
        "table_name string, table_schema string",
    )


# ---------------------------------------------------------------------------
# Q6-style: the pure scan-filter-aggregate shape (predicate selectivity
# fully pushed; no shuffle beyond one partial/final agg).
# ---------------------------------------------------------------------------


@query(
    "q6_revenue_change",
    oracle=f"""
    SELECT {dd("SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4)))")}
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.03 AND l_discount <= 0.05
      AND l_quantity < 24
    """,
)
def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice", 12, 2) * dec("l_discount", 6, 4))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q4-style: correlated EXISTS subquery (decorrelated by Catalyst into a
# semi-join — the SQL-API surface for subquery workloads).
# ---------------------------------------------------------------------------


@query(
    "q4_order_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
                  AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_q4")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q4")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders_q4
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem_q4 WHERE l_orderkey = o_orderkey
                      AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# Q17-style: correlated scalar subquery (per-group average threshold).
# ---------------------------------------------------------------------------


@query(
    "scalar_subquery_below_avg",
    oracle=f"""
    SELECT COUNT(*) AS n_small,
           {dd("SUM(CAST(l_extendedprice AS DECIMAL(12,2)))")} AS total_price
    FROM lineitem l1
    WHERE l_quantity < (
      SELECT 0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
      FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey
    )
    """,
)
def scalar_subquery_below_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lines under half their part's average quantity — Catalyst
    decorrelates the scalar subquery into an aggregate + join (one
    shuffle on l_partkey), the plan a hand-written window would produce.
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q17")
    return spark.sql(
        """
        SELECT COUNT(*) AS n_small,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        FROM lineitem_q17 l1
        WHERE l_quantity < (
          SELECT 0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
          FROM lineitem_q17 l2 WHERE l2.l_partkey = l1.l_partkey
        )
        """
    )


@query(
    "region_nation_listagg",
    oracle="""
    SELECT r.r_name AS region,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           COUNT(*) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def region_nation_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/string_agg): collect_list is
    non-deterministic under partitioning, so the engine sorts the
    collected array before joining — the only order-stable form at scale
    (same discipline as the exact-decimal rule for float sums)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return (
        nation.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        )
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count("*").alias("n_nations"),
        )
    )
