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

from ..catalog import TABLES, list_tables, load_table
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
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
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
