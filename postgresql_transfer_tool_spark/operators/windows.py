"""Window-function operators.

Not in the reference (SURVEY.md §2.6) but a derived requirement: serial
id generation without sequences is ``row_number()`` (SURVEY.md §7.4
hard-part 3), deterministic pagination needs total ordering, and top-k /
running aggregates are table-stakes analytics the reference delegates to
PostgreSQL.

Scale note: every window here partitions by a real key (never a global
``Window.orderBy`` without partitioning, which would serialize 100 TB
through one task). Where a total order is semantically required, either
the input is pre-filtered to a bounded set first (rank_dense_rank_ntile)
or the computation is re-expressed as the two-phase parallel prefix sum
(serial_id_generation → functions/cumsum.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.cumsum import running_sum
from ..functions.exact import dec
from .registry import query


@query(
    "topk_orders_per_priority",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rk
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    ) t WHERE rk <= 3
    """,
)
def topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per priority class. Deterministic: price
    ties break on the key. At scale: shuffle on o_orderpriority, then a
    per-partition sort — no global sort."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


@query(
    "running_total_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS VARCHAR) AS DOUBLE) AS running_spend
    FROM orders WHERE o_custkey < 100
    """,
)
def running_total_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running spend per customer (exact decimal cumsum → double)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(dec("o_totalprice", 12, 2)).over(w).cast("double").alias("running_spend"),
        )
    )


@query(
    "serial_id_generation",
    oracle="""
    SELECT ROW_NUMBER() OVER (ORDER BY doc_id) AS new_id, doc_id
    FROM documents
    """,
)
def serial_id_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIGSERIAL-equivalent id assignment (SURVEY.md §1.3): a dense,
    deterministic 1-based id over a stable ordering.

    Scale: ROW_NUMBER over a global order is a running COUNT, so it runs
    as the two-phase parallel prefix sum (functions/cumsum.py —
    range-partition on the order key, per-partition row numbering,
    broadcast partition-count offsets). No single task ever numbers more
    than one partition's rows; identical output to the serial window
    form at any partitioning.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return running_sum(
        docs, [F.col("doc_id")], F.lit(1).cast("bigint"), "new_id"
    ).select("new_id", "doc_id")


@query(
    "event_gaps_lag",
    oracle="""
    SELECT user_id, event_id,
           epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
             AS gap_us
    FROM events WHERE user_id < 20
    """,
)
def event_gaps_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap per user in microseconds (LAG + event-time order).
    Integer µs arithmetic — engine-exact, no float time math."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .select(
            "user_id",
            "event_id",
            (us - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        )
    )


@query(
    "rank_dense_rank_ntile",
    oracle="""
    SELECT c_custkey, c_acctbal_cents,
           RANK() OVER (ORDER BY c_acctbal_cents DESC, c_custkey) AS rnk,
           DENSE_RANK() OVER (ORDER BY c_acctbal_cents DESC, c_custkey) AS drnk,
           NTILE(4) OVER (ORDER BY c_acctbal_cents DESC, c_custkey) AS quartile
    FROM (SELECT c_custkey,
                 CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS c_acctbal_cents
          FROM customer WHERE c_custkey <= 200) t
    """,
)
def rank_dense_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK / DENSE_RANK / NTILE over integer cents (exact ordering key).
    Input pre-filtered to a bounded set since the window is global."""
    cents = (dec("c_acctbal", 12, 2) * 100).cast("bigint").alias("c_acctbal_cents")
    base = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 200)
        .select("c_custkey", cents)
    )
    w = Window.orderBy(F.col("c_acctbal_cents").desc(), F.col("c_custkey"))
    return base.select(
        "c_custkey",
        "c_acctbal_cents",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "window_value_functions",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice)
             OVER (PARTITION BY o_orderpriority
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value/distribution window functions (FIRST/LAST/NTH_VALUE,
    PERCENT_RANK, CUME_DIST) with a unique (o_orderdate, o_orderkey)
    tie-break so every frame — and therefore every emitted double — is
    engine-deterministic. o_totalprice passes through unaggregated, so
    no decimal discipline is needed; LAST_VALUE gets an explicit
    whole-partition frame (the default frame ends at CURRENT ROW in
    both engines, which would make it just the current row's value)."""
    part = Window.partitionBy("o_orderpriority").orderBy(
        "o_orderdate", "o_orderkey"
    )
    whole = part.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.first("o_totalprice").over(part).alias("first_price"),
            F.last("o_totalprice").over(whole).alias("last_price"),
            F.nth_value("o_totalprice", 2).over(part).alias("second_price"),
            F.percent_rank().over(part).alias("pct_rank"),
            F.cume_dist().over(part).alias("cume"),
        )
    )


@query(
    "rolling_hour_peak_value",
    oracle="""
    WITH rolled AS (
      SELECT user_id,
             SUM(CAST(value AS DECIMAL(14,4))) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
             ) AS hour_sum
      FROM events
    )
    SELECT user_id,
           CAST(CAST(MAX(hour_sum) AS VARCHAR) AS DOUBLE) AS peak_hour_value,
           COUNT(*) AS n_events
    FROM rolled GROUP BY user_id
    """,
)
def rolling_hour_peak_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: each event's trailing-1-hour value sum per
    user, reduced to the user's peak hour (burst detection — the
    time-series read of the reference's event feed).

    A RANGE frame on integer epoch-microseconds bounds the frame by
    EVENT TIME, not row count — ROWS BETWEEN would silently change
    meaning wherever event density varies. One shuffle on user_id; the
    frame sum is decimal (order-independent, exact), so the peak is
    bit-stable across partitionings and engines. Ties in ts within a
    user fold into the same RANGE frame on both engines, which is why
    RANGE (not ROWS + tie-ordering) is the cross-engine-deterministic
    choice.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    rolled = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.sum(F.col("value").cast("decimal(14,4)")).over(w).alias("hour_sum"),
    )
    return rolled.groupBy("user_id").agg(
        F.max("hour_sum").cast("double").alias("peak_hour_value"),
        F.count("*").alias("n_events"),
    )
