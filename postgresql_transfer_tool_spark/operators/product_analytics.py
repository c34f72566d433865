"""Product-analytics queries over the events table.

The reference's motivating workload is a product-analytics event table
synced to an analytics backend (``event-table.sql:5-19`` — user ids,
event timestamps, JSONB payloads, sync flags). These are the queries the
owner of that table actually runs downstream: cohort retention, rolling
active users, and ordered funnel conversion. All exact and
oracle-mirrored; every count is integer, every ratio a single final IEEE
division, so results hash-match DuckDB bit-for-bit.

Scale shapes (100 TB event streams):
- everything starts from the DISTINCT (user_id, activity-day) relation,
  which is orders of magnitude smaller than the raw event log and
  computed with one hash shuffle;
- per-user funnels shuffle on user_id only; stage joins are
  co-partitioned on the same key so AQE plans them without extra
  exchanges;
- the rolling window fans the day-level activity out ×7 (bounded, exact
  sliding distinct); at extreme scale the HLL-sketch-merge variant
  (approx.py) replaces it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

#: retention horizon (days after the cohort day)
RETENTION_DAYS = 7

#: rolling-active window width (days)
ROLLING_DAYS = 7


def _activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (user_id, day) — the kernel every query here builds on."""
    return (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )


@query(
    "cohort_retention",
    oracle=f"""
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), cohort AS (
      SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
    ), sizes AS (
      SELECT cohort_day, COUNT(*) AS n_cohort FROM cohort GROUP BY cohort_day
    ), ret AS (
      SELECT c.cohort_day, date_diff('day', c.cohort_day, a.day) AS day_offset,
             COUNT(DISTINCT a.user_id) AS n_active
      FROM cohort c JOIN activity a ON a.user_id = c.user_id
      WHERE date_diff('day', c.cohort_day, a.day) <= {RETENTION_DAYS}
      GROUP BY 1, 2
    )
    SELECT r.cohort_day, r.day_offset, r.n_active, s.n_cohort,
           CAST(r.n_active AS DOUBLE) / CAST(s.n_cohort AS DOUBLE) AS retention
    FROM ret r JOIN sizes s ON r.cohort_day = s.cohort_day
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic day-N retention: users grouped by first-activity day, the
    fraction still active at each day offset within RETENTION_DAYS.

    cohort (groupBy user) and activity join co-partitioned on user_id;
    the cohort-size relation is tiny (≤ one row per calendar day) and
    broadcasts into the final ratio join.
    """
    activity = _activity(spark, sf_dir)
    cohort = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sizes = cohort.groupBy("cohort_day").agg(F.count("*").alias("n_cohort"))
    ret = (
        cohort.join(activity, "user_id")
        .withColumn("day_offset", F.datediff("day", "cohort_day"))
        .filter(F.col("day_offset") <= RETENTION_DAYS)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return ret.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day",
        "day_offset",
        "n_active",
        "n_cohort",
        (F.col("n_active").cast("double") / F.col("n_cohort").cast("double")).alias(
            "retention"
        ),
    )


@query(
    "active_users_rolling",
    oracle=f"""
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), days AS (
      SELECT DISTINCT day FROM activity
    )
    SELECT d.day,
           COUNT(DISTINCT CASE WHEN a.day = d.day THEN a.user_id END) AS dau,
           COUNT(DISTINCT a.user_id) AS wau_{ROLLING_DAYS}d
    FROM days d JOIN activity a
      ON a.day BETWEEN d.day - {ROLLING_DAYS - 1} AND d.day
    GROUP BY d.day
    """,
)
def active_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU plus exact ROLLING_DAYS-day rolling distinct active users.

    Sliding COUNT(DISTINCT) doesn't compose as a window aggregate, so
    the exact form fans the (already day-deduplicated) activity relation
    out to the ≤ROLLING_DAYS calendar days it contributes to — a bounded
    ×7 expansion of a relation that is tiny next to the raw event log —
    then aggregates per day. The day dimension broadcasts. At extreme
    scale the sketch alternative is per-day HLLs merged over the window
    (approx.py shows the HLL path).
    """
    activity = _activity(spark, sf_dir)
    days = activity.select("day").distinct()
    joined = F.broadcast(days.select(F.col("day").alias("d"))).join(
        activity,
        (F.col("day") >= F.date_sub(F.col("d"), ROLLING_DAYS - 1))
        & (F.col("day") <= F.col("d")),
    )
    return (
        joined.groupBy("d")
        .agg(
            F.countDistinct(
                F.when(F.col("day") == F.col("d"), F.col("user_id"))
            ).alias("dau"),
            F.countDistinct("user_id").alias(f"wau_{ROLLING_DAYS}d"),
        )
        .withColumnRenamed("d", "day")
    )


@query(
    "funnel_user_conversion",
    oracle="""
    WITH first_view AS (
      SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
      FROM events GROUP BY user_id
    ), first_click AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN first_view v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ), first_purchase AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN first_click c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT COUNT(*) AS n_users,
           COUNT(v.t_view) AS n_view,
           COUNT(c.t_click) AS n_view_click,
           COUNT(p.t_purchase) AS n_full_funnel
    FROM first_view v
    LEFT JOIN first_click c ON v.user_id = c.user_id
    LEFT JOIN first_purchase p ON v.user_id = p.user_id
    """,
)
def funnel_user_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: view → click strictly after the first view →
    purchase strictly after that click, counted per user.

    Order matters (a click before any view doesn't count), which is what
    separates a funnel from three filters. Every stage is a groupBy on
    user_id; successive stages join co-partitioned on the same key, so
    the whole funnel is one partitioning of the user space. The final
    single-row aggregate collapses map-side.
    """
    events = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    first_view = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    first_click = (
        events.filter(F.col("event_type") == "click")
        .join(first_view, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    first_purchase = (
        events.filter(F.col("event_type") == "purchase")
        .join(first_click, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        first_view.join(first_click, "user_id", "left")
        .join(first_purchase, "user_id", "left")
        .agg(
            F.count("*").alias("n_users"),
            F.count("t_view").alias("n_view"),
            F.count("t_click").alias("n_view_click"),
            F.count("t_purchase").alias("n_full_funnel"),
        )
    )
