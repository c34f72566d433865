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
  sliding distinct); the HLL-sketch-merge variant
  (active_users_rolling_hll) replaces it at extreme scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.cumsum import running_sum
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

    The cohort day attaches via MIN() OVER (PARTITION BY user_id) — one
    shuffle on user_id, no cohort self-join — and the cohort size needs
    no separate branch: every user is by definition active at offset 0,
    so n_cohort ≡ n_active(day_offset=0), read back with a window over
    the (tiny) retention grid. The event log is scanned exactly once.
    (The oracle spells the same semantics relationally.)
    """
    act = _activity(spark, sf_dir).withColumn(
        "cohort_day", F.min("day").over(Window.partitionBy("user_id"))
    )
    ret = (
        act.withColumn("day_offset", F.datediff("day", "cohort_day"))
        .filter(F.col("day_offset") <= RETENTION_DAYS)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return ret.withColumn(
        "n_cohort",
        F.max(F.when(F.col("day_offset") == 0, F.col("n_active"))).over(
            Window.partitionBy("cohort_day")
        ),
    ).select(
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
    the exact form fans each (user, day) activity row out to the
    ≤ROLLING_DAYS window-end days it contributes to — an EXPLODE of a
    date sequence, not a theta join (the naive BETWEEN join compiles to
    a nested-loop; the explode is map-side) — then aggregates per day.
    A semi-join against the (tiny, broadcast) observed-day dimension
    drops window ends past the calendar. The expansion is ×7 of a
    relation already orders of magnitude smaller than the event log. At
    extreme scale the sketch alternative is per-day HLLs merged over
    the window (:func:`active_users_rolling_hll`).
    """
    # the day dimension derives from the same activity relation the
    # fan-out consumes — materialize once so the event log scans once
    activity = _activity(spark, sf_dir).localCheckpoint(eager=False)
    days = activity.select(F.col("day").alias("d")).distinct()
    fanned = activity.withColumn(
        "d",
        F.explode(
            F.expr(
                f"sequence(day, date_add(day, {ROLLING_DAYS - 1}), interval 1 day)"
            )
        ),
    ).join(F.broadcast(days), "d", "left_semi")
    return (
        fanned.groupBy("d")
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
    separates a funnel from three filters. The whole funnel is THREE
    CHAINED WINDOW AGGREGATES over the same user_id partitioning — each
    stage's first-qualifying timestamp feeds the next stage's predicate
    — so the event log is scanned once and shuffled once; the per-user
    collapse reuses the same partitioning (no further exchange) and the
    final single-row aggregate folds map-side. (The oracle spells the
    identical semantics as per-stage groupBy + join, which is what this
    plan would degenerate to with 3 scans at 100 TB.)
    """
    w = Window.partitionBy("user_id")
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    staged = (
        e.withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.first("t_view").alias("t_view"),
        F.first("t_click").alias("t_click"),
        F.first("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_view_click"),
        F.count("t_purchase").alias("n_full_funnel"),
    )


@query("active_users_rolling_hll", oracle=None)  # sketch estimates are
# engine-specific (Apache DataSketches HLL); parity vs DuckDB is
# impossible by construction — the repo-side test bounds the estimate
# error against the exact rolling counts instead
def active_users_rolling_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-merge rolling actives — the shape that replaces
    :func:`active_users_rolling` when even the (user, day) relation is
    too big to fan out ×ROLLING_DAYS.

    One pass builds a constant-size HLL sketch PER DAY
    (``hll_sketch_agg`` — mergeable, partial-aggregable); the rolling
    union is then ``hll_union_agg`` over the ≤ROLLING_DAYS sketches in
    each window — work and state proportional to #days × sketch size
    (KB), completely independent of user cardinality. This is how DAU/
    WAU/MAU dashboards run at 100 TB: sketches persist per day and any
    window is a cheap union, never a rescan.
    """
    # one scan builds the per-day sketches; materialize so the semi-join
    # day dimension (derived from the same relation) doesn't re-run the
    # events scan + sketch aggregation a second time
    daily = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .groupBy("day")
        .agg(
            F.countDistinct("user_id").alias("dau"),
            F.hll_sketch_agg("user_id", F.lit(14)).alias("sketch"),
        )
        .localCheckpoint(eager=False)
    )
    fanned = daily.withColumn(
        "d",
        F.explode(
            F.expr(
                f"sequence(day, date_add(day, {ROLLING_DAYS - 1}), interval 1 day)"
            )
        ),
    ).join(
        F.broadcast(daily.select(F.col("day").alias("d")).distinct()),
        "d",
        "left_semi",
    )
    return (
        fanned.groupBy("d")
        .agg(
            F.max(F.when(F.col("day") == F.col("d"), F.col("dau"))).alias("dau"),
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
                f"wau_{ROLLING_DAYS}d_estimate"
            ),
        )
        .withColumnRenamed("d", "day")
    )

# --- deterministic rolling HLL (register-level; see approx.py design notes) ---

from .approx import (  # noqa: E402  (shared deterministic-HLL kernel)
    HLL_EST_SQL,
    HLL_H_SQL,
    HLL_M,
    HLL_RHO_SPARK,
    HLL_RHO_SQL,
    HLL_SCALE,
    HLL_W_BITS,
    hll_estimate_cols,
    hll_h_col,
)


@query(
    "active_users_rolling_hll_det",
    oracle=f"""
    WITH act AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), h AS (
      SELECT day, {HLL_H_SQL.format(col="user_id")} AS h FROM act
    ), reg AS (
      SELECT day, h % {HLL_M} AS bucket, MAX({HLL_RHO_SQL}) AS m_j
      FROM h GROUP BY 1, 2
    ), days AS (
      SELECT DISTINCT day AS d FROM act
    ), merged AS (
      SELECT d.d, r.bucket, MAX(r.m_j) AS m_j
      FROM reg r JOIN days d
        ON d.d >= r.day AND d.d <= r.day + {ROLLING_DAYS - 1}
      GROUP BY 1, 2
    ), agg AS (
      SELECT d AS day,
             COUNT(*) AS m_nonzero,
             CAST(SUM(1::BIGINT << ({HLL_W_BITS + 1} - m_j))
                  + ({HLL_M} - COUNT(*)) * (1::BIGINT << {HLL_W_BITS + 1})
                  AS BIGINT) AS reg_sum_scaled
      FROM merged GROUP BY d
    )
    SELECT day, m_nonzero, reg_sum_scaled,
           {HLL_EST_SQL}
    FROM agg
    """,
)
def active_users_rolling_hll_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day (ROLLING_DAYS) active users from per-day deterministic
    HLL registers — the engine-portable twin of
    :func:`active_users_rolling_hll`. The per-day sketch is a (bucket →
    max rho) register table built once from one event-log scan; the
    rolling union is a register-wise MAX across the ≤ROLLING_DAYS
    days covering each window — the sketch-merge shape that replaces
    the ×ROLLING_DAYS row fan-out of :func:`active_users_rolling` at
    100 TB, with state per day independent of user cardinality. Unlike
    the engine-native DataSketches variant (rows-only by construction),
    these registers and the estimate itself are oracle-verified
    bit-for-bit: exact integer register sums, libm-sourced ln lookup
    (see operators/approx.py design notes). Estimate accuracy vs the
    exact rolling counts is bounded in tests/test_approx.py."""
    act = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    reg = (
        act.select("day", hll_h_col("user_id"))
        .withColumn("bucket", F.col("h") % HLL_M)
        .withColumn("rho", F.expr(HLL_RHO_SPARK))
        .groupBy("day", "bucket")
        .agg(F.max("rho").alias("m_j"))
        .localCheckpoint(eager=False)
    )
    days = reg.select(F.col("day").alias("d")).distinct()
    fanned = reg.withColumn(
        "d",
        F.explode(
            F.expr(
                f"sequence(day, date_add(day, {ROLLING_DAYS - 1}), interval 1 day)"
            )
        ),
    ).join(F.broadcast(days), "d", "left_semi")
    merged = fanned.groupBy("d", "bucket").agg(F.max("m_j").alias("m_j"))
    agg = merged.groupBy(F.col("d").alias("day")).agg(
        F.count("*").alias("m_nonzero"),
        (
            F.sum(F.expr(f"shiftleft(1L, {HLL_W_BITS + 1} - m_j)"))
            + (F.lit(HLL_M) - F.count("*")) * F.lit(HLL_SCALE)
        ).alias("reg_sum_scaled"),
    )
    return hll_estimate_cols(agg, spark).select(
        "day", "m_nonzero", "reg_sum_scaled", "ndv_hll"
    )


@query(
    "running_unique_users",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id
    ),
    per_day AS (
      SELECT first_day AS day, COUNT(*) AS n_new FROM first_seen GROUP BY 1
    )
    SELECT day, CAST(n_new AS BIGINT) AS n_new,
           CAST(SUM(n_new) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cumulative_users
    FROM per_day
    """,
)
def running_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — the product growth curve.

    A naive COUNT(DISTINCT) per day over an expanding frame is
    quadratic state; the standard linear decomposition is: each user
    contributes only at their FIRST day (one groupBy(user) min), the
    per-day new-user counts are a day-level relation, and the running
    total is a cumsum over days. The cumsum uses the two-phase
    range-partitioned form (functions/cumsum.py) — no single-task
    WindowExec even though the day relation is small here, because at
    100 TB the same query runs at hour/minute granularity over years
    (the oracle's serial window is fine for DuckDB; the Spark plan must
    not mirror it). Reference analog: none (product-analytics family,
    SURVEY §2.8 derivative)."""
    first_seen = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("day"))
    )
    per_day = first_seen.groupBy("day").agg(F.count("*").alias("n_new"))
    return running_sum(
        per_day,
        order_by=[F.col("day")],
        value=F.col("n_new"),
        alias="cumulative_users",
    ).select("day", "n_new", F.col("cumulative_users").cast("bigint").alias("cumulative_users"))


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over each user's event
    sequence: for every consecutive (prev → next) event-type pair in
    (ts, event_id) order, how often it occurs — the behavioral-model /
    next-action-prediction primitive (PostgreSQL users write the same
    LAG + GROUP BY). The (ts, event_id) compound order makes the
    sequence total even if two events share a timestamp.

    Scale: the window partitions on user_id — per-user sequences are
    short and user cardinality grows with the data, so parallelism
    grows with the input (the opposite of the low-cardinality serial
    trap); the transition matrix itself is bounded by the type-domain
    squared. One scan, one user-keyed shuffle, one partial-aggregated
    count shuffle. Reference analog: none (event-table product
    analytics family, SURVEY §2.8)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    return seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n")
    )


@query(
    "funnel_time_to_convert",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS s_us,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p_us
      FROM events GROUP BY user_id
    ),
    conv AS (
      SELECT user_id, p_us - s_us AS gap_us
      FROM per_user WHERE s_us IS NOT NULL AND p_us IS NOT NULL AND p_us > s_us
    )
    SELECT COUNT(*) AS n_converted,
           CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) AS avg_gap_us,
           MIN(gap_us) AS min_gap_us,
           MAX(gap_us) AS max_gap_us
    FROM conv
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert: for users whose first purchase follows their
    first signup, the count and the exact mean/min/max of the gap — the
    activation-latency metric every growth dashboard carries.

    Everything is integer micros until ONE final double division
    (sum of gaps ≪ 2^53, so the bigint→double conversion is exact on
    both engines) — no serial median window; the exact-quantile variant
    of this metric is what percentile_cont_quartiles / median_exact
    demonstrate, and the two-phase hash-sample deciles are the
    100 TB path. Shape: one scan, one user-keyed partial-aggregated
    shuffle, one scalar aggregate."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", us)).alias("s_us"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("p_us"),
    )
    conv = per_user.filter(
        F.col("s_us").isNotNull()
        & F.col("p_us").isNotNull()
        & (F.col("p_us") > F.col("s_us"))
    ).select((F.col("p_us") - F.col("s_us")).alias("gap_us"))
    return conv.agg(
        F.count("*").alias("n_converted"),
        (F.sum("gap_us").cast("double") / F.count("*")).alias("avg_gap_us"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )
