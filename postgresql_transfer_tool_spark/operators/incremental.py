"""Incremental-sync operators (batch form) — SURVEY.md §2.7 I1-I3.

The reference's motivating table encodes a flag-and-timestamp CDC
protocol (``synced_with_posthog``, ``last_local_modified_at`` —
``event-table.sql:17-18``) that its scripts brute-force with full
reloads. The engine implements the protocol properly:

- I1 flag predicate: select unsynced rows, flip flags on write-back;
- I2 high-water-mark: ``modified > checkpoint`` incremental batch;
- I3 event-time windows: tumbling/hopping aggregation on event time.

The streaming realization (Structured Streaming + watermark) lives in
``streaming/``; these batch forms are the oracle-checkable semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import dsum
from .registry import query
from .relational import dd

#: a mid-range checkpoint inside the fixture's [2024-01-01, 2024-01-31) span
_CHECKPOINT = "2024-01-25 00:00:00"


@query(
    "hwm_incremental_batch",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n_new,
           MAX(ts) AS new_hwm
    FROM events
    WHERE ts > TIMESTAMP '{_CHECKPOINT}'
    GROUP BY event_type
    """,
)
def hwm_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I2: one incremental batch above the stored high-water mark. The
    predicate pushes into the parquet scan (min/max row-group pruning) —
    at 100 TB an incremental run reads only the new partitions."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts") > F.lit(_CHECKPOINT).cast("timestamp"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_new"), F.max("ts").alias("new_hwm"))
    )


@query(
    "unsynced_flag_scan",
    oracle="""
    SELECT COUNT(*) AS n_unsynced,
           MIN(event_id) AS first_unsynced,
           MAX(event_id) AS last_unsynced
    FROM events
    WHERE NOT COALESCE(CAST(json_extract_string(props, '$.synced') AS BOOLEAN), FALSE)
    """,
)
def unsynced_flag_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I1: the unsynced-rows scan (``synced_with_posthog = FALSE``
    analog). The flag-flip write-back half is exercised in
    tests/test_incremental.py via the checkpoint store."""
    synced = F.coalesce(
        F.get_json_object("props", "$.synced").cast("boolean"), F.lit(False)
    )
    return (
        load_table(spark, sf_dir, "events")
        .filter(~synced)
        .agg(
            F.count("*").alias("n_unsynced"),
            F.min("event_id").alias("first_unsynced"),
            F.max("event_id").alias("last_unsynced"),
        )
    )


@query(
    "event_time_tumbling_window",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           {dd("SUM(CAST(value AS DECIMAL(14,4)))")} AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-29 00:00:00'
    GROUP BY 1, 2
    """,
)
def event_time_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3: tumbling 1-hour event-time window. Expressed via F.window (the
    streaming-compatible form); the struct is flattened to the window
    start so the result is plain-SQL-comparable."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts") >= F.lit("2024-01-29 00:00:00").cast("timestamp")
    )
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value", 14, 4).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "sessionization_gap_30m",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts)
                       - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE user_id < 50
    ),
    sessions AS (
      SELECT user_id, ts,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT)
               AS session_id
      FROM marked
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sessions GROUP BY user_id, session_id
    """,
)
def sessionization_gap_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag + cumulative sum —
    the batch equivalent of streaming session_window. Partition-parallel
    per user; no global state."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    marked = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .withColumn(
            "new_session",
            F.when(gap_us > 1_800_000_000, 1)
            .when(F.lag("ts").over(w).isNull(), 1)
            .otherwise(0),
        )
    )
    return (
        marked.withColumn("session_id", F.sum("new_session").over(wcum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


@query(
    "event_time_hopping_window",
    oracle=f"""
    WITH hops AS (
      SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000
                            - CAST(k AS BIGINT) * 900000000) AS window_start,
             user_id, value
      FROM events
      CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)
      WHERE ts >= TIMESTAMP '2024-01-29 00:00:00'
    )
    SELECT window_start,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {dd("SUM(CAST(value AS DECIMAL(14,4)))")} AS total_value
    FROM hops GROUP BY window_start
    """,
)
def event_time_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3: hopping (sliding) event-time window — 1-hour windows advancing
    every 15 minutes, the streaming-native form (``F.window(ts, len,
    slide)`` works identically under ``readStream``). Each event lands in
    exactly window/slide = 4 windows; the oracle makes that explicit by
    cross-joining the 4 hop offsets against epoch-aligned 15-minute
    buckets (same 1970-epoch origin Spark uses). At 100 TB the 4×
    row amplification happens inside the partial aggregation (map-side
    combine collapses it before the shuffle), so the exchange carries
    only (window, partial-agg) rows, not 4× the events."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts") >= F.lit("2024-01-29 00:00:00").cast("timestamp")
    )
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value", 14, 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "n_users",
            "total_value",
        )
    )


#: sparse-metric threshold for the gap-fill query (tuned so every
#: fixture SF has both observed and missing (type, day) cells)
GAP_FILL_MIN_VALUE = 250


@query(
    "timeseries_gap_fill",
    oracle=f"""
    WITH days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
    ), types AS (
      SELECT DISTINCT event_type FROM events
    ), daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             {dd("SUM(CAST(value AS DECIMAL(14,4)))")} AS daily_sum
      FROM events WHERE value > {GAP_FILL_MIN_VALUE}
      GROUP BY 1, 2
    ), spine AS (
      SELECT t.event_type, d.day FROM types t CROSS JOIN days d
    )
    SELECT s.event_type, s.day,
           m.daily_sum,
           last_value(m.daily_sum IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum,
           (m.daily_sum IS NULL
            AND last_value(m.daily_sum IGNORE NULLS) OVER (
                  PARTITION BY s.event_type ORDER BY s.day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) IS NOT NULL)
             AS is_filled
    FROM spine s
    LEFT JOIN daily m ON m.event_type = s.event_type AND m.day = s.day
    """,
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill a sparse daily metric: build the complete
    (event_type × day) spine, left-join the observed daily sums (only
    days with any value > 250 = GAP_FILL_MIN_VALUE event exist), and
    forward-fill missing days with the last observation
    (``last(..., ignorenulls=True)`` ↔ DuckDB ``last_value(...IGNORE
    NULLS)`` — verified identical frame semantics). Days before the
    first observation stay NULL — the honest answer, not zero. This is
    the metric-repair pass every monitoring/training-data pipeline runs
    before trend math. Scale: the spine and daily relations are
    day-level (tiny vs the event log — the one scan aggregates with
    map-side combine); the fill window partitions by series key, so
    parallelism is per-series. For high-cardinality series (per-user
    fill) the same two-phase trick as functions/cumsum.py applies:
    per-partition last-observation, broadcast partition-boundary
    carry-ins. Reference analog: none (event-table time-series family,
    SURVEY §2.8/I3 derivative)."""
    # ONE event-log scan: the day-level base carries the (possibly NULL)
    # sparse metric for every (type, day) with any event; spine axes and
    # observed sums all derive from it, so the 100 TB log is read once.
    base = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.when(
                    F.col("value") > GAP_FILL_MIN_VALUE,
                    F.col("value").cast("decimal(14,4)"),
                )
            )
            .cast("double")
            .alias("daily_sum")
        )
        .localCheckpoint(eager=False)
    )
    days = base.select("day").distinct()
    types = base.select("event_type").distinct()
    daily = base.filter(F.col("daily_sum").isNotNull())
    spine = types.crossJoin(F.broadcast(days))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = F.last("daily_sum", ignorenulls=True).over(w)
    return (
        spine.join(F.broadcast(daily), ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            "daily_sum",
            filled.alias("filled_sum"),
            (F.col("daily_sum").isNull() & filled.isNotNull()).alias("is_filled"),
        )
    )


@query(
    "timeseries_anomaly_zscore",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS ds
      FROM events GROUP BY 1, 2
    ), win AS (
      SELECT event_type, day, ds,
             COUNT(*) OVER w AS n_prior,
             SUM(ds) OVER w AS s_prior,
             -- widen one operand to DECIMAL(19,4): DuckDB then squares
             -- in int128 at DECIMAL(37,8) — exact and identical to
             -- Spark's decimal(18,4)*decimal(18,4) product (an
             -- unwidened square runs in int64 and overflows)
             SUM(CAST(ds AS DECIMAL(19,4)) * ds) OVER w AS ss_prior
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day,
           {dd("ds")} AS daily_sum,
           CASE WHEN n_prior >= 3 THEN
             ({dd("ds")} - {dd("s_prior")} / CAST(n_prior AS DOUBLE))
             / sqrt(({dd("ss_prior")} - {dd("s_prior")} * {dd("s_prior")}
                     / CAST(n_prior AS DOUBLE)) / CAST(n_prior AS DOUBLE))
           END AS zscore
    FROM win
    """,
)
def timeseries_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection on the daily metric: each
    (event_type, day) scored against the mean/stddev of its own
    preceding 7 days (current day excluded — the day under test must
    not contaminate its own baseline; days with under 3 priors get
    NULL, the honest cold-start answer). The moments come from exact
    decimal window sums (order-independent under any partitioning) and
    the z closes with the same correctly-rounded double sequence on
    both engines — sqrt and division are IEEE-exact, so even the
    *score* is bit-portable and oracle-verified. Scale: the window
    partitions by series key over the day-level relation (tiny vs the
    event log, which is read once with map-side combine); this is the
    alerting pass a metrics pipeline runs after gap-fill. Division by
    a zero stddev yields NULL/Infinity identically in both engines
    only for constant windows — the fixture's continuous values make
    that measure-zero, and the n_prior floor already guards the
    degenerate 1-2 day case. Reference analog: none (event-table
    time-series family, SURVEY §2.8/I3 derivative)."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        # re-bound the widened sum to decimal(18,4): ds*ds is then
        # decimal(37,8) — exact in Spark AND at the oracle's scale-8
        # product, instead of the decimal(38,6) precision-loss rounding
        # a decimal(28,4) square would trigger (ADVICE r3, medium)
        .agg(
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("decimal(18,4)")
            .alias("ds")
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    win = daily.select(
        "event_type",
        "day",
        "ds",
        F.count("*").over(w).alias("n_prior"),
        F.sum("ds").over(w).alias("s_prior"),
        F.sum(F.col("ds") * F.col("ds")).over(w).alias("ss_prior"),
    )

    def d(c):
        return F.col(c).cast("string").cast("double")

    n = F.col("n_prior").cast("double")
    mean = d("s_prior") / n
    var = (d("ss_prior") - d("s_prior") * d("s_prior") / n) / n
    z = (d("ds") - mean) / F.sqrt(var)
    return win.select(
        "event_type",
        "day",
        d("ds").alias("daily_sum"),
        F.when(F.col("n_prior") >= 3, z).alias("zscore"),
    )


#: debounce gap: a repeat (user, event_type) arrival within this many
#: microseconds of its predecessor is a bounce, not a new signal
DEBOUNCE_GAP_US = 600_000_000  # 10 minutes


@query(
    "events_debounce_gap",
    oracle=f"""
    WITH g AS (
      SELECT user_id, event_type, event_id,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id)) AS gap
      FROM events
    )
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN gap IS NULL OR gap >= {DEBOUNCE_GAP_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN gap IS NULL OR gap >= {DEBOUNCE_GAP_US}
                         THEN event_id ELSE 0 END) AS BIGINT) AS kept_id_sum
    FROM g GROUP BY user_id, event_type
    """,
)
def events_debounce_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-debounce event dedup: within each (user, event_type) series,
    an arrival closer than DEBOUNCE_GAP_US to its predecessor is a
    bounce (double-click, retry storm, at-least-once replay) and is
    dropped; the first arrival of each burst survives. The batch analog
    of streaming dropDuplicates-within-watermark, and the standard
    pre-aggregation pass a clickstream pipeline runs before counting.

    This is the lag-gap (predecessor-relative) form — one partitioned
    lag window per series plus one aggregation, fully parallel per
    (user, type) key with deterministic (ts, event_id) ordering; the
    burst-anchor-relative form needs a running-state scan
    (applyInPandasWithState in streaming/stateful.py covers that
    shape). Output is the per-series audit (total, kept, checksum of
    kept ids) rather than the kept rows, keeping the driver compare
    compact at any SF. Reference analog: none (event-table family,
    SURVEY §2.8/I3 derivative)."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    kept = gap.isNull() | (gap >= DEBOUNCE_GAP_US)
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("kept", kept)
        .groupBy("user_id", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("kept").cast("bigint")).alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("event_id")).otherwise(F.lit(0)))
            .alias("kept_id_sum"),
        )
    )
