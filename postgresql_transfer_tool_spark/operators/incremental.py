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
from ..functions.cumsum import running_sum
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


IC_DUR_UNIT_US = 10_000_000  # each whole unit of `value` = 10 s of interval


@query(
    "interval_concurrency_peak",
    oracle=f"""
    WITH iv AS (
      SELECT event_type, epoch_us(ts) AS s,
             epoch_us(ts) + CAST(FLOOR(value) AS BIGINT) * {IC_DUR_UNIT_US} AS e
      FROM events
    ),
    pts AS (
      SELECT event_type, s AS t, 1 AS delta FROM iv
      UNION ALL
      SELECT event_type, e AS t, -1 AS delta FROM iv
    ),
    dl AS (SELECT event_type, t, SUM(delta) AS delta FROM pts GROUP BY 1, 2),
    c AS (
      SELECT event_type, t,
             SUM(delta) OVER (PARTITION BY event_type ORDER BY t) AS conc
      FROM dl
    ),
    mx AS (SELECT event_type, MAX(conc) AS peak FROM c GROUP BY 1)
    SELECT m.event_type, CAST(m.peak AS BIGINT) AS peak, MIN(c.t) AS at_us
    FROM mx m JOIN c ON c.event_type = m.event_type AND c.conc = m.peak
    GROUP BY 1, 2
    """,
)
def interval_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line max-overlap: each event is an interval
    [ts, ts + ⌊value⌋·10 s); the peak number of simultaneously open
    intervals per event type, and the earliest instant it is reached —
    the classic "max concurrent sessions" query (PostgreSQL users write
    it with a LATERAL unnest + window).

    The sweep is +-1 deltas at interval endpoints (merged per timestamp
    so ties are order-free), then a running sum. The running sum is the
    two-phase parallel prefix sum (functions/cumsum.py), NOT a
    per-type window: event_type has single-digit cardinality, so a
    window partitioned by it is as serial as no partition at all at
    100 TB. Ordering by (event_type, t) makes the global cumsum equal
    the within-type cumsum because each type's deltas sum to zero —
    every +1 has its matching -1 — so the accumulator always re-crosses
    zero at a type boundary. Endpoints are integer micros and deltas
    integers: bit-exact vs the oracle (FLOOR(value) on both sides —
    CAST alone truncates in Spark but rounds in DuckDB)."""
    ev = load_table(spark, sf_dir, "events")
    s = F.unix_micros(F.col("ts"))
    e = s + F.floor(F.col("value")).cast("bigint") * F.lit(IC_DUR_UNIT_US)
    iv = ev.select("event_type", s.alias("s"), e.alias("e"))
    pts = iv.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select("event_type", F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    dl = pts.groupBy("event_type", "t").agg(F.sum("delta").alias("delta"))
    # the cumsum relation feeds BOTH the per-type peak aggregate and the
    # peak-instant join below — checkpoint it so the two-phase window +
    # offsets subplan materializes once instead of twice (guide §5:
    # cut lineage when an intermediate is reused; the relation is
    # delta-point-sized, bounded by 2× the distinct event timestamps)
    c = running_sum(
        dl, [F.col("event_type"), F.col("t")], F.col("delta"), "conc"
    ).localCheckpoint(eager=False)
    mx = c.groupBy("event_type").agg(F.max("conc").alias("peak"))
    return (
        c.join(F.broadcast(mx), "event_type")
        .filter(F.col("conc") == F.col("peak"))
        .groupBy("event_type", "peak")
        .agg(F.min("t").alias("at_us"))
    )


@query(
    "ewma_daily_value",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(14,4))) * 10000 AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT day FROM daily),
    types AS (SELECT DISTINCT event_type FROM daily),
    spine AS (
      SELECT t.event_type, d.day, COALESCE(m.v, 0) AS v
      FROM types t CROSS JOIN days d
      LEFT JOIN daily m ON m.event_type = t.event_type AND m.day = d.day
    )
    SELECT event_type, day,
           COALESCE(LAG(v, 0) OVER w, 0) * 128 + COALESCE(LAG(v, 1) OVER w, 0) * 64 + COALESCE(LAG(v, 2) OVER w, 0) * 32 + COALESCE(LAG(v, 3) OVER w, 0) * 16 + COALESCE(LAG(v, 4) OVER w, 0) * 8 + COALESCE(LAG(v, 5) OVER w, 0) * 4 + COALESCE(LAG(v, 6) OVER w, 0) * 2 + COALESCE(LAG(v, 7) OVER w, 0) * 1 AS ewma_scaled
    FROM spine WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
)
def ewma_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated exponential moving average of the daily value total per
    event type: ewma_scaled(t) = SUM_(k=0..7) v(t-k)*2^(7-k), i.e. the
    alpha = 1/2 EWMA cut at 8 lags, in pure integer arithmetic (v is the
    day's value total in exact 1e-4 units; weights are powers of two),
    so the smoothing is bit-exact against the oracle with no float
    powers anywhere. Missing days on the observed-day spine count as 0
    (smoothing decays through silence); for a calendar-dense spine,
    generate_series the range as timeseries_gap_fill does.

    Scale: one event-log scan collapses to the (type x day) aggregate;
    everything after — spine, lags, weighted sum — runs on that bounded
    relation, so the per-type window is domain-bounded, not data-bounded
    (the gap-fill precedent)."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            (F.sum(F.col("value").cast("decimal(14,4)")) * 10000)
            .cast("bigint")
            .alias("v")
        )
        .localCheckpoint(eager=False)
    )
    days = daily.select("day").distinct()
    types = daily.select("event_type").distinct()
    # no hint on `daily`: its Aggregate hides behind the checkpoint's
    # LogicalRDD leaf, so a static hint is indistinguishable from an
    # O(N) broadcast in the plan sweep — AQE broadcasts it at runtime
    # from its actual (type × day)-bounded size.
    spine = (
        types.crossJoin(F.broadcast(days))
        .join(daily, ["event_type", "day"], "left")
        .select(
            "event_type", "day", F.coalesce("v", F.lit(0).cast("bigint")).alias("v")
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    ewma = None
    for k in range(8):
        term = F.coalesce(F.lag("v", k).over(w), F.lit(0).cast("bigint")) * (
            1 << (7 - k)
        )
        ewma = term if ewma is None else ewma + term
    return spine.select("event_type", "day", ewma.alias("ewma_scaled"))


@query(
    "session_window_native",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id))
                    >= 1800000000
                  OR LAG(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           epoch_us(MIN(ts)) AS session_start_us,
           epoch_us(MAX(ts)) + 1800000000 AS session_end_us,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window operator (the one the hand-rolled
    sessionization_gap_30m re-derives) verified against a gap-based
    oracle. Boundary semantics are the test: session_window merges
    events whose timestamp falls STRICTLY inside the previous event's
    [ts, ts+30 min) window, so a gap of exactly 30 minutes starts a NEW
    session — the oracle's new-session predicate is therefore >= (not
    >), and window.end is last-event + 30 min by definition.

    Scale: session_window is a first-class Catalyst aggregation
    (SessionWindowStateStore in streaming, a merge-on-sort aggregate in
    batch) keyed by user — parallelism grows with user cardinality;
    identical shape to the hand-rolled form but with the engine
    maintaining the merge. The same expression runs under readStream
    with a watermark (tests/test_streaming_sessions.py)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
        )
    )
