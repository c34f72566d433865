"""Incremental-sync runtime tests: checkpoint batch cycles + Structured
Streaming window aggregation (SURVEY.md §2.7)."""

from __future__ import annotations

from postgresql_transfer_tool_spark.catalog import load_table
from postgresql_transfer_tool_spark.streaming.incremental import (
    CheckpointStore,
    flag_flip_sync,
    prepare_landing,
    run_incremental_batch,
    streaming_dedup_events,
    streaming_event_counts,
)


def test_incremental_batch_cycles(spark, sf_dir, tmp_path):
    store = CheckpointStore(str(tmp_path / "state.json"))
    total = load_table(spark, sf_dir, "events").count()

    # cycle 1: no checkpoint → full table
    b1 = run_incremental_batch(spark, sf_dir, store)
    assert b1.prev_checkpoint is None
    assert b1.n_rows == total
    store.set("events.ts", b1.new_checkpoint)

    # cycle 2: checkpoint at max(ts) → nothing new
    b2 = run_incremental_batch(spark, sf_dir, store)
    assert b2.prev_checkpoint == b1.new_checkpoint
    assert b2.n_rows == 0
    assert b2.new_checkpoint == b1.new_checkpoint  # HWM stable on empty batch


def test_incremental_batch_partial(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    store = CheckpointStore(str(tmp_path / "state.json"))
    store.set("events.ts", "2024-01-15 00:00:00.000000")
    b = run_incremental_batch(spark, sf_dir, store)
    expected = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts") > F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .count()
    )
    assert b.n_rows == expected > 0


def test_checkpoint_store_atomic_roundtrip(tmp_path):
    store = CheckpointStore(str(tmp_path / "state.json"))
    assert store.get("k") is None
    store.set("k", "v1")
    store.set("k2", "v2")
    assert store.get("k") == "v1" and store.get("k2") == "v2"
    store.set("k", "v3")  # overwrite keeps other keys
    assert store.get("k") == "v3" and store.get("k2") == "v2"


def test_streaming_window_counts_match_batch(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    landing = str(tmp_path / "landing")
    prepare_landing(spark, sf_dir, landing)
    q = streaming_event_counts(spark, landing, "t_stream_counts")
    try:
        q.processAllAvailable()
        streamed = {
            (r["window_start"], r["event_type"]): r["n"]
            for r in spark.sql("SELECT * FROM t_stream_counts").collect()
        }
    finally:
        q.stop()
    batch = {
        (r["ws"], r["event_type"]): r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("ws"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert streamed == batch


def test_flag_flip_sync(spark, sf_dir, tmp_path):
    n, path = flag_flip_sync(spark, sf_dir, str(tmp_path))
    # fixture props have no 'synced' key → everything is unsynced
    assert n == load_table(spark, sf_dir, "events").count()
    assert spark.read.parquet(path).count() == n


def test_streaming_session_window(spark, sf_dir, tmp_path):
    """I3 session windows in Structured Streaming: 30-min-gap session
    counts must match the batch sessionization for a stable subset."""
    from pyspark.sql import functions as F

    landing = str(tmp_path / "landing_sw")
    prepare_landing(spark, sf_dir, landing)
    schema = spark.read.parquet(landing).schema
    stream = spark.readStream.schema(schema).parquet(landing)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("session_window.start").alias("s"), "n")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_session_win")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r["user_id"], r["s"]): r["n"]
            for r in spark.sql("SELECT * FROM t_session_win").collect()
        }
    finally:
        q.stop()
    # batch ground truth via the same session_window function
    batch = {
        (r["user_id"], r["s"]): r["n"]
        for r in spark.read.parquet(landing)
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("session_window.start").alias("s"), "n")
        .collect()
    }
    assert streamed == batch


def test_streaming_dedup_drops_redelivered_events(spark, sf_dir, tmp_path):
    """At-least-once redelivery: the landing dir holds every event twice;
    the watermarked streaming dedup must emit each event_id exactly once
    and agree with the batch distinct count."""
    landing = str(tmp_path / "landing_dup")
    prepare_landing(spark, sf_dir, landing)
    # redeliver the whole stream a second time before the query starts
    spark.read.parquet(landing).write.mode("append").parquet(landing)

    n_distinct = load_table(spark, sf_dir, "events").count()
    assert spark.read.parquet(landing).count() == 2 * n_distinct

    q = streaming_dedup_events(spark, landing, "t_dedup_events")
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT event_id FROM t_dedup_events").collect()
    finally:
        q.stop()
    ids = [r["event_id"] for r in rows]
    assert len(ids) == n_distinct
    assert len(set(ids)) == n_distinct


def test_streaming_hopping_window_matches_batch(spark, sf_dir, tmp_path):
    """The hopping (1h/15min) streaming aggregation converges to the
    batch event_time_hopping_window counts (restricted to the same
    no-filter window set)."""
    from pyspark.sql import functions as F

    from postgresql_transfer_tool_spark.streaming.incremental import (
        streaming_hopping_counts,
    )

    landing = str(tmp_path / "landing_hop")
    prepare_landing(spark, sf_dir, landing)
    q = streaming_hopping_counts(spark, landing, "t_stream_hop")
    try:
        q.processAllAvailable()
        streamed = {
            r["window_start"]: r["n_events"]
            for r in spark.sql("SELECT * FROM t_stream_hop").collect()
        }
    finally:
        q.stop()
    batch = {
        r["ws"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
        .collect()
    }
    assert streamed == batch


def test_gap_fill_semantics(spark, sf_dir):
    """Forward-fill invariants: observed rows pass through unfilled,
    filled rows carry the latest earlier observation, and days before a
    series' first observation stay NULL."""
    from postgresql_transfer_tool_spark.operators.incremental import timeseries_gap_fill

    rows = sorted(
        timeseries_gap_fill(spark, sf_dir).collect(),
        key=lambda r: (r["event_type"], r["day"]),
    )
    assert rows
    last_seen = {}
    saw_gap = False
    for r in rows:
        k = r["event_type"]
        if r["daily_sum"] is not None:
            assert r["filled_sum"] == r["daily_sum"]
            assert not r["is_filled"]
            last_seen[k] = r["daily_sum"]
        elif k in last_seen:
            assert r["is_filled"] and r["filled_sum"] == last_seen[k], r
            saw_gap = True
        else:
            assert r["filled_sum"] is None and not r["is_filled"], r
    assert saw_gap  # the fixture threshold must actually produce gaps
