"""Incremental sync runtime — checkpointed batch + Structured Streaming.

The reference's data model encodes flag-and-timestamp CDC
(``event-table.sql:17-18``; SURVEY.md §2.7) but its scripts brute-force
full reloads. The engine implements the protocol:

- ``CheckpointStore`` + ``run_incremental_batch``: high-water-mark
  batch sync (I2) — each run processes only rows with
  ``ts > checkpoint``, then advances the checkpoint. The predicate
  prunes parquet row groups / partitions, so cost is proportional to
  *new* data, not table size.
- ``streaming_event_counts``: the same aggregation as a Structured
  Streaming query (watermark + tumbling window), driven to completion
  in tests with a memory sink.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


class CheckpointStore:
    """Durable high-water-mark store (one JSON file; the engine analog
    of the reference's ``last_local_modified_at`` column state)."""

    def __init__(self, path: str) -> None:
        self.path = path

    def get(self, key: str) -> str | None:
        if not os.path.exists(self.path):
            return None
        with open(self.path) as f:
            return json.load(f).get(key)

    def set(self, key: str, value: str) -> None:
        state = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                state = json.load(f)
        state[key] = value
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=2, sort_keys=True)
        os.replace(tmp, self.path)  # atomic checkpoint advance


@dataclass
class IncrementalBatch:
    data: DataFrame
    prev_checkpoint: str | None
    new_checkpoint: str | None
    n_rows: int


def run_incremental_batch(
    spark: SparkSession,
    sf_dir: str,
    store: CheckpointStore,
    key: str = "events.ts",
) -> IncrementalBatch:
    """One high-water-mark sync cycle: filter above checkpoint, compute
    the new HWM from the batch itself, advance the store only after the
    consumer's write succeeds (caller invokes ``store.set`` via the
    returned checkpoint — commit-after-write ordering keeps the protocol
    at-least-once with idempotent sinks)."""
    prev = store.get(key)
    df = load_table(spark, sf_dir, "events")
    if prev is not None:
        df = df.filter(F.col("ts") > F.lit(prev).cast("timestamp"))
    row = df.agg(
        F.count("*").alias("n"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("hwm"),
    ).collect()[0]
    return IncrementalBatch(
        data=df,
        prev_checkpoint=prev,
        new_checkpoint=row["hwm"] if row["n"] else prev,
        n_rows=row["n"],
    )


def prepare_landing(spark: SparkSession, sf_dir: str, landing_dir: str) -> None:
    """Normalize the events fixture into a streaming landing directory
    (a dir of parquet files with µs timestamps — the layout a real
    ingestion job drops; the fixture is a single ns-timestamp file the
    streaming source can't consume directly)."""
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(landing_dir)


def streaming_event_counts(
    spark: SparkSession, landing_dir: str, query_name: str = "event_counts"
):
    """Structured Streaming realization of I3: parquet directory source →
    watermark → tumbling 1h window → count per event_type, memory sink.
    Returns the StreamingQuery (caller drives with processAllAvailable).

    At scale the same plan runs on a Kafka/file-drop source with
    ``outputMode("append")`` + watermark-expired windows; the memory sink
    and complete mode are the test harness configuration.
    """
    schema = spark.read.parquet(landing_dir).schema
    stream = spark.readStream.schema(schema).parquet(landing_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n")
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def flag_flip_sync(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> tuple[int, str]:
    """I1 flag protocol: select unsynced rows (flag false/absent), write
    them to the sync target, and produce the flipped-flag dataset — the
    engine's version of 'mark synced_with_posthog = TRUE after export'
    (the reference's schema implies this; its scripts never do it)."""
    e = load_table(spark, sf_dir, "events")
    synced = F.coalesce(
        F.get_json_object("props", "$.synced").cast("boolean"), F.lit(False)
    )
    unsynced = e.filter(~synced)
    out_path = os.path.join(out_dir, "synced_events.parquet")
    unsynced.write.mode("overwrite").parquet(out_path)
    n = spark.read.parquet(out_path).count()
    return n, out_path


def streaming_dedup_events(
    spark: SparkSession, landing_dir: str, query_name: str = "dedup_events"
):
    """Streaming exact deduplication: drop repeated ``event_id`` arrivals
    (at-least-once upstreams redeliver) while holding state only inside
    the watermark horizon — ``dropDuplicatesWithinWatermark`` evicts ids
    older than the 1-hour watermark, so state is bounded by the event
    rate × horizon instead of growing with the whole stream (the
    property that keeps this runnable forever at 100 TB/day; a plain
    ``dropDuplicates`` on a stream never frees its state).

    Returns the StreamingQuery; results land in a memory sink as rows of
    (event_id, event_type, value).
    """
    schema = spark.read.parquet(landing_dir).schema
    stream = spark.readStream.schema(schema).parquet(landing_dir)
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type", "value")
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def streaming_hopping_counts(
    spark: SparkSession, landing_dir: str, query_name: str = "hopping_counts"
):
    """Hopping-window variant of :func:`streaming_event_counts`: 1-hour
    windows sliding every 15 minutes (each event lands in 4 windows).
    Identical plan to the batch ``event_time_hopping_window`` operator —
    the slide parameter of ``F.window`` is streaming-native, and the 4×
    row amplification collapses in the partial aggregate exactly as in
    batch."""
    schema = spark.read.parquet(landing_dir).schema
    stream = spark.readStream.schema(schema).parquet(landing_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
