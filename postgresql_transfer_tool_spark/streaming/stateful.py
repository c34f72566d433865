"""Custom stateful streaming operator via applyInPandasWithState.

The engine's demonstration that arbitrary per-key running state (the
kind PostgreSQL users build with triggers/matviews over the reference's
event table) runs as a first-class streaming operator: a per-user
activity tracker maintaining (event_count, total_value, last_seen)
across micro-batches.

At scale: state is partitioned by user_id across executors (RocksDB/HDFS
state store in production configs); each micro-batch touches only the
keys present in that batch.

(Spark 4's successor API, ``transformWithStateInPandas`` /
``StatefulProcessor`` with typed ValueState, expresses the same operator;
its Python driver worker needs a working ``google.protobuf`` install,
which this container lacks, so the engine standardizes on
``applyInPandasWithState`` — the dataflow and state partitioning are
identical.)
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_count", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("event_count", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)


def track_user_activity(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one user into running state and
    emit the updated snapshot."""
    count, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        count += len(pdf)
        total += float(pdf["value"].sum())
        batch_max_us = int(pdf["ts"].astype("int64").max()) // 1000
        last_us = max(last_us, batch_max_us)
    state.update((count, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_count": [count],
            "total_value": [total],
            "last_seen": [pd.Timestamp(last_us * 1000)],
        }
    )


def streaming_user_activity(
    spark: SparkSession, landing_dir: str, query_name: str = "user_activity"
):
    """readStream(parquet) → groupBy(user_id) → applyInPandasWithState →
    memory sink. Returns the StreamingQuery."""
    schema = spark.read.parquet(landing_dir).schema
    stream = spark.readStream.schema(schema).parquet(landing_dir)
    tracked = (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            track_user_activity,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return (
        tracked.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def batch_user_activity(spark: SparkSession, landing_dir: str) -> DataFrame:
    """The batch ground truth the streaming state must converge to."""
    return (
        spark.read.parquet(landing_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("event_count"),
            F.sum("value").alias("total_value"),
            F.max("ts").alias("last_seen"),
        )
    )


# ---------------------------------------------------------------------------
# Burst-anchor debounce: the stateful sibling of the batch lag-gap form
# (operators/incremental.events_debounce_gap). The lag-gap form keeps an
# event when its gap to the PREVIOUS event clears the threshold; the
# burst-anchor form keeps it when the gap to the last KEPT event does —
# a long burst of sub-gap arrivals collapses to exactly its first event
# instead of re-arming every time two bounces are slightly apart. That
# needs running state (last kept timestamp per key), which is exactly
# what applyInPandasWithState provides. Cross-micro-batch correctness
# assumes per-key event-time-ordered arrival (time-partitioned landing
# files — the standard CDC layout; late data would need a watermark +
# reorder buffer upstream).
# ---------------------------------------------------------------------------

DEBOUNCE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

DEBOUNCE_STATE_SCHEMA = T.StructType(
    [T.StructField("last_kept_us", T.LongType())]
)


def debounce_group(
    gap_us: int,
) -> Any:
    """Per-(user, event_type) debounce fold with burst-anchor state."""

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (last_us,) = state.get if state.exists else (None,)
        kept_rows = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        for _, row in batch.iterrows():
            t_us = int(pd.Timestamp(row["ts"]).value) // 1000
            if last_us is None or t_us - last_us >= gap_us:
                kept_rows.append(
                    (key[0], key[1], int(row["event_id"]), row["ts"])
                )
                last_us = t_us
        if last_us is not None:
            state.update((last_us,))
        yield pd.DataFrame(
            kept_rows, columns=["user_id", "event_type", "event_id", "ts"]
        )

    return fn


def streaming_debounce(
    spark: SparkSession,
    landing_dir: str,
    gap_us: int,
    query_name: str = "debounce",
    max_files_per_trigger: int | None = None,
):
    """readStream(parquet) → groupBy(user_id, event_type) →
    applyInPandasWithState(burst-anchor debounce) → memory sink."""
    schema = spark.read.parquet(landing_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(landing_dir)
    kept = (
        stream.select("user_id", "event_type", "event_id", "ts")
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            debounce_group(gap_us),
            outputStructType=DEBOUNCE_OUT_SCHEMA,
            stateStructType=DEBOUNCE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return (
        kept.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def batch_debounce_anchor(
    spark: SparkSession, landing_dir: str, gap_us: int
) -> DataFrame:
    """Burst-anchor ground truth, computed in one batch pass with the
    SAME fold (applyInPandas, no state carry needed — the whole series
    is in one group)."""
    df = spark.read.parquet(landing_dir).select(
        "user_id", "event_type", "event_id", "ts"
    )

    fold = debounce_group(gap_us)

    def whole_series(pdf: pd.DataFrame) -> pd.DataFrame:
        class _NoState:
            exists = False
            get = (None,)

            def update(self, v):  # noqa: D401 - duck-typed GroupState
                pass

        key = (pdf["user_id"].iloc[0], pdf["event_type"].iloc[0])
        return pd.concat(list(fold(key, iter([pdf]), _NoState())))

    return df.groupBy("user_id", "event_type").applyInPandas(
        whole_series, schema=DEBOUNCE_OUT_SCHEMA
    )
