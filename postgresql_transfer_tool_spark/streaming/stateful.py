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
