"""Stream-stream join ≡ batch join on fully-arrived input."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresql_transfer_tool_spark.streaming.incremental import prepare_landing
from postgresql_transfer_tool_spark.streaming.joins import (
    purchase_error_attribution,
)


def _split(df):
    purchases = df.filter(F.col("event_type") == "purchase")
    errors = df.filter(F.col("event_type") == "error")
    return purchases, errors


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    landing = str(tmp_path / "landing_ssj")
    prepare_landing(spark, sf_dir, landing)
    schema = spark.read.parquet(landing).schema

    stream = spark.readStream.schema(schema).parquet(landing)
    joined = purchase_error_attribution(*_split(stream))
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_ssj")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r["p_event_id"], r["e_event_id"])
            for r in spark.sql("SELECT * FROM t_ssj").collect()
        }
    finally:
        q.stop()

    batch = purchase_error_attribution(*_split(spark.read.parquet(landing)))
    expected = {
        (r["p_event_id"], r["e_event_id"]) for r in batch.collect()
    }
    assert streamed == expected
    assert expected, "fixture produced no purchase/error pairs — vacuous test"


def test_streaming_join_plan_is_stateful(spark, sf_dir, tmp_path):
    """The streaming join must compile to the stateful symmetric-hash
    join operator (bounded state), not fall back to anything unbounded."""
    landing = str(tmp_path / "landing_ssj2")
    prepare_landing(spark, sf_dir, landing)
    schema = spark.read.parquet(landing).schema
    stream = spark.readStream.schema(schema).parquet(landing)
    joined = purchase_error_attribution(*_split(stream))
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_ssj_plan")
        .start()
    )
    try:
        q.processAllAvailable()
        # state operator presence is visible in the query progress
        ops = q.lastProgress.get("stateOperators", [])
        assert any(
            "symmetricHashJoin" in (op.get("operatorName") or "")
            for op in ops
        ), ops
    finally:
        q.stop()
