"""Idempotent sink: replayed epochs must not duplicate rows."""

from __future__ import annotations

from postgresql_transfer_tool_spark.catalog import load_table
from postgresql_transfer_tool_spark.streaming.exactly_once import IdempotentParquetSink
from postgresql_transfer_tool_spark.streaming.incremental import prepare_landing


def test_streaming_foreachbatch_exactly_once(spark, sf_dir, tmp_path):
    landing = str(tmp_path / "landing")
    prepare_landing(spark, sf_dir, landing)
    sink = IdempotentParquetSink(str(tmp_path / "out"))

    schema = spark.read.parquet(landing).schema
    stream = spark.readStream.schema(schema).parquet(landing)
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(120)

    total = load_table(spark, sf_dir, "events").count()
    assert sink.read_all(spark).count() == total


def test_replayed_epoch_is_skipped(spark, sf_dir, tmp_path):
    sink = IdempotentParquetSink(str(tmp_path / "out"))
    batch = load_table(spark, sf_dir, "events").limit(100)

    sink(batch, epoch_id=0)
    n1 = sink.read_all(spark).count()
    sink(batch, epoch_id=0)  # replay of the same epoch (retry semantics)
    n2 = sink.read_all(spark).count()
    assert n1 == n2 == 100

    sink(batch, epoch_id=1)  # a new epoch does land
    assert sink.read_all(spark).count() == 200
    assert sink.ledger.committed() == {0, 1}
