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


def test_read_all_before_first_commit(spark, tmp_path):
    import pytest

    sink = IdempotentParquetSink(str(tmp_path / "out"))
    with pytest.raises(ValueError, match="no committed epochs"):
        sink.read_all(spark)
    empty = sink.read_all(spark, schema="event_id long, value double")
    assert empty.count() == 0 and empty.columns == ["event_id", "value"]


def test_two_ledger_writers_do_not_lose_epochs(tmp_path):
    """The shared-JSON-list failure mode: writer A reads {}, writer B
    commits 7, writer A commits 3 and (with a list rewrite) would erase
    7. Per-epoch marker files must keep both."""
    from postgresql_transfer_tool_spark.streaming.exactly_once import EpochLedger

    path = str(tmp_path / "ledger")
    a, b = EpochLedger(path), EpochLedger(path)
    assert a.committed() == set()  # A snapshots the empty state
    b.commit(7)
    a.commit(3)  # A commits without re-reading — must not clobber 7
    assert a.committed() == b.committed() == {3, 7}
