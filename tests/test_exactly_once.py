"""Idempotent sink: replayed epochs must not duplicate rows."""

from __future__ import annotations

import os

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


def _ids(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "doc_id bigint")


def _rename_bomb(monkeypatch, predicate):
    """Make os.rename crash when predicate(src, dst) — simulating a
    process kill at an exact point inside write_epoch_record. Spark's
    own writes go through the JVM, so only the record protocol's Python
    renames are affected."""
    import os as _os

    real = _os.rename

    def boom(src, dst, *a, **k):
        if predicate(str(src), str(dst)):
            raise OSError("injected crash at rename")
        return real(src, dst, *a, **k)

    monkeypatch.setattr(_os, "rename", boom)
    return real


def test_epoch_record_overwrite_has_no_record_less_window(
    spark, tmp_path, monkeypatch
):
    """Round-9 ADVICE #2: the old rmtree-then-rename overwrite had a
    window with NO readable record, violating the sinks' nonexistence ⇒
    no-prior-progress assumption. The rename-aside write must leave
    either the old or the new record readable at every kill point."""
    from postgresql_transfer_tool_spark.streaming.exactly_once import (
        read_epoch_record,
        write_epoch_record,
    )

    import pytest

    epoch_dir = str(tmp_path / "rec" / "epoch=0")
    write_epoch_record(_ids(spark, [1, 2, 3]), epoch_dir)

    # kill BEFORE the aside rename (the old record is still live)
    _rename_bomb(monkeypatch, lambda s, d: s.rstrip("/") == epoch_dir)
    with pytest.raises(OSError, match="injected"):
        write_epoch_record(_ids(spark, [7, 8]), epoch_dir)
    got = read_epoch_record(spark, epoch_dir)
    assert {r.doc_id for r in got.collect()} == {1, 2, 3}

    # kill between the aside rename and the rename-into-place — the
    # exact window the old scheme left with NO record at all
    monkeypatch.undo()
    _rename_bomb(monkeypatch, lambda s, d: d.rstrip("/") == epoch_dir)
    with pytest.raises(OSError, match="injected"):
        write_epoch_record(_ids(spark, [7, 8]), epoch_dir)
    got = read_epoch_record(spark, epoch_dir)
    assert got is not None, "record-less window: prior progress invisible"
    assert {r.doc_id for r in got.collect()} == {1, 2, 3}

    # the retried write converges and clears every aside dir
    monkeypatch.undo()
    write_epoch_record(_ids(spark, [7, 8]), epoch_dir)
    assert {
        r.doc_id for r in read_epoch_record(spark, epoch_dir).collect()
    } == {7, 8}
    leftovers = [
        f for f in os.listdir(tmp_path / "rec") if f != "epoch=0"
    ]
    assert leftovers == []


def test_epoch_record_crash_leftovers_invisible_to_discovery(
    spark, tmp_path, monkeypatch
):
    """Round-9 ADVICE #3: the old scheme's tmp dirs lived INSIDE the
    partitioned root as 'epoch=N.tmp-<pid>', so a pre-rename crash made
    partition discovery parse the leftover as a phantom string epoch,
    duplicating rows. Scratch dirs now start with '_' (ignored by
    discovery), and the writer sweeps legacy leftovers."""
    from postgresql_transfer_tool_spark.streaming.exactly_once import (
        read_epoch_record,
        write_epoch_record,
    )

    root = str(tmp_path / "rec")
    write_epoch_record(_ids(spark, [1, 2, 3]), os.path.join(root, "epoch=0"))

    # first write of epoch 1 dies before its rename-into-place
    e1 = os.path.join(root, "epoch=1")
    _rename_bomb(monkeypatch, lambda s, d: d.rstrip("/") == e1)
    import pytest

    with pytest.raises(OSError, match="injected"):
        write_epoch_record(_ids(spark, [9]), e1)
    monkeypatch.undo()

    assert read_epoch_record(spark, e1) is None  # no progress recorded
    disc = spark.read.option("basePath", root).parquet(root)
    assert {r.doc_id for r in disc.collect()} == {1, 2, 3}
    assert dict(disc.dtypes)["epoch"] == "int"  # not a string phantom

    # a legacy 'epoch=N.tmp-<pid>' leftover is swept by the next write
    legacy = os.path.join(root, "epoch=1.tmp-12345")
    _ids(spark, [42]).write.parquet(legacy)
    write_epoch_record(_ids(spark, [9]), e1)
    assert not os.path.exists(legacy)
    disc = spark.read.option("basePath", root).parquet(root)
    assert {r.doc_id for r in disc.collect()} == {1, 2, 3, 9}
    assert dict(disc.dtypes)["epoch"] == "int"


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


def test_prune_epoch_records_retention(spark, tmp_path):
    """Retention reclaims committed records older than the cutoff,
    keeps newer and UNCOMMITTED ones (live replay state), and a pruned
    epoch's redelivery degrades to the bare ledger skip."""
    from postgresql_transfer_tool_spark.streaming.exactly_once import (
        EpochLedger,
        prune_epoch_records,
        read_epoch_record,
        write_epoch_record,
    )

    root = str(tmp_path / "rec")
    ledger = EpochLedger(str(tmp_path / "_epochs"))
    for e in range(4):
        write_epoch_record(_ids(spark, [e]), os.path.join(root, f"epoch={e}"))
        if e != 3:
            ledger.commit(e)  # epoch 3 stays uncommitted

    assert prune_epoch_records(root, ledger, before_epoch=2) == 2
    assert read_epoch_record(spark, os.path.join(root, "epoch=0")) is None
    assert read_epoch_record(spark, os.path.join(root, "epoch=1")) is None
    # newer committed + uncommitted records survive
    assert read_epoch_record(spark, os.path.join(root, "epoch=2")) is not None
    assert read_epoch_record(spark, os.path.join(root, "epoch=3")) is not None
    # ledger untouched: the pruned epochs are still exactly-once-skipped
    assert ledger.committed() == {0, 1, 2}
    # pruning is idempotent
    assert prune_epoch_records(root, ledger, before_epoch=2) == 0


def test_compaction_due_policy(spark, tmp_path):
    """compaction_due keys on files/bucket and dead-row ratio — the two
    costs the measured cadence curve shows compaction actually removes
    — and stays metadata-only when neither trips."""
    import tempfile
    import uuid

    from tests.test_dedup_index import WAVE0, WAVE1, _docs

    from postgresql_transfer_tool_spark.functions.index_base import compaction_due
    from postgresql_transfer_tool_spark.operators.dedup_index import (
        build_dedup_index,
        delete_from_dedup_index,
        N_INDEX_BUCKETS,
    )

    name = f"ddidx_cd{uuid.uuid4().hex[:8]}"
    index = build_dedup_index(
        spark, _docs(spark, WAVE0), tempfile.mkdtemp(prefix=name), name, stamp=0
    )
    fresh = compaction_due(spark, index.bands_table, N_INDEX_BUCKETS)
    assert fresh["due"] is False and fresh["dead_ratio"] == 0.0

    # retract most of the corpus: dead ratio trips
    delete_from_dedup_index(
        spark, index, _docs(spark, WAVE0[:3]).select("doc_id")
    )
    after = compaction_due(spark, index.bands_table, N_INDEX_BUCKETS)
    assert after["due"] is True
    assert any("dead ratio" in r for r in after["reasons"])

    # file-count trigger: a tiny threshold trips on any real layout
    tiny = compaction_due(
        spark, index.bands_table, N_INDEX_BUCKETS,
        max_files_per_bucket=0, max_dead_ratio=10.0,
    )
    assert tiny["due"] is True and any("files/bucket" in r for r in tiny["reasons"])
    stem = index.bands_table.rsplit("_", 1)[0]
    for t in (index.bands_table, index.shingles_table,
              f"{stem}_tombstones", f"{stem}_stamps"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
