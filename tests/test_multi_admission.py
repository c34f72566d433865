"""Partitioned multi-stream admission (streaming/multi_admission.py —
VERDICT r11 #2): N concurrent streams over one shared index must merge
to the single-stream funnel's decisions bit-for-bit, survive the
per-stream crash matrix, and never starve under writer-lock
contention."""

from __future__ import annotations

import os
import uuid

import pytest

from tests.test_dedup_index import _docs
from tests.test_streaming_ingest_funnel import (
    _batch_oracle_rows,
    _build,
    _drop,
    _rows,
    DECISION_COLS,
    EPOCH0,
    EPOCH1,
    EPOCH2,
)

from postgresql_transfer_tool_spark.streaming.multi_admission import (
    PartitionedFunnelStreams,
)


def _run_partitioned(spark, tmp_path, n_streams, tag=None):
    index, gtable = _build(spark, f"pfn{n_streams}{tag or ''}")
    coord = PartitionedFunnelStreams(
        spark, index, gtable,
        str(tmp_path / f"pout{n_streams}{tag or uuid.uuid4().hex[:4]}"),
        n_streams=n_streams,
    )
    for epoch, rows in enumerate((EPOCH0, EPOCH1, EPOCH2)):
        coord(_docs(spark, rows), epoch)
    return index, gtable, coord


@pytest.mark.parametrize("n_streams", [2, 4])
def test_partitioned_streams_equal_batch_funnel(spark, tmp_path, n_streams):
    """N∈{2,4}: merged per-stream decisions over three id-ordered
    epochs == the one-shot batch funnel (the same ground truth the
    single-stream sink is pinned to), including the engineered
    seen=probed cases — a doc whose only near-dup is an earlier
    REJECTED doc is still a dup, across stream boundaries."""
    index, gtable, coord = _run_partitioned(spark, tmp_path, n_streams)
    got = _rows(coord.decisions())
    assert got == _batch_oracle_rows(spark)
    assert coord.committed() == {0, 1, 2}
    # slices are disjoint and exhaustive: one decision row per doc
    ids = [r.doc_id for r in coord.decisions().select("doc_id").collect()]
    assert len(ids) == len(set(ids)) == len(EPOCH0 + EPOCH1 + EPOCH2)
    _drop(spark, index, gtable)


def test_partitioned_crash_matrix(spark, tmp_path):
    """Per-stream replay convergence: (a) a crash after one stream's
    publish but before any decision re-runs the epoch idempotently —
    no signature duplicated, decisions equal the clean run; (b) a
    crash after one stream's record write but before its commit
    re-commits without re-probing; (c) a committed epoch redelivered
    with renumbered contents fails loudly per stream."""
    index, gtable = _build(spark, "pfcrash")
    out = str(tmp_path / "pcrash")
    coord = PartitionedFunnelStreams(spark, index, gtable, out, n_streams=2)

    # (a) publish-only for stream 0, "crash", then the full epoch
    batch0 = _docs(spark, EPOCH0).localCheckpoint(eager=True)
    from pyspark.sql import functions as F

    slice0 = batch0.filter(
        F.pmod(F.xxhash64(F.col("doc_id").cast("string")), 2) == 0
    )
    coord._publish(coord.streams[0], slice0, 0)
    n_shingle_docs = (
        spark.table(index.shingles_table).select("doc_id").distinct().count()
    )
    coord(batch0, 0)  # replay: stream 0 re-publishes nothing
    assert (
        spark.table(index.shingles_table)
        .select("doc_id").distinct().count()
        >= n_shingle_docs
    )
    # no doc's shingle rows were double-appended: per-doc h-multiset
    # stays a set (duplicates WOULD corrupt the Jaccard counts)
    dup_h = (
        spark.table(index.shingles_table)
        .groupBy("doc_id", "h").count().filter("count > 1").count()
    )
    assert dup_h == 0

    coord(_docs(spark, EPOCH1), 1)
    coord(_docs(spark, EPOCH2), 2)
    assert _rows(coord.decisions()) == _batch_oracle_rows(spark)

    # (b) lost-commit replay for one stream: decisions byte-identical
    marker = os.path.join(out, "s1", "_epochs", "epoch=1.committed")
    files = set(coord.decisions().inputFiles())
    os.remove(marker)
    coord(_docs(spark, EPOCH1), 1)
    assert os.path.exists(marker)
    assert set(coord.decisions().inputFiles()) == files
    assert _rows(coord.decisions()) == _batch_oracle_rows(spark)

    # (c) epoch-id collision: a renumbered batch on a committed epoch
    # raises instead of silently dropping
    with pytest.raises(RuntimeError, match="collision"):
        coord(_docs(spark, [(999901, "completely new renumbered doc")]), 0)
    _drop(spark, index, gtable)


def test_partitioned_contention_no_starvation(spark, tmp_path):
    """Four streams publishing under one writer lock across several
    epochs: every stream commits every epoch (the bounded-wait jittered
    retry admits each contender in turn — nobody starves, nothing
    raises ConcurrentIndexWriteError)."""
    rows = [
        [(10_000 * (k + 1) + j, f"w{k} " * 3 + f"doc {k} {j} " * 12)
         for j in range(8)]
        for k in range(4)
    ]
    index, gtable = _build(spark, "pfcont")
    coord = PartitionedFunnelStreams(
        spark, index, gtable, str(tmp_path / "pcont"), n_streams=4,
        lock_wait=120.0,
    )
    for epoch, r in enumerate(rows):
        coord(_docs(spark, r), epoch)
    assert coord.committed() == {0, 1, 2, 3}
    for s in coord.streams:
        assert s.ledger.committed() == {0, 1, 2, 3}
    # every probed doc's signatures were published exactly once
    dup_h = (
        spark.table(index.shingles_table)
        .groupBy("doc_id", "h").count().filter("count > 1").count()
    )
    assert dup_h == 0
    _drop(spark, index, gtable)
