"""Adaptive per-epoch budget gate with carry-over (round-13 VERDICT
#5): cumulative-allotment semantics, replay exactness, and the
lost-state rebuild path."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from tests.test_streaming_ingest_funnel import _build, _drop

from postgresql_transfer_tool_spark.streaming.ingest_funnel import (
    IngestFunnelSink,
)

#: 12-token docs (> MIN_TOKENS=10, shingled, mutually non-dup). Source
#: "a" under-fills epoch 0 (one doc, 12 tokens < B) and floods epoch 1;
#: source "b" floods every epoch.
W = "w{0} x{0} y{0} z{0} p{0} q{0} r{0} s{0} t{0} u{0} v{0} k{0}"
B = 30  # per-epoch allotment (tokens): fits two 12-token docs, not three


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, W.format(i), src) for i, src in rows],
        "doc_id bigint, text string, source string",
    )


EPOCHS = [
    [(100, "a"), (101, "b"), (102, "b"), (103, "b"), (104, "b"), (105, "b")],
    [(200, "a"), (201, "a"), (202, "a"), (203, "a"), (204, "b")],
    [(300, "a"), (301, "b")],
]


def _expected():
    """The state machine in plain Python: taken iff prior consumption +
    within-epoch pre-budget cumsum < (epoch+1)*B."""
    taken, spent = set(), {}
    for e, rows in enumerate(EPOCHS):
        local = {}
        start = dict(spent)  # prior = consumption BEFORE this epoch
        for i, src in sorted(rows):
            cum = local.get(src, 0)  # pre-budget within-epoch cumsum
            if start.get(src, 0) + cum < (e + 1) * B:
                taken.add(i)
                spent[src] = spent.get(src, 0) + 12
            local[src] = cum + 12
    return taken


def _run(spark, out_dir, epochs, prefix):
    index, gtable = _build(spark, prefix)
    sink = IngestFunnelSink(
        spark, index, gtable, out_dir,
        source_budget=B, budget_per_epoch=True,
    )
    for e, rows in enumerate(epochs):
        sink(_docs(spark, rows), e)
    return index, gtable, sink


def _admitted(sink):
    return {
        r.doc_id
        for r in sink.decisions().filter(F.col("admitted")).collect()
    }


def test_carry_over_semantics(spark, tmp_path):
    index, gtable, sink = _run(spark, str(tmp_path / "f"), EPOCHS, "ab1")
    try:
        got = _admitted(sink)
        assert got == _expected()
        # the carry actually moved budget: source "a" spent 12 of its
        # 30-token epoch-0 allotment, so epoch 1 (cap 60) admits FOUR
        # a-docs (48 tokens) — more than a flat per-epoch gate's two
        assert {200, 201, 202, 203} <= got
        # and the gate still bites: b floods epoch 0 (5×12 tokens
        # against a 30-token cap) — first-token-lands takes the first
        # three (cum_before 0/12/24 < 30), rejects the rest
        assert {101, 102, 103} <= got
        assert not ({104, 105} & got)
    finally:
        _drop(spark, index, gtable)


def test_replay_is_bit_identical(spark, tmp_path):
    index, gtable, sink = _run(spark, str(tmp_path / "f"), EPOCHS, "ab2")
    try:
        before = {tuple(r) for r in sink.decisions().collect()}
        for e, rows in enumerate(EPOCHS):
            sink(_docs(spark, rows), e)  # full redelivery
        assert {tuple(r) for r in sink.decisions().collect()} == before
    finally:
        _drop(spark, index, gtable)


def test_lost_budget_state_rebuilds_from_decisions(spark, tmp_path):
    """Crash window: the budget state records vanish after epoch 1
    (crash between decisions write and state write, then retention
    mishap). The gate must rebuild the consumption basis from the
    decision records and epoch 2's admissions must equal the
    uninterrupted run's."""
    out = str(tmp_path / "f")
    index, gtable = _build(spark, "ab3")
    sink = IngestFunnelSink(
        spark, index, gtable, out, source_budget=B, budget_per_epoch=True
    )
    try:
        for e in (0, 1):
            sink(_docs(spark, EPOCHS[e]), e)
        shutil.rmtree(os.path.join(out, "_budget"))
        sink(_docs(spark, EPOCHS[2]), 2)
        assert _admitted(sink) == _expected()
    finally:
        _drop(spark, index, gtable)
