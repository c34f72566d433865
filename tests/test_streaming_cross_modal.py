"""Cross-modal rule in the streaming funnel (round-13 VERDICT #3):
the persistent media-fingerprint index (operators/multimodal) composed
into IngestFunnelSink — decisions are text-dup OR media-dup, epoch-cut
invariant under seen=probed, with the decisions-durable → extend
crash window repaired on replay."""

from __future__ import annotations

import os
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from tests.test_dedup_index import _docs, _text
from tests.test_streaming_ingest_funnel import (
    _build,
    _drop,
    CORPUS,
    EPOCH0,
    EPOCH1,
    EPOCH2,
)

from postgresql_transfer_tool_spark.operators.multimodal import (
    build_media_fp_index,
    media_fingerprints_from_docs,
    probe_media_fp,
)
from postgresql_transfer_tool_spark.streaming.ingest_funnel import (
    IngestFunnelSink,
)

MCOLS = ["doc_id", "is_novel", "is_media_novel", "is_contaminated",
         "n_tokens", "admitted"]


def _build_media(spark, prefix):
    index, gtable = _build(spark, prefix)
    mname = f"{prefix}m{uuid.uuid4().hex[:8]}"
    midx = build_media_fp_index(
        spark, _docs(spark, CORPUS), tempfile.mkdtemp(prefix=mname), mname
    )
    return index, gtable, midx


def _drop_media(spark, index, gtable, midx):
    _drop(spark, index, gtable)
    spark.sql(f"DROP TABLE IF EXISTS {midx.fp_table}")


def _mrows(sink):
    return {tuple(r) for r in sink.decisions().select(*MCOLS).collect()}


def _run_epochs(spark, tmp_path, cuts, tag):
    index, gtable, midx = _build_media(spark, f"xm{tag}")
    sink = IngestFunnelSink(
        spark, index, gtable, str(tmp_path / f"out{tag}"), media_index=midx
    )
    for k, rows in enumerate(cuts):
        sink(_docs(spark, rows), k)
    return index, gtable, midx, sink


ALL = EPOCH0 + EPOCH1 + EPOCH2


def test_media_rule_and_epoch_cut_invariance(spark, tmp_path):
    """(a) The OR rule: doc 200's media fp equals corpus doc 100's
    (identical text ⇒ identical decoded feature) so it is media-dup as
    well as text-dup; the within-epoch twin pair (202,203) resolves
    media-novelty to the lower id; 305 (≡ probed-rejected 205) is a
    media-dup of an EARLIER EPOCH'S probed doc — seen=probed on the fp
    table. (b) Cutting the same id-ordered stream 3-ways vs 1-way
    yields identical decisions — epoch-cut invariance."""
    i3, g3, m3, sink3 = _run_epochs(
        spark, tmp_path, (EPOCH0, EPOCH1, EPOCH2), "a3"
    )
    try:
        got = {r.doc_id: r for r in sink3.decisions().collect()}
        # identical text ⇒ identical media fp: dup against corpus
        assert not got[200].is_media_novel
        # within-epoch twins: lowest id wins the media rule too
        assert got[202].is_media_novel and not got[203].is_media_novel
        # media-dup of an earlier epoch's REJECTED doc (205 short/
        # contaminated class): still dup — seen = probed
        assert not got[305].is_media_novel
        assert not got[305].admitted
        # a media-novel doc with no text pair stays admitted iff the
        # other gates pass
        assert got[401].is_media_novel
        rows3 = _mrows(sink3)
    finally:
        _drop_media(spark, i3, g3, m3)

    i1, g1, m1, sink1 = _run_epochs(spark, tmp_path, (ALL,), "a1")
    try:
        assert _mrows(sink1) == rows3
    finally:
        _drop_media(spark, i1, g1, m1)


def test_media_extend_crash_is_repaired_on_replay(spark, tmp_path):
    """Crash after the decision record but before the fp-table extend:
    the replay must repair the missing fingerprints (without re-probing)
    and the NEXT epoch must see them — identical to a clean run."""
    index, gtable, midx = _build_media(spark, "xmcr")
    out = str(tmp_path / "outc")
    sink = IngestFunnelSink(spark, index, gtable, out, media_index=midx)

    import postgresql_transfer_tool_spark.streaming.ingest_funnel as ifmod

    real_extend = ifmod.extend_media_fp_index
    calls = {"n": 0}

    def crashing_extend(spark_, idx_, fps_, *a, **kw):
        calls["n"] += 1
        raise RuntimeError("crash before the media fp extend")

    ifmod.extend_media_fp_index = crashing_extend
    try:
        with pytest.raises(RuntimeError, match="crash before the media"):
            sink(_docs(spark, EPOCH0), 0)
    finally:
        ifmod.extend_media_fp_index = real_extend
    assert calls["n"] == 1
    assert 0 not in sink.ledger.committed()
    # epoch-0 fps are missing from the table; decisions are durable
    n_fp = spark.table(midx.fp_table).count()
    assert n_fp == len(CORPUS)

    # replay epoch 0 (redelivery after restart): repair, then continue
    sink(_docs(spark, EPOCH0), 0)
    assert 0 in sink.ledger.committed()
    assert spark.table(midx.fp_table).count() == len(CORPUS) + len(EPOCH0)
    sink(_docs(spark, EPOCH1), 1)
    sink(_docs(spark, EPOCH2), 2)
    got = _mrows(sink)
    _drop_media(spark, index, gtable, midx)

    # clean-run ground truth
    ic, gc, mc, sinkc = _run_epochs(
        spark, tmp_path, (EPOCH0, EPOCH1, EPOCH2), "cln"
    )
    try:
        assert _mrows(sinkc) == got
    finally:
        _drop_media(spark, ic, gc, mc)


def test_probe_media_fp_rule_directly(spark, tmp_path):
    """Unit shape: the probe's novel set is exactly {no equal-fp
    indexed doc} ∩ {no equal-fp lower-id batch doc}, and the returned
    fps cover every batch doc (the extend payload)."""
    mname = f"xmp{uuid.uuid4().hex[:8]}"
    midx = build_media_fp_index(
        spark, _docs(spark, CORPUS), tempfile.mkdtemp(prefix=mname), mname
    )
    try:
        batch = _docs(
            spark,
            [(500, _text(1)),    # fp == corpus 100 → dup
             (501, _text(77)),   # unique → novel
             (502, _text(88)), (503, _text(88)),  # twins → 502 novel
             ],
        )
        fps, novel = probe_media_fp(spark, batch, midx)
        try:
            assert {r.doc_id for r in novel.collect()} == {501, 502}
            assert {r.doc_id for r in fps.collect()} == {500, 501, 502, 503}
        finally:
            from postgresql_transfer_tool_spark.functions.memo import (
                unpersist_checkpoints,
            )

            unpersist_checkpoints(fps)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {midx.fp_table}")
