"""On-disk format versioning for the persistent-index family (round
11, VERDICT r10 #3): an index built by one engine round is probed by a
later one — a format/version marker turns silent schema drift into a
loud refusal at first touch.

Contract (functions/index_base.write_index_meta / check_index_format):
build/compact/retrain stamp ``_index_meta.json`` into the index root;
every probe and mutator verifies version + kind + per-table schema
before touching data; a missing meta (pre-versioning index) is
backfilled at the current version."""

from __future__ import annotations

import json
import os
import tempfile
import uuid

import pytest

from tests.test_dedup_index import WAVE0, WAVE1, _docs

from postgresql_transfer_tool_spark.functions.index_base import (
    INDEX_FORMAT_VERSION,
    IndexFormatError,
    index_root,
)
from postgresql_transfer_tool_spark.functions.memo import unpersist_checkpoints
from postgresql_transfer_tool_spark.operators.dedup_index import (
    build_dedup_index,
    compact_dedup_index,
    dedup_batch_against_index,
    delete_from_dedup_index,
    extend_dedup_index,
)


def _meta_path(spark, index) -> str:
    return os.path.join(index_root(spark, index.bands_table), "_index_meta.json")


def _drop(spark, index) -> None:
    stem = index.bands_table.rsplit("_", 1)[0]
    for t in (index.bands_table, index.shingles_table,
              f"{stem}_tombstones", f"{stem}_stamps"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_format_meta_roundtrip_and_compaction_restamp(spark):
    name = f"ddidx_f{uuid.uuid4().hex[:8]}"
    index = build_dedup_index(
        spark, _docs(spark, WAVE0), tempfile.mkdtemp(prefix=name), name
    )
    meta = json.load(open(_meta_path(spark, index)))
    assert meta["format_version"] == INDEX_FORMAT_VERSION
    assert meta["kind"] == "near_dup_lsh"
    assert meta["tables"] == {
        "bands": ["doc_id", "band_key"],
        "shingles": ["doc_id", "h"],
    }

    # probe + extend run clean under a matching meta
    res = dedup_batch_against_index(spark, _docs(spark, WAVE1), index)
    extend_dedup_index(spark, index, res)
    for d in res.checkpoints:
        unpersist_checkpoints(d)

    # compaction rewrites into a NEW root — the meta must travel with it
    compact_dedup_index(spark, index, tempfile.mkdtemp(prefix=f"{name}2"))
    meta2 = json.load(open(_meta_path(spark, index)))
    assert meta2 == meta
    _drop(spark, index)


def test_forged_version_and_drift_refused_loudly(spark):
    name = f"ddidx_g{uuid.uuid4().hex[:8]}"
    index = build_dedup_index(
        spark, _docs(spark, WAVE0), tempfile.mkdtemp(prefix=name), name
    )
    path = _meta_path(spark, index)
    good = json.load(open(path))

    # a future engine's version: probe AND mutators refuse
    json.dump({**good, "format_version": 99}, open(path, "w"))
    with pytest.raises(IndexFormatError, match="format_version"):
        dedup_batch_against_index(spark, _docs(spark, WAVE1), index)
    with pytest.raises(IndexFormatError, match="format_version"):
        delete_from_dedup_index(spark, index, _docs(spark, WAVE0).select("doc_id"))
    with pytest.raises(IndexFormatError, match="format_version"):
        compact_dedup_index(spark, index, tempfile.mkdtemp(prefix=f"{name}x"))

    # wrong kind (an index root addressed as the wrong family)
    json.dump({**good, "kind": "ann_ivf"}, open(path, "w"))
    with pytest.raises(IndexFormatError, match="addressed as"):
        dedup_batch_against_index(spark, _docs(spark, WAVE1), index)

    # schema drift within the same version
    drifted = {**good, "tables": {**good["tables"], "bands": ["doc_id", "bkey"]}}
    json.dump(drifted, open(path, "w"))
    with pytest.raises(IndexFormatError, match="drifted"):
        dedup_batch_against_index(spark, _docs(spark, WAVE1), index)

    # unreadable meta is a refusal too, not a guess
    open(path, "w").write("{not json")
    with pytest.raises(IndexFormatError, match="unreadable"):
        dedup_batch_against_index(spark, _docs(spark, WAVE1), index)

    # restore → everything works again
    json.dump(good, open(path, "w"))
    res = dedup_batch_against_index(spark, _docs(spark, WAVE1), index)
    assert res.matched.count() >= 1
    for d in res.checkpoints:
        unpersist_checkpoints(d)
    _drop(spark, index)


def test_legacy_index_backfilled_at_first_mutation_not_probe(spark, caplog):
    """An index built before versioning existed has no meta file — it
    IS the current format by definition. A PROBE stays read-only: it
    proceeds with a loud unverified warning and writes nothing (a
    mis-addressed reader must not poison the root — round-11 review);
    the first MUTATION stamps the marker under its own spec, making
    the guarantee forward-looking without a rebuild."""
    import logging

    name = f"ddidx_l{uuid.uuid4().hex[:8]}"
    index = build_dedup_index(
        spark, _docs(spark, WAVE0), tempfile.mkdtemp(prefix=name), name
    )
    path = _meta_path(spark, index)
    os.remove(path)  # simulate a pre-round-11 index

    with caplog.at_level(logging.WARNING):
        res = dedup_batch_against_index(spark, _docs(spark, WAVE1), index)
        assert res.matched.count() >= 1
    assert not os.path.exists(path)  # probes never write
    assert any("UNVERIFIED" in r.message for r in caplog.records)

    extend_dedup_index(spark, index, res)  # first mutation stamps it
    assert json.load(open(path))["format_version"] == INDEX_FORMAT_VERSION
    for d in res.checkpoints:
        unpersist_checkpoints(d)
    _drop(spark, index)


def test_ann_and_contamination_formats(spark):
    """The other two family members carry their own kind + schemas."""
    import pandas as pd

    from postgresql_transfer_tool_spark.operators.ann_index import (
        ann_query_index,
        build_ann_index,
    )
    from postgresql_transfer_tool_spark.operators.contamination_index import (
        build_contamination_index,
        check_batch_contamination,
    )
    # contamination
    cname = f"contidx_f{uuid.uuid4().hex[:8]}"
    croot = tempfile.mkdtemp(prefix=cname)
    bench = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [1, 2],
            "text": ["alpha beta gamma delta epsilon zeta", "one two three four five six"],
        })
    )
    grams = build_contamination_index(spark, bench, croot, cname)
    cmeta = json.load(open(os.path.join(croot, "_index_meta.json")))
    assert cmeta["kind"] == "contamination_grams"
    json.dump({**cmeta, "format_version": 0}, open(os.path.join(croot, "_index_meta.json"), "w"))
    with pytest.raises(IndexFormatError, match="format_version"):
        check_batch_contamination(spark, bench, grams)
    spark.sql(f"DROP TABLE IF EXISTS {grams}")
    spark.sql(f"DROP TABLE IF EXISTS {cname}_stamps")

    # ann
    aname = f"annidx_f{uuid.uuid4().hex[:8]}"
    aroot = tempfile.mkdtemp(prefix=aname)
    raw = [[i * 1000000, (i % 3) * 1000000, 1000000] for i in range(1, 21)]
    q = spark.createDataFrame(
        [(i + 1, v, sum(x * x for x in v)) for i, v in enumerate(raw)],
        "vec_id bigint, qe array<bigint>, nq bigint",
    )
    index = build_ann_index(spark, q, aroot, aname)
    ameta = json.load(open(os.path.join(aroot, "_index_meta.json")))
    assert ameta["kind"] == "ann_ivf"
    json.dump({**ameta, "format_version": 7}, open(os.path.join(aroot, "_index_meta.json"), "w"))
    with pytest.raises(IndexFormatError, match="format_version"):
        ann_query_index(spark, q.limit(2), index)
    for t in (index.cells_table, index.centroids_table, f"{aname}_stamps"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
