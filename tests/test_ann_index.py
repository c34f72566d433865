"""Persistent IVF index (operators/ann_index.py): result-identity with
the monolithic ann_ivf_topk, incremental extend under frozen centroids,
and the probe-plan contract."""

from __future__ import annotations

import re
import tempfile
import uuid

from pyspark.sql import functions as F

from postgresql_transfer_tool_spark.operators.ann_index import (
    ann_query_index,
    build_ann_index,
    extend_ann_index,
)
from postgresql_transfer_tool_spark.operators.similarity import (
    N_QUERIES,
    _spark_quantized_materialized,
    ann_ivf_topk,
)
from postgresql_transfer_tool_spark.plans import (
    exchanges_below_first_join_above_scan,
    physical_plan,
)

SF1 = "/root/testdata/sf0.001"


def _rows(df):
    return {(r.query_id, r.rk): (r.neighbor_id, r.cell, r.cosine) for r in df.collect()}


def test_persisted_probe_equals_monolithic_and_plan_contract(spark):
    vectors = _spark_quantized_materialized(spark, SF1).select("vec_id", "qe", "nq")
    name = f"annidx_t{uuid.uuid4().hex[:8]}"
    index = build_ann_index(spark, vectors, tempfile.mkdtemp(prefix=name), name)
    try:
        probe = ann_query_index(
            spark, vectors.filter(F.col("vec_id") < N_QUERIES), index
        )
        assert _rows(probe) == _rows(ann_ivf_topk(spark, SF1))

        # probe plan: only the index tables are scanned (queries enter
        # via the quantize memo's checkpoint) and the bucketed cells
        # side reaches its first join unshuffled or broadcast whole
        plan = physical_plan(probe)
        scans = [
            ln for ln in plan.splitlines() if re.search(r"Scan parquet|FileScan", ln)
        ]
        assert scans and all(name in ln for ln in scans), scans
        counts = exchanges_below_first_join_above_scan(probe, f"{name}_cells")
        assert counts
        assert all(c == 0 for c in counts) or "BroadcastExchange" in plan, counts

        # --- incremental extend under FROZEN centroids: plant an exact
        # duplicate of query 0's vector under a fresh id — after the
        # append it must become query 0's rank-1 neighbor (cosine 1.0)
        q0 = vectors.filter(F.col("vec_id") == 0).select(
            (F.col("vec_id") + 10**9).alias("vec_id"), "qe", "nq"
        )
        extend_ann_index(spark, index, q0)
        after = ann_query_index(
            spark, vectors.filter(F.col("vec_id") < N_QUERIES), index
        )
        top1 = {r.query_id: (r.neighbor_id, r.cosine) for r in after.filter("rk = 1").collect()}
        # dot == nq exactly, but sqrt(nq)*sqrt(nq) can be 1 ulp off nq —
        # self-cosine lands within 1 ulp of 1.0, never above
        assert top1[0][0] == 10**9
        assert 1.0 - 1e-15 <= top1[0][1] <= 1.0
    finally:
        for t in (index.centroids_table, index.cells_table):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_registry_query_memoized(spark):
    from postgresql_transfer_tool_spark.operators.ann_index import (
        _ANNIDX_MEMO,
        ann_ivf_index_topk,
    )

    first = ann_ivf_index_topk(spark, SF1)
    rows = _rows(first)
    assert len({q for q, _ in rows}) == N_QUERIES
    again = ann_ivf_index_topk(spark, SF1)
    assert again is first
    assert (spark.sparkContext.applicationId, SF1) in _ANNIDX_MEMO
    assert _rows(again) == rows
