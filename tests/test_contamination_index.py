"""Persistent decontamination index (operators/contamination_index.py):
result-identity with the monolithic operator and the probe-plan
contract (benchmark corpus never rescanned)."""

from __future__ import annotations

import re
import tempfile
import uuid

from pyspark.sql import functions as F

from postgresql_transfer_tool_spark.catalog import load_table
from postgresql_transfer_tool_spark.operators.contamination_index import (
    build_contamination_index,
    check_batch_contamination,
)
from postgresql_transfer_tool_spark.operators.corpus import (
    _BENCH_MOD,
    contamination_ngram_overlap,
)
from postgresql_transfer_tool_spark.plans import (
    exchanges_below_first_join_above_scan,
    physical_plan,
)

SF1 = "/root/testdata/sf0.001"


def _rows(df):
    return {
        r.doc_id: (r.n_grams, r.n_shared, r.is_contaminated) for r in df.collect()
    }


def test_index_probe_equals_monolithic_and_never_rescans_benchmark(spark):
    docs = load_table(spark, SF1, "documents")
    name = f"contidx_t{uuid.uuid4().hex[:8]}"
    table = build_contamination_index(
        spark,
        docs.filter(F.col("doc_id") % _BENCH_MOD == 0),
        tempfile.mkdtemp(prefix=name),
        name,
    )
    try:
        probe = check_batch_contamination(
            spark, docs.filter(F.col("doc_id") % _BENCH_MOD != 0), table
        )
        assert _rows(probe) == _rows(contamination_ngram_overlap(spark, SF1))

        # probe-plan contract: the only parquet scan is the gram index —
        # the benchmark corpus is never re-tokenized or rescanned (the
        # batch side enters through its pre-explode checkpoint)
        plan = physical_plan(probe)
        scans = [
            ln
            for ln in plan.splitlines()
            if re.search(r"Scan parquet|FileScan", ln)
        ]
        assert scans and all(name in ln for ln in scans), scans
        # the bucketed index side is either unshuffled into a sort-merge
        # join or broadcast whole — both leave the batch side paying
        # every data exchange
        counts = exchanges_below_first_join_above_scan(probe, f"{name}_grams")
        assert counts
        assert all(c == 0 for c in counts) or "BroadcastExchange" in plan, (
            counts,
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_registry_query_memoized(spark):
    from postgresql_transfer_tool_spark.operators.contamination_index import (
        _CONTIDX_MEMO,
        contamination_incremental_index,
    )

    first = contamination_incremental_index(spark, SF1)
    rows = _rows(first)
    assert rows  # non-empty at sf0.001
    again = contamination_incremental_index(spark, SF1)
    assert again is first
    assert (spark.sparkContext.applicationId, SF1) in _CONTIDX_MEMO
    assert _rows(again) == rows
