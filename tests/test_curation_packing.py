"""Sequence-packing invariants (oracle parity lives in test_oracle_diff)."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresql_transfer_tool_spark.catalog import load_table
from postgresql_transfer_tool_spark.operators.curation import (
    PACK_TOKENS,
    sequence_packing,
)


def test_packing_conserves_tokens_and_is_contiguous(spark, sf_dir):
    packs = sequence_packing(spark, sf_dir).collect()
    toks = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").alias("total"), F.count("*").alias("n_docs"))
        .collect()
    )
    expect = {r.source: (r.total, r.n_docs) for r in toks}
    by_source: dict[str, list] = {}
    for p in packs:
        by_source.setdefault(p.source, []).append(p)
    assert set(by_source) == set(expect)
    for source, rows in by_source.items():
        total, n_docs = expect[source]
        # token conservation: every document is packed exactly once
        assert sum(r.pack_tokens for r in rows) == total
        assert sum(r.n_docs for r in rows) == n_docs
        # pack ids are dense from 0 (the cumsum can skip ids only when a
        # single doc exceeds the budget; fixture docs are ~50 tokens)
        ids = sorted(r.pack_id for r in rows)
        assert ids == list(range(len(ids)))
        # no pack is fuller than budget + one straddling document
        max_doc = PACK_TOKENS  # fixture docs are far below the budget
        assert all(r.pack_tokens <= PACK_TOKENS + max_doc for r in rows)
