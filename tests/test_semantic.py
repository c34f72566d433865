"""Semantic-cluster dedup and segment dedup — behavioral guarantees.

The oracle-parity gate lives in test_oracle_diff.py; these tests pin the
properties parity can't see: precision/recall of the cell-partitioned
candidate generation vs the exact all-pairs baseline, and segment-dedup
fraction semantics over the planted near-duplicate documents.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresql_transfer_tool_spark.operators.dedup import dedup_embedding_cosine
from postgresql_transfer_tool_spark.operators.semantic import (
    SEG_WORDS,
    dedup_semantic_clusters,
    text_segment_dedup,
)


def test_semantic_pairs_subset_of_exact_with_bounded_recall(spark, sf_dir):
    # Every emitted pair is exact-verified, so precision is 1.0 by
    # construction (subset of the all-pairs baseline); multi-probe cell
    # assignment must keep recall usable even on borderline-cosine pairs.
    exact = {(r.doc_a, r.doc_b) for r in dedup_embedding_cosine(spark, sf_dir).collect()}
    sem = {
        (r.doc_a, r.doc_b)
        for r in dedup_semantic_clusters(spark, sf_dir).select("doc_a", "doc_b").collect()
    }
    assert sem <= exact, f"false positives: {sorted(sem - exact)[:5]}"
    assert exact, "fixture should contain near-dup embedding pairs"
    recall = len(sem & exact) / len(exact)
    assert recall >= 0.5, f"recall {recall:.2f} below bound (found {len(sem)}/{len(exact)})"


def test_segment_dedup_fraction_semantics(spark, sf_dir):
    res = text_segment_dedup(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert len(res) == docs.count(), "one row per document"
    for r in res:
        assert r.n_segments >= 1
        assert 0 <= r.n_dup_segments <= r.n_segments
        assert abs(r.dup_frac - r.n_dup_segments / r.n_segments) < 1e-12
    # the fixture plants near-duplicate documents (TESTDATA.md), which
    # share 10-word chunks verbatim — segment dedup must surface them
    assert any(r.n_dup_segments > 0 for r in res)


def test_segment_count_matches_token_count(spark, sf_dir):
    # n_segments must equal ceil(tokens / SEG_WORDS) for every document
    res = {r.doc_id: r.n_segments for r in text_segment_dedup(spark, sf_dir).collect()}
    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
        .collect()
    )
    for r in toks:
        expect = (r.n + SEG_WORDS - 1) // SEG_WORDS
        assert res[r.doc_id] == expect, (r.doc_id, res[r.doc_id], expect)


def test_segment_dedup_property_vs_python_reference(spark):
    """Engine vs pure-Python reference over adversarial synthetic docs:
    repeated chunks, odd whitespace, sub-SEG_WORDS tails, identical
    documents. Guards the tokenize/segment/hash pipeline's edge behavior
    beyond what the fixture corpus exercises."""
    import hashlib
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    words = st.sampled_from(["a", "bb", "ccc", "dd", "e"])
    docs_strategy = st.lists(
        st.lists(words, min_size=1, max_size=35).map(lambda ws: " ".join(ws)),
        min_size=1,
        max_size=12,
    )

    def reference(texts):
        segs_per_doc = {}
        counts = Counter()
        for i, t in enumerate(texts):
            toks = t.strip().split()
            segs = [
                hashlib.md5(
                    " ".join(toks[j : j + SEG_WORDS]).encode()
                ).hexdigest()
                for j in range(0, len(toks), SEG_WORDS)
            ]
            segs_per_doc[i] = segs
            counts.update(segs)
        out = {}
        for i, segs in segs_per_doc.items():
            dup = sum(1 for h in segs if counts[h] > 1)
            out[i] = (len(segs), dup)
        return out

    @settings(max_examples=15, deadline=None)
    @given(docs_strategy)
    def check(texts):
        df = spark.createDataFrame(
            [(i, t, "en", "syn", len(t)) for i, t in enumerate(texts)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            df.coalesce(1).write.parquet(f"{d}/documents.parquet")
            got = {
                r.doc_id: (r.n_segments, r.n_dup_segments)
                for r in text_segment_dedup(spark, d).collect()
            }
        assert got == reference(texts)

    check()


def test_kmeans_refine_reduces_inertia(spark, sf_dir):
    """Lloyd guarantee: one refinement iteration must not increase the
    total within-cell squared distance (floor-rounded centroids can in
    principle nudge it, so assert <= with the exact integer sums)."""
    from pyspark.sql import functions as F

    from postgresql_transfer_tool_spark.operators.semantic import (
        ivf_kmeans_refine,
    )
    from postgresql_transfer_tool_spark.operators.similarity import (
        _spark_quantized_materialized,
        ivf_cells_for,
    )
    from postgresql_transfer_tool_spark.catalog import table_row_count

    q = _spark_quantized_materialized(spark, sf_dir).select("vec_id", "qe")
    nc = ivf_cells_for(table_row_count(sf_dir, "embeddings"))
    cent0 = q.filter(F.col("vec_id") < nc).select(
        F.col("vec_id").alias("cid"), F.col("qe").alias("ce")
    )
    d2 = F.aggregate(
        F.zip_with("qe", "ce", lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    [init_inertia] = (
        q.crossJoin(F.broadcast(cent0))
        .select("vec_id", F.struct(d2.alias("d2"), F.col("cid")).alias("s"))
        .groupBy("vec_id")
        .agg(F.min("s").alias("best"))
        .agg(F.sum("best.d2").cast("bigint"))
        .first()
    )
    [refined_inertia] = (
        ivf_kmeans_refine(spark, sf_dir)
        .agg(F.sum("inertia").cast("bigint"))
        .first()
    )
    assert refined_inertia <= init_inertia, (init_inertia, refined_inertia)
    assert refined_inertia > 0
