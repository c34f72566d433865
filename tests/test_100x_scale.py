"""Fourth scale point — 100×sf0.1 (VERDICT r4 "Next round" #4).

The three-point decade sweep (test_decade_scale.py) measures
sf0.01 → sf0.1 → 10×sf0.1. This pushes the cheapest linear families —
MinHash-LSH near-dup over documents, SemDeDup and hyperplane-LSH over
embeddings — one more decade, to a synthesized 100×sf0.1 corpus
(500k docs / 200k vectors, ~the largest that fits the sandbox
comfortably), converting the "survives 100×" claim from a two-decade
extrapolation into a measured three-decade curve. Synthesis rules and
their bijectivity arguments live in tests/scale_corpus.py.

Opt-in via SPARK_GRAFT_SWEEP_100X=1 (heavier than the decade sweep:
the corpus build alone writes ~100× sf0.1). Measurements are recorded
in SCALE.md per round.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from postgresql_transfer_tool_spark.catalog import table_row_count

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SWEEP_100X"),
    reason="100x sweep is opt-in (SPARK_GRAFT_SWEEP_100X=1)",
)

SF_MID = "/root/testdata/sf0.1"
COPIES = 100
N_FILES = 64


@pytest.fixture(scope="module")
def x100_dir(spark):
    from scale_corpus import build_scaled_corpus

    out = tempfile.mkdtemp(prefix="x100_corpus_")
    build_scaled_corpus(spark, out, COPIES, n_files=N_FILES)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_x100_corpus_shape(x100_dir):
    assert table_row_count(x100_dir, "documents") == COPIES * 5000
    assert table_row_count(x100_dir, "embeddings") == COPIES * 2000


def test_hyperplane_lsh_100x(spark, x100_dir):
    """200k vectors: the same invariants the decade sweep pins, one
    decade further — candidates/row under the explicit ceiling, bucket
    space in healthy use, skew cap unhit. (Three-decade curve:
    17.2 / 19.2 / 17.1 at 500 / 2k / 20k with the r5 bilinear plane
    family; this point extends it to 200k.)"""
    from postgresql_transfer_tool_spark.operators.similarity import (
        BANDS,
        BUCKET_CAP,
        _band_sigs_udf,
        _spark_quantized_materialized,
        lsh_bits_for,
        lsh_candidate_pairs,
    )

    n = table_row_count(x100_dir, "embeddings")
    n_cand = lsh_candidate_pairs(spark, x100_dir).count()
    print(f"LSH 100x: n={n} candidates={n_cand} per-row={n_cand / n:.1f}")
    assert n_cand / n <= 30, (n_cand, n)

    bits = lsh_bits_for(n)
    stats = (
        _spark_quantized_materialized(spark, x100_dir)
        .select(_band_sigs_udf(bits)("qe").alias("sigs"))
        .select(F.posexplode("sigs").alias("band", "sig"))
        .groupBy("band", "sig")
        .count()
        .agg(
            F.count("*").alias("n_buckets"),
            F.max("count").alias("max_pop"),
        )
        .first()
    )
    print(f"LSH 100x: bits={bits} buckets={stats['n_buckets']} max_pop={stats['max_pop']}")
    assert stats["n_buckets"] >= BANDS * (1 << bits) // 8, (stats, bits)
    assert stats["max_pop"] <= BUCKET_CAP


def test_semantic_dedup_100x(spark, x100_dir):
    """200k vectors: SemDeDup's engine work — within-cell candidate
    volume Σ C(pop,2) — stays ~linear per row one decade past the
    decade sweep (cells grow with the corpus, expected population per
    cell stays flat)."""
    from postgresql_transfer_tool_spark.operators.semantic import _assigned_cells

    n = table_row_count(x100_dir, "embeddings")
    _q, assigned = _assigned_cells(spark, x100_dir)
    [vol] = (
        assigned.groupBy("cluster_id")
        .count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2).cast("long"))
        .first()
    )
    print(f"SemDeDup 100x: n={n} volume={vol} per-row={vol / n:.1f}")
    assert vol / n <= 100, (vol, n)


def test_minhash_lsh_100x(spark, x100_dir):
    """500k documents through the full MinHash-LSH near-dup pipeline:

    1. engine work — band-bucket pair volume Σ C(pop,2) per document —
       stays bounded (the band join is the only super-linear hazard);
    2. verified pairs land at ~100× the sf0.1 count: per-copy character
       permutations preserve each copy's dup structure exactly and make
       cross-copy shingles distinct, so the TRUE pair count is exactly
       100× the baseline — a deviation means candidate recall loss
       (< 100×) or cross-copy aliasing (> 100×)."""
    from postgresql_transfer_tool_spark.operators.dedup import (
        dedup_minhash_lsh,
        minhash_bands,
    )

    n_docs = table_row_count(x100_dir, "documents")
    [vol] = (
        minhash_bands(spark, x100_dir)
        .groupBy("band_key")
        .count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2).cast("long"))
        .first()
    )
    print(f"MinHash 100x: docs={n_docs} band-pair volume={vol} per-doc={vol / n_docs:.1f}")
    assert vol / n_docs <= 50, (vol, n_docs)

    base_pairs = dedup_minhash_lsh(spark, SF_MID).count()
    pairs_100x = dedup_minhash_lsh(spark, x100_dir).count()
    print(f"MinHash 100x: verified pairs {base_pairs} -> {pairs_100x} "
          f"(ratio {pairs_100x / max(base_pairs, 1):.1f})")
    assert base_pairs > 0
    assert 90 * base_pairs <= pairs_100x <= 110 * base_pairs, (
        base_pairs,
        pairs_100x,
    )
