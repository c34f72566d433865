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


def test_ingest_funnel_100x(spark, x100_dir):
    """The composed admission funnel's fourth scale point (VERDICT r10
    #5): 500k documents / 200k vectors — trilogy decision end-to-end,
    same invariants as the decade sweep (text candidates per batch doc
    flat, ANN candidates per vector bounded by the corpus-adaptive cell
    sizing, every batch doc decided exactly once), one decade further."""
    import tempfile
    import time
    import uuid as _uuid

    from postgresql_transfer_tool_spark.catalog import load_table
    from postgresql_transfer_tool_spark.functions.memo import (
        unpersist_checkpoints,
    )
    from postgresql_transfer_tool_spark.operators.ann_index import (
        build_ann_index,
    )
    from postgresql_transfer_tool_spark.operators.contamination_index import (
        build_contamination_index,
        check_batch_contamination,
    )
    from postgresql_transfer_tool_spark.operators.corpus import _BENCH_MOD
    from postgresql_transfer_tool_spark.operators.dedup_index import (
        BATCH_MOD,
        build_dedup_index,
        dedup_batch_against_index,
    )
    from postgresql_transfer_tool_spark.operators.ingest import (
        apply_embedding_stage,
        embedding_nn_probe,
        funnel_decisions,
    )
    from postgresql_transfer_tool_spark.operators.similarity import (
        NPROBE,
        _spark_quantized,
        top_cells_by_cosine,
    )

    docs = load_table(spark, x100_dir, "documents")
    batch = docs.filter(F.col("doc_id") % BATCH_MOD == 0)
    n_batch = batch.count()
    tag = _uuid.uuid4().hex[:8]

    index = build_dedup_index(
        spark, docs.filter(F.col("doc_id") % BATCH_MOD != 0),
        tempfile.mkdtemp(prefix=f"fnlx{tag}"), f"ddidx_fnlx{tag}",
    )
    gtable = build_contamination_index(
        spark, docs.filter(F.col("doc_id") % _BENCH_MOD == 0),
        tempfile.mkdtemp(prefix=f"fnlxg{tag}"), f"contidx_fnlx{tag}",
    )
    q = _spark_quantized(spark, x100_dir).localCheckpoint(eager=True)
    ann = build_ann_index(
        spark, q.filter(F.col("vec_id") % BATCH_MOD != 0),
        tempfile.mkdtemp(prefix=f"fnlxa{tag}"), f"annidx_fnlx{tag}",
    )

    t0 = time.perf_counter()
    res = dedup_batch_against_index(spark, batch, index)
    cont = check_batch_contamination(spark, batch, gtable)
    decisions = apply_embedding_stage(
        funnel_decisions(batch, res.novel_ids, cont),
        embedding_nn_probe(
            spark, batch.select("doc_id"), q, ann, nprobe=NPROBE
        ),
    )
    n_dec = decisions.count()
    dt = time.perf_counter() - t0
    assert n_dec == n_batch

    t_cand = (
        res.batch_bands.select("band_key", F.col("doc_id").alias("bid"))
        .join(
            spark.table(index.bands_table).select(
                "band_key", F.col("doc_id").alias("iid")
            ),
            "band_key",
        )
        .select("bid", "iid").distinct().count()
    )
    cent_rows = [
        (r.cid, r.ce, r.ncent)
        for r in spark.table(ann.centroids_table).collect()
    ]
    batch_v = q.join(
        batch.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    n_bv = batch_v.count()
    a_cand = (
        batch_v.select(
            F.col("vec_id").alias("qid"),
            F.explode(
                top_cells_by_cosine(cent_rows, NPROBE)("qe", "nq")
            ).alias("cell"),
        )
        .join(spark.table(ann.cells_table).select("vec_id", "cell"), "cell")
        .count()
    )
    print(
        f"funnel 100x: batch={n_batch} decided/s={n_batch / dt:.0f} "
        f"text_cand/doc={t_cand / max(n_batch, 1):.2f} "
        f"ann_cand/vec={a_cand / max(n_bv, 1):.1f}"
    )
    # same ceilings as the decade sweep, one decade further
    assert t_cand / max(n_batch, 1) <= 5.0
    assert a_cand / max(n_bv, 1) <= 600.0
    for h in (*res.checkpoints, cont, q):
        unpersist_checkpoints(h)
    for t in (index.bands_table, index.shingles_table, gtable,
              ann.cells_table, ann.centroids_table):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
