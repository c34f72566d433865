"""Three-point decade scale-up stress for the linear dedup/ANN paths
(VERDICT r3 "Next round" #4).

The sub-quadratic claims previously extrapolated from ONE decade
(sf0.01 → sf0.1). This adds a third point — a runtime-synthesized 10×
corpus built by unioning sf0.1 documents/embeddings with 9
deterministic perturbed copies — and asserts the candidate/pair growth
curve stays linear-ish across sf0.01 → sf0.1 → 10×sf0.1 for LSH,
SemDeDup, winnowing, and segment dedup, logging the skew-cap hit rates
(BUCKET_CAP, WINNOW_DF_CAP) at each point.

Perturbation design (the part that makes the assertion meaningful):
copies must NOT be near-dups of their originals, or the corpus itself
would grow quadratically-many true pairs and no engine could show
linear growth. Documents: every token gets a per-copy suffix — a
bijection on shingles, so intra-copy Jaccard structure is EXACTLY
preserved while inter-copy shingle sets are disjoint. Embeddings: a
per-copy cyclic shift of the vector — an orthogonal transform, so
intra-copy cosine structure is exactly preserved while inter-copy dots
decorrelate. 10× data therefore carries ~10× true near-dup pairs, and
a correct linear engine should produce ~10× candidates.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from postgresql_transfer_tool_spark.catalog import load_table, table_row_count

# Heavy three-point sweep (runs every family at 3 scales, the largest
# synthesized at 50k docs / 20k vectors): rides the same opt-in gate as
# the sf0.1 oracle sweep. Results are recorded in SCALE.md per round.
pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SWEEP_SF01"),
    reason="decade-scale sweep is opt-in (SPARK_GRAFT_SWEEP_SF01=1)",
)

SF_SMALL = "/root/testdata/sf0.01"
SF_MID = "/root/testdata/sf0.1"

COPIES = 10
ID_STRIDE = 10_000_000
#: output files for the synthesized corpus — map-only stages (winnowing
#: fingerprints) parallelize at split granularity, so write enough
#: files to feed every core (4 files once serialized a 32-thread stage)
N_FILES = 32


@pytest.fixture(scope="module")
def x10_dir(spark):
    out = tempfile.mkdtemp(prefix="x10_corpus_")
    docs = load_table(spark, SF_MID, "documents")
    embs = load_table(spark, SF_MID, "embeddings")
    dim = len(embs.select("embedding").first()[0])

    doc_parts = []
    emb_parts = []
    for k in range(COPIES):
        if k == 0:
            doc_parts.append(docs)
            emb_parts.append(embs)
            continue
        suffixed = F.array_join(
            F.transform(
                F.split(F.trim("text"), r"\s+"),
                lambda t: F.concat(t, F.lit(str(k))),
            ),
            " ",
        )
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + k * ID_STRIDE).alias("doc_id"),
                suffixed.alias("text"),
                "lang", "source",
                F.length(suffixed).alias("n_chars"),
            )
        )
        shifted = F.concat(
            F.slice("embedding", k + 1, dim - k), F.slice("embedding", 1, k)
        )
        emb_parts.append(
            embs.select(
                (F.col("vec_id") + k * ID_STRIDE).alias("vec_id"),
                shifted.alias("embedding"),
                "label",
            )
        )
    d = doc_parts[0]
    for p in doc_parts[1:]:
        d = d.unionByName(p)
    e = emb_parts[0]
    for p in emb_parts[1:]:
        e = e.unionByName(p)
    d.repartition(N_FILES).write.parquet(f"{out}/documents.parquet")
    e.repartition(N_FILES).write.parquet(f"{out}/embeddings.parquet")
    yield out
    shutil.rmtree(out, ignore_errors=True)


def _growth(counts, rows):
    """Per-decade growth ratios [(count_ratio, row_ratio), ...]."""
    return [
        (counts[i + 1] / max(counts[i], 1), rows[i + 1] / rows[i])
        for i in range(len(counts) - 1)
    ]


def test_x10_corpus_shape(x10_dir):
    assert table_row_count(x10_dir, "documents") == COPIES * 5000
    assert table_row_count(x10_dir, "embeddings") == COPIES * 2000


def test_lsh_candidate_growth_three_points(spark, x10_dir):
    """LSH candidate pairs across 500 → 2000 → 20000 vectors: each
    step's candidate growth must stay far under quadratic; the final
    decade (row ratio 10) must stay under 3× the row ratio."""
    from postgresql_transfer_tool_spark.operators.similarity import (
        BANDS,
        BUCKET_CAP,
        lsh_bits_for,
        lsh_candidate_pairs,
    )

    dirs = [SF_SMALL, SF_MID, x10_dir]
    rows = [table_row_count(d, "embeddings") for d in dirs]
    counts = [lsh_candidate_pairs(spark, d).count() for d in dirs]
    for (g, r), d in zip(_growth(counts, rows), dirs[1:]):
        assert g < 3 * r, (counts, rows, d)
        assert g < r * r / 2  # explicit sub-quadratic bound per step
    # cap hit rate at the 10× point: fraction of (band, sig) buckets
    # that the ROW_NUMBER cap actually truncated (logged, and must be
    # rare on the uniform fixture — the cap is a skew guard, not a
    # recall tax)
    from postgresql_transfer_tool_spark.operators.similarity import (
        _band_sigs_udf,
        _spark_quantized_materialized,
    )

    bits = lsh_bits_for(rows[-1])
    buckets = (
        _spark_quantized_materialized(spark, x10_dir)
        .select(_band_sigs_udf(bits)("qe").alias("sigs"))
        .select(F.posexplode("sigs").alias("band", "sig"))
        .groupBy("band", "sig")
        .count()
    )
    stats = buckets.agg(
        F.count("*").alias("n_buckets"),
        F.max("count").alias("max_pop"),
        F.sum((F.col("count") > BUCKET_CAP).cast("long")).alias("n_capped"),
    ).first()
    print(
        f"LSH x10: bits={bits} bands={BANDS} buckets={stats['n_buckets']} "
        f"max_pop={stats['max_pop']} capped={stats['n_capped']}"
    )
    assert stats["n_capped"] == 0  # uniform corpus: cap never binds


def test_semantic_pair_growth_three_points(spark, x10_dir):
    """SemDeDup verified pairs scale ~linearly: the corpus carries ~10×
    the true near-dup pairs per decade (perturbation preserves
    intra-copy cosine exactly), so pair growth beyond ~3× the row
    ratio would mean the within-cell pairing is going quadratic."""
    from postgresql_transfer_tool_spark.operators.semantic import (
        dedup_semantic_clusters,
    )

    dirs = [SF_SMALL, SF_MID, x10_dir]
    rows = [table_row_count(d, "embeddings") for d in dirs]
    counts = [dedup_semantic_clusters(spark, d).count() for d in dirs]
    assert counts[0] > 0, "fixture must contain semantic near-dups"
    print(f"SemDeDup pairs: {list(zip(rows, counts))}")
    for g, r in _growth(counts, rows):
        assert g < 3 * r, (counts, rows)


def test_winnowing_growth_three_points(spark, x10_dir):
    """Winnowing overlap pairs across 500 → 5000 → 50000 docs, with the
    WINNOW_DF_CAP drop rate logged at each point."""
    from postgresql_transfer_tool_spark.operators.dedup import (
        WINNOW_DF_CAP,
        dedup_winnowing_overlap,
    )
    from postgresql_transfer_tool_spark.operators.text import winnow_fps_df

    dirs = [SF_SMALL, SF_MID, x10_dir]
    rows = [table_row_count(d, "documents") for d in dirs]
    counts = [dedup_winnowing_overlap(spark, d).count() for d in dirs]
    assert counts[0] > 0
    print(f"winnowing pairs: {list(zip(rows, counts))}")
    for g, r in _growth(counts, rows):
        assert g < 3 * r, (counts, rows)
    # DF-cap hit rate at the 10× point: fraction of distinct
    # fingerprints dropped for exceeding the cap
    df_counts = (
        winnow_fps_df(spark, x10_dir)
        .select("doc_id", F.explode("fps").alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("df"))
    )
    tot, dropped = df_counts.agg(
        F.count("*"), F.sum((F.col("df") > WINNOW_DF_CAP).cast("long"))
    ).first()
    print(f"winnowing x10: fingerprints={tot} dropped_by_cap={dropped}")
    assert dropped < tot * 0.05  # cap is a guard, not a recall tax here


def test_segment_dedup_growth_three_points(spark, x10_dir):
    """Segment-dedup flagged docs stay proportional to the corpus: the
    per-copy token suffix keeps segment duplication intra-copy, so the
    flagged fraction should be roughly scale-invariant."""
    from postgresql_transfer_tool_spark.operators.semantic import text_segment_dedup

    fractions = []
    for d in [SF_SMALL, SF_MID, x10_dir]:
        res = text_segment_dedup(spark, d)
        n = res.count()
        flagged = res.filter(F.col("n_dup_segments") > 0).count()
        fractions.append(flagged / n)
    print(f"segment-dup flagged fractions: {fractions}")
    lo, hi = min(fractions), max(fractions)
    assert hi - lo < 0.25, fractions  # scale-invariant within tolerance
