"""Planted-adversarial skew fixtures for the bounded-bucket guarantees.

The natural fixtures exercise the dedup/ANN cap machinery near its
design point (buckets ≈ TARGET sizes); these tests PLANT the worst case
the caps exist for and assert the structural claims in SCALE.md hold:

1. Winnowing document-frequency cap (dedup.WINNOW_DF_CAP): a corpus
   where 90% of documents share one boilerplate block would, uncapped,
   emit ~C(0.9·n, 2) candidate pairs from the boilerplate fingerprints
   alone. The cap must drop those fingerprints (df ≫ cap) so candidate
   volume stays proportional to the planted genuine near-dups — and the
   genuine near-dups (unique shared content, df = 2 ≤ cap) must ALL
   still be found (recall floor 1.0 on planted pairs, by construction).

2. LSH bucket cap (similarity.BUCKET_CAP): a hot key — one embedding
   repeated far beyond the cap — puts every copy in the same
   (band, sig) bucket in every band. The ROW_NUMBER cap must bound the
   per-bucket membership (and therefore hot-pair fan-out at
   ≤ C(cap, 2) instead of C(n_hot, 2)), while pairs in cold buckets
   are untouched (planted identical twins must still surface with
   cosine 1).

Both corpora are written as throwaway fixture dirs (documents.parquet /
embeddings.parquet with the standard schemas) so the tests drive the
REAL registered pipelines end-to-end, not test-only shims.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# winnowing: planted boilerplate corpus
# ---------------------------------------------------------------------------

N_DOCS = 200
N_PLANTED_PAIRS = 10  # genuine near-dup pairs with unique shared content

_WORDS = (
    "spark query join filter window group sort merge scan table row data "
    "stream batch key value hash index page block cache disk"
).split()


def _rand_text(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n_words))


def _unique_hex(rng: random.Random, n_chunks: int) -> str:
    """Collision-free filler: vocab words would re-create shared ≥8-char
    runs across unrelated docs (winnowing would — correctly — flag them);
    random hex makes cross-doc overlap astronomically unlikely."""
    return " ".join(f"{rng.getrandbits(64):016x}" for _ in range(n_chunks))


@pytest.fixture(scope="module")
def boilerplate_dir(spark, tmp_path_factory):
    """90% of docs share one 300-char boilerplate block + a short unique
    tail; the last 2·N_PLANTED_PAIRS docs are genuine near-dup pairs
    (long unique shared core, tiny distinct edits), no boilerplate."""
    rng = random.Random(0xB01)
    boiler = _rand_text(rng, 60)  # ≈ 300 chars after whitespace strip
    rows = []
    n_boiler = N_DOCS - 2 * N_PLANTED_PAIRS
    for i in range(n_boiler):
        text = boiler + " " + _unique_hex(rng, 2)
        rows.append((i, text, "en", "boiler", len(text)))
    for p in range(N_PLANTED_PAIRS):
        core = _unique_hex(rng, 16)  # unique per pair, shared within it
        a = core + " " + _unique_hex(rng, 1)
        b = core + " " + _unique_hex(rng, 1)
        rows.append((n_boiler + 2 * p, a, "en", "pair", len(a)))
        rows.append((n_boiler + 2 * p + 1, b, "en", "pair", len(b)))
    base = tmp_path_factory.mktemp("skew_docs")
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(base / "documents.parquet"))
    return str(base)


def test_winnowing_boilerplate_fps_dropped(spark, boilerplate_dir):
    """Post-cap, no fingerprint may appear in > WINNOW_DF_CAP docs — in
    particular the boilerplate fingerprints (df ≈ 180) must be gone."""
    from postgresql_transfer_tool_spark.operators.dedup import WINNOW_DF_CAP
    from postgresql_transfer_tool_spark.operators.text import winnow_fps_from
    from postgresql_transfer_tool_spark.catalog import load_table

    # same pre-explode lineage cut as dedup_winnowing_overlap — without it
    # CollapseProject re-evaluates the md5-heavy fps array per exploded
    # element (O(grams²) per doc; measured 300 s vs 3 s on this corpus)
    fp = (
        winnow_fps_from(load_table(spark, boilerplate_dir, "documents"))
        .select("doc_id", "fps")
        .localCheckpoint(eager=False)
        .select("doc_id", F.explode("fps").alias("fp"))
    )
    df_counts = fp.groupBy("fp").agg(F.count("*").alias("df"))
    # the attack is real: boilerplate fingerprints blow far past the cap
    assert df_counts.agg(F.max("df")).collect()[0][0] > 5 * WINNOW_DF_CAP
    kept = df_counts.filter(F.col("df") <= WINNOW_DF_CAP)
    assert kept.agg(F.max("df")).collect()[0][0] <= WINNOW_DF_CAP


def test_winnowing_boilerplate_capped_candidates_full_recall(
    spark, boilerplate_dir
):
    """End-to-end dedup_winnowing_overlap on the planted corpus: the
    boilerplate cohort must NOT pairwise-connect (uncapped it would emit
    ~C(180,2) = 16110 pairs), and every planted genuine pair must
    surface."""
    from postgresql_transfer_tool_spark.operators.dedup import (
        dedup_winnowing_overlap,
    )

    pairs = dedup_winnowing_overlap(spark, boilerplate_dir).collect()
    n_boiler = N_DOCS - 2 * N_PLANTED_PAIRS
    boiler_pairs = [
        r for r in pairs if r["doc_a"] < n_boiler and r["doc_b"] < n_boiler
    ]
    # uncapped boilerplate fan-out would be ≥ C(180,2); capped must be
    # ~zero (a stray tail-gram collision tolerance of a few rows)
    assert len(boiler_pairs) <= 5, len(boiler_pairs)
    assert len(pairs) < 100  # total volume ∝ planted dups, not corpus²
    planted = {
        (n_boiler + 2 * p, n_boiler + 2 * p + 1)
        for p in range(N_PLANTED_PAIRS)
    }
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    missing = planted - found
    assert not missing, missing  # recall 1.0 on planted pairs


# ---------------------------------------------------------------------------
# LSH: planted hot-key embedding corpus
# ---------------------------------------------------------------------------

N_HOT = 400  # copies of one embedding (≫ the patched cap)
N_COLD = 80  # random distinct vectors
N_TWIN_PAIRS = 5  # identical twins planted in the cold region
TEST_CAP = 32


@pytest.fixture(scope="module")
def hotkey_dir(spark, tmp_path_factory):
    from postgresql_transfer_tool_spark.operators.similarity import DIM

    rng = random.Random(0xA7)
    hot = [round(rng.uniform(-1, 1), 3) for _ in range(DIM)]
    rows = []
    vid = 0
    for _ in range(N_HOT):
        rows.append((vid, [float(x) for x in hot], 0))
        vid += 1
    for _ in range(N_COLD):
        rows.append(
            (vid, [round(rng.uniform(-1, 1), 3) for _ in range(DIM)], 1)
        )
        vid += 1
    for _ in range(N_TWIN_PAIRS):
        v = [round(rng.uniform(-1, 1), 3) for _ in range(DIM)]
        rows.append((vid, list(v), 2))
        rows.append((vid + 1, list(v), 2))
        vid += 2
    base = tmp_path_factory.mktemp("skew_vecs")
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.parquet(str(base / "embeddings.parquet"))
    return str(base)


def test_lsh_hot_bucket_capped_cold_pairs_survive(spark, hotkey_dir, monkeypatch):
    """With BUCKET_CAP patched to 32, the 400-copy hot bucket must emit
    at most C(32,2) = 496 hot-hot pairs (uncapped: C(400,2) = 79800),
    and the planted identical twins in cold buckets must all surface
    with cosine 1."""
    from postgresql_transfer_tool_spark.operators import similarity

    monkeypatch.setattr(similarity, "BUCKET_CAP", TEST_CAP)
    pairs = similarity.lsh_candidate_pairs(spark, hotkey_dir).collect()
    hot_pairs = [r for r in pairs if r["vec_a"] < N_HOT and r["vec_b"] < N_HOT]
    assert 0 < len(hot_pairs) <= TEST_CAP * (TEST_CAP - 1) // 2
    # the cap keeps the LOWEST vec_ids deterministically
    assert max(max(r["vec_a"], r["vec_b"]) for r in hot_pairs) < TEST_CAP
    twin_base = N_HOT + N_COLD
    twins = {
        (twin_base + 2 * p, twin_base + 2 * p + 1)
        for p in range(N_TWIN_PAIRS)
    }
    found = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in pairs
        if (r["vec_a"], r["vec_b"]) in twins
    }
    assert set(found) == twins, twins - set(found)
    for cos in found.values():
        assert cos == pytest.approx(1.0, abs=1e-12)


def test_lsh_hot_bucket_membership_bound(spark, hotkey_dir, monkeypatch):
    """The per-(band, sig) membership after capping — the quantity the
    join fan-out is quadratic in — is ≤ BUCKET_CAP even when one raw
    bucket holds 8× more rows."""
    from pyspark.sql import Window

    from postgresql_transfer_tool_spark.operators import similarity

    monkeypatch.setattr(similarity, "BUCKET_CAP", TEST_CAP)
    q = similarity._spark_quantized_materialized(spark, hotkey_dir)
    bits = similarity.lsh_bits_for(q.count())
    bucketed = q.select(
        "vec_id", similarity._band_sigs_udf(bits)("qe").alias("sigs")
    ).select("vec_id", F.posexplode("sigs").alias("band", "sig"))
    raw_max = (
        bucketed.groupBy("band", "sig").count().agg(F.max("count")).collect()[0][0]
    )
    assert raw_max >= N_HOT  # the hot key really concentrates
    cap_w = Window.partitionBy("band", "sig").orderBy("vec_id")
    capped_max = (
        bucketed.withColumn("rn", F.row_number().over(cap_w))
        .filter(F.col("rn") <= similarity.BUCKET_CAP)
        .groupBy("band", "sig")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert capped_max <= TEST_CAP
