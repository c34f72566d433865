"""Diagnose the LSH decade-growth hot spot (VERDICT r4 directive #3).

For each scale point (sf0.01, sf0.1, synthesized 10×sf0.1) prints:
bits, bucket-population stats, pair-band incidences Σ C(pop,2) vs the
uniform-hashing expectation BANDS·n²/2^(bits+1), distinct candidate
pairs, candidates/n — and for the synthesized point, the decomposition
of candidates into intra-copy vs inter-copy pairs plus the candidate
cosine distribution. Intra-copy dominance ⇒ the superlinearity is the
corpus's true near-pair mass (LSH recall working as designed);
inter-copy dominance ⇒ a plane-family/mask interaction artifact.
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    import shutil

    from pyspark.sql import functions as F

    from postgresql_transfer_tool_spark.catalog import table_row_count
    from postgresql_transfer_tool_spark.operators.similarity import (
        BANDS,
        BUCKET_CAP,
        _band_sigs_udf,
        _spark_quantized_materialized,
        lsh_bits_for,
        lsh_candidate_pairs,
    )
    from postgresql_transfer_tool_spark.session import get_spark
    from scale_corpus import ID_STRIDE, build_scaled_corpus

    spark = get_spark("lsh-diagnose")
    x10 = tempfile.mkdtemp(prefix="x10_diag_")
    try:
        build_scaled_corpus(spark, x10, 10)
        for d in ["/root/testdata/sf0.01", "/root/testdata/sf0.1", x10]:
            n = table_row_count(d, "embeddings")
            bits = lsh_bits_for(n)
            q = _spark_quantized_materialized(spark, d)
            buckets = (
                q.select(_band_sigs_udf(bits)("qe").alias("sigs"))
                .select(F.posexplode("sigs").alias("band", "sig"))
                .groupBy("band", "sig")
                .count()
            )
            st = buckets.agg(
                F.count("*").alias("n_buckets"),
                F.max("count").alias("max_pop"),
                F.sum(F.col("count") * (F.col("count") - 1) / 2)
                .cast("long")
                .alias("incidences"),
                F.sum((F.col("count") > BUCKET_CAP).cast("long")).alias("capped"),
            ).first()
            uniform = BANDS * n * n / (2 ** (bits + 1))
            cands = lsh_candidate_pairs(spark, d)
            n_cand = cands.count()
            print(
                f"--- {d}\n"
                f"n={n} bits={bits} buckets_in_use={st['n_buckets']}"
                f"/{BANDS * (1 << bits)} max_pop={st['max_pop']} "
                f"capped={st['capped']}\n"
                f"incidences={st['incidences']} uniform_expected={uniform:.0f} "
                f"overdispersion={st['incidences'] / max(uniform, 1):.2f}\n"
                f"candidates={n_cand} candidates/n={n_cand / n:.1f}",
                flush=True,
            )
            if d == x10:
                same_copy = (
                    F.col("vec_a") / ID_STRIDE
                ).cast("long") == (F.col("vec_b") / ID_STRIDE).cast("long")
                decomp = cands.groupBy(same_copy.alias("intra_copy")).count()
                print("copy decomposition:", decomp.collect(), flush=True)
            cos_hist = (
                cands.groupBy(
                    F.floor(F.abs(F.col("cosine")) * 4).alias("abs_cos_quarter")
                )
                .count()
                .orderBy("abs_cos_quarter")
            )
            print("|cos| histogram (quarters):", cos_hist.collect(), flush=True)
    finally:
        shutil.rmtree(x10, ignore_errors=True)


if __name__ == "__main__":
    main()
