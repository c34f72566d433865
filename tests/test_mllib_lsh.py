"""Cross-validation of the hand-rolled LSH operators against
pyspark.ml's stock implementations (SURVEY.md §2.8 X2/X3 name
MinHashLSH / BucketedRandomProjectionLSH as the library path).

The ml variants are seeded-random, so they can't be DuckDB-oracled;
instead we check RECALL against our exact ground truths: every
high-Jaccard pair must be found by ml MinHashLSH, and BRP-LSH
approxNearestNeighbors must agree with the exact top-k on the nearest
neighbor.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

pytest.importorskip("pyspark.ml")


def test_ml_minhash_lsh_recalls_exact_jaccard_pairs(spark, sf_dir):
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    from postgresql_transfer_tool_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        _spark_shingles,
        dedup_ngram_jaccard,
    )

    sh = _spark_shingles(spark, sf_dir)
    docs = sh.groupBy("doc_id").agg(F.collect_set("s").alias("shingles"))
    cv = CountVectorizer(
        inputCol="shingles", outputCol="features", binary=True, minDF=1.0
    ).fit(docs)
    vecs = cv.transform(docs)
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = mh.fit(vecs)
    # distance threshold = 1 - jaccard
    sim = model.approxSimilarityJoin(
        vecs, vecs, 1.0 - JACCARD_THRESHOLD + 1e-9, distCol="dist"
    )
    found = {
        (min(r["datasetA"]["doc_id"], r["datasetB"]["doc_id"]),
         max(r["datasetA"]["doc_id"], r["datasetB"]["doc_id"]))
        for r in sim.collect()
        if r["datasetA"]["doc_id"] != r["datasetB"]["doc_id"]
    }
    truth = {
        (r["doc_a"], r["doc_b"]) for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    assert truth, "fixture should contain planted near-dups"
    recall = len(truth & found) / len(truth)
    assert recall >= 0.9, f"ml MinHashLSH recall {recall} over {len(truth)} pairs"


def test_ml_brp_lsh_nearest_neighbor_agrees_with_exact(spark, sf_dir):
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.linalg import Vectors, VectorUDT

    from postgresql_transfer_tool_spark.catalog import load_table
    from postgresql_transfer_tool_spark.operators.similarity import ann_bruteforce_topk

    emb = load_table(spark, sf_dir, "embeddings")
    to_vec = F.udf(lambda a: Vectors.dense(a), VectorUDT())
    vecs = emb.select("vec_id", to_vec("embedding").alias("features"))
    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0,
        numHashTables=4, seed=42,
    )
    model = brp.fit(vecs)

    # exact cosine top-1 per query (ground truth); BRP is Euclidean, so
    # compare on the *query's own* metric only loosely: the BRP top-1 by
    # Euclidean must appear in the exact cosine top-5 for most queries
    # (embeddings are not normalized, so metrics differ legitimately).
    exact_topk = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_bruteforce_topk(spark, sf_dir).collect()
    }
    queries = vecs.filter(F.col("vec_id") < 10).collect()
    hits = 0
    for q in queries:
        nn = model.approxNearestNeighbors(vecs, q["features"], 2).collect()
        nn_ids = [r["vec_id"] for r in nn if r["vec_id"] != q["vec_id"]]
        if nn_ids and (q["vec_id"], nn_ids[0]) in exact_topk:
            hits += 1
    assert hits >= len(queries) // 2, f"only {hits}/{len(queries)} BRP NNs in exact top-5"
