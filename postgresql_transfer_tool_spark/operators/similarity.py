"""Similarity-search operators — X3/X6 (SURVEY.md §2.8) + driver north-star.

Approximate-nearest-neighbor over the ``embeddings`` table
(``array<float>``, 64-dim). Two paths:

- brute-force cosine top-k (the exactness baseline): query×corpus
  cross-join, JVM-side vector math via zip_with/aggregate;
- LSH-bucketed (the 100 TB path): random-hyperplane signatures from
  deterministic integer planes; candidates only join within a bucket.

Exactness strategy: embeddings are quantized to integer micro-units
(round(x·10⁶)) so dot products and norms are exact int64 arithmetic;
cosine = dot/(sqrt(na)·sqrt(nb)) is then a fixed 3-op IEEE sequence —
bit-identical on both engines, making top-k ordering deterministic
(ties broken by vec_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

DIM = 64
TOP_K = 5
N_QUERIES = 10  # vec_id < 10 serve as the query set

#: quantization: float32 → int64 micro-units. x·10⁶ is exact in double
#: (24-bit mantissa × 20 bits), and both engines round half away from
#: zero, so the quantized vectors are identical.
_QUANT_SQL = "list_transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE) * 1000000) AS BIGINT))"


def _spark_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qe = F.transform(
        "embedding", lambda v: F.round(v.cast("double") * 1000000).cast("bigint")
    )
    norm = F.aggregate(
        qe, F.lit(0).cast("bigint"), lambda acc, x: acc + x * x
    )
    return emb.select("vec_id", "label", qe.alias("qe"), norm.alias("nq"))


_SQL_QUANTIZED = f"""
q AS (
  SELECT vec_id, label, {_QUANT_SQL} AS qe,
         list_sum(list_transform({_QUANT_SQL}, x -> x * x)) AS nq
  FROM embeddings
)
"""

#: exact integer dot product between two quantized vectors a.qe / b.qe
_SQL_DOT = f"list_sum(list_transform(range({DIM}), i -> a.qe[i+1] * b.qe[i+1]))"


def _spark_dot(a_col: str, b_col: str):
    return F.aggregate(
        F.zip_with(a_col, b_col, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


@query(
    "ann_bruteforce_topk",
    oracle=f"""
    WITH {_SQL_QUANTIZED},
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, b.label AS neighbor_label,
             CAST({_SQL_DOT} AS DOUBLE)
               / (sqrt(CAST(a.nq AS DOUBLE)) * sqrt(CAST(b.nq AS DOUBLE))) AS cosine
      FROM q a JOIN q b ON a.vec_id < {N_QUERIES} AND b.vec_id <> a.vec_id
    )
    SELECT query_id, neighbor_id, neighbor_label, cosine, rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored
    ) t WHERE rk <= {TOP_K}
    """,
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: the correctness baseline every ANN variant is
    judged against. At 100 TB the corpus side stays partitioned and the
    (small) query set broadcasts — the cross product never shuffles the
    corpus; top-k folds into a per-partition window."""
    q = _spark_quantized(spark, sf_dir)
    a = q.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qe").alias("qa"),
        F.col("nq").alias("na"),
    )
    b = q.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("qe").alias("qb"),
        F.col("nq").alias("nb"),
    )
    dot = _spark_dot("qa", "qb")
    cosine = dot.cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    scored = (
        F.broadcast(a)
        .join(b, F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "neighbor_label", cosine.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= TOP_K
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH: plane[p][d] = ((p*131 + d*31) % 7) - 3 — a fixed
# integer pseudo-plane, identical on both engines. Signature bit p =
# sign(dot(qe, plane_p)); bucket = 8-bit signature. Pairs are compared
# only within a bucket (at scale: bucket is the shuffle/partition key).
# ---------------------------------------------------------------------------

N_PLANES = 8


def _plane_sql(p: int) -> str:
    return (
        f"list_sum(list_transform(range({DIM}),"
        f" d -> qe[d+1] * (((({p} * 131) + d * 31) % 7) - 3)))"
    )


def _lsh_bucket_sql() -> str:
    bits = " + ".join(
        f"(CASE WHEN {_plane_sql(p)} > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(N_PLANES)
    )
    return f"CAST({bits} AS BIGINT)"


def _spark_lsh_bucket():
    def plane_dot(p: int):
        return F.aggregate(
            F.zip_with(
                "qe",
                F.transform(
                    F.sequence(F.lit(0), F.lit(DIM - 1)),
                    lambda d: ((F.lit(p * 131) + d * 31) % 7 - 3).cast("bigint"),
                ),
                lambda x, c: x * c,
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    bucket = None
    for p in range(N_PLANES):
        term = F.when(plane_dot(p) > 0, 1 << p).otherwise(0)
        bucket = term if bucket is None else bucket + term
    return bucket.cast("bigint")


@query(
    "ann_lsh_bucketed",
    oracle=f"""
    WITH {_SQL_QUANTIZED},
    bucketed AS (
      SELECT vec_id, label, qe, nq, {_lsh_bucket_sql()} AS bucket FROM q
    ),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket,
             CAST({_SQL_DOT} AS DOUBLE)
               / (sqrt(CAST(a.nq AS DOUBLE)) * sqrt(CAST(b.nq AS DOUBLE))) AS cosine
      FROM bucketed a JOIN bucketed b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, bucket, cosine FROM pairs WHERE cosine >= 0.35
    """,
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed similarity pairs: candidates share an 8-bit
    random-hyperplane signature, then exact cosine filters ≥ 0.35.
    The bucket join replaces the O(n²) cross product — at 100 TB the
    corpus shuffles once on the bucket key."""
    q = _spark_quantized(spark, sf_dir).withColumn("bucket", _spark_lsh_bucket())
    a = q.select(
        F.col("vec_id").alias("vec_a"),
        F.col("bucket"),
        F.col("qe").alias("qa"),
        F.col("nq").alias("na"),
    )
    b = q.select(
        F.col("vec_id").alias("vec_b"),
        F.col("bucket").alias("bucket_b"),
        F.col("qe").alias("qb"),
        F.col("nq").alias("nb"),
    )
    dot = _spark_dot("qa", "qb")
    cosine = dot.cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    return (
        a.join(b, (F.col("bucket") == F.col("bucket_b")) & (F.col("vec_a") < F.col("vec_b")))
        .select("vec_a", "vec_b", "bucket", cosine.alias("cosine"))
        .filter(F.col("cosine") >= 0.35)
    )


@query(
    "knn_label_vote",
    oracle=f"""
    WITH {_SQL_QUANTIZED},
    scored AS (
      SELECT a.vec_id AS query_id, a.label AS true_label, b.label AS neighbor_label,
             ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY CAST({_SQL_DOT} AS DOUBLE)
                 / (sqrt(CAST(a.nq AS DOUBLE)) * sqrt(CAST(b.nq AS DOUBLE))) DESC,
                 b.vec_id) AS rk
      FROM q a JOIN q b ON a.vec_id < {N_QUERIES} AND b.vec_id <> a.vec_id
    )
    SELECT query_id, true_label, neighbor_label, COUNT(*) AS votes
    FROM scored WHERE rk <= {TOP_K}
    GROUP BY query_id, true_label, neighbor_label
    """,
)
def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label voting (the classification read of similarity search):
    per query, vote counts of the top-5 neighbors' labels."""
    topk = ann_bruteforce_topk(spark, sf_dir)
    labels = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return (
        topk.join(labels, "query_id")
        .groupBy("query_id", "true_label", "neighbor_label")
        .agg(F.count("*").alias("votes"))
    )
