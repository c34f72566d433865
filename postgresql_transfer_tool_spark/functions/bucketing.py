"""Bucketed table layout — the shuffle-free co-located join strategy.

A 100 TB fact-to-fact join (orders ⋈ lineitem) cannot broadcast either
side; the default plan shuffles BOTH tables on the join key every time
the join runs. Bucketing moves that shuffle to write time, once: both
tables are hash-clustered into the same number of buckets on the join
key, and every subsequent join (or groupBy on the key) reads co-located
buckets with ZERO Exchange in the plan. This is Spark's equivalent of
the co-located hash join every MPP warehouse ships, and the single
biggest repeated-query win at scale — the shuffle is amortized across
every downstream join of the same key.

Bucket-count guidance at scale: buckets ≈ table_size / target_partition
(e.g. 100 TB / 256 MB ≈ 400k is too many files — in practice 4-32k
buckets with multiple files per bucket, sized so one bucket's rows fit
an executor's memory for the sort-merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_key: str,
    n_buckets: int,
) -> None:
    """Persist ``df`` as an external parquet table hash-bucketed (and
    within-bucket sorted) on ``bucket_key``. The sortBy matters: a
    bucketed+sorted layout lets the sort-merge join skip its sort as
    well as its shuffle."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_key)
        .sortBy(bucket_key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table_name)
    )


def write_bucketed_aligned(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_key: str,
    n_buckets: int,
) -> None:
    """:func:`write_bucketed` with the input pre-shuffled onto the
    bucket hash itself. ``repartition(n, key)`` and ``bucketBy(n,
    key)`` use the SAME partition function (murmur3 pmod n), so every
    write task holds exactly one bucket's rows → one file per bucket
    regardless of upstream parallelism. Two wins for one-time
    corpus-sized builds (round-13 VERDICT #1):

    - file count stops growing with write parallelism (the plain path
      writes tasks × buckets files — SCALE.md measured 64/bucket at
      the 1000× point; this path writes exactly ``n_buckets``);
    - the exchange is a pipeline breaker, so upstream expression
      pipelines (e.g. the shingle-array transform feeding an explode)
      are materialized into disk-backed shuffle files instead of
      needing a block-manager checkpoint — the heap-bounded build
      path's barrier.

    The pre-shuffle is correctness-neutral: bucketBy recomputes the
    bucket per row, so even a partition/bucket misalignment only costs
    extra files, never wrong bucket contents."""
    from pyspark.sql import functions as F

    (
        df.repartition(n_buckets, F.col(bucket_key))
        .write.mode("overwrite")
        .bucketBy(n_buckets, bucket_key)
        .sortBy(bucket_key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table_name)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key — compiles
    to a sort-merge join with no Exchange on either side."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key)


def index_table_name(prefix: str, app_id: str, sf_dir: str) -> str:
    """Session-unique catalog-table name stem for a persisted index:
    an md5 token over (prefix | appId | sf_dir). The prefix participates
    in the hash AND the name, so different index FAMILIES over the same
    dataset can never collide on table names."""
    import hashlib

    tok = hashlib.md5(f"{prefix}|{app_id}|{sf_dir}".encode()).hexdigest()[:10]
    return f"{prefix}_{tok}"
