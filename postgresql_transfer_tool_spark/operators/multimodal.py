"""Multimodal-column operators — X6 (SURVEY.md §2.8).

Images/audio/video are opaque ``binary`` columns with typed metadata
(the lakehouse-standard encoding). The fixtures carry no real media, so:

- the *Spark-side plumbing* is real and oracle-checked: binary encode /
  length / content-hash / hex-prefix over text-derived blobs, and the
  embedding column as the already-multimodal ``array<float>`` case;
- the *decode* step (pixels/samples) is a clearly-marked stub behind
  ``mapInPandas`` with a real schema, partitioning and Arrow batch shape
  — exercised in tests/test_multimodal.py; swapping the fake for
  Pillow/librosa is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from .registry import query


@query(
    "binary_column_plumbing",
    oracle="""
    SELECT source,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           COUNT(DISTINCT md5(text)) AS n_distinct_blobs,
           MIN(substr(hex(encode(substr(text, 1, 4))), 1, 8)) AS min_hex_prefix
    FROM documents GROUP BY source
    """,
)
def binary_column_plumbing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BinaryType column handling end-to-end: encode → byte length →
    content hash → hex. This is the metadata path a 100 TB media table
    runs on (the blob bytes themselves never leave the scan unless a
    decode stage asks for them)."""
    docs = load_table(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    return docs.groupBy("source").agg(
        F.sum(F.octet_length(blob)).alias("total_bytes"),
        F.countDistinct(F.md5("text")).alias("n_distinct_blobs"),
        F.min(F.substring(F.hex(F.encode(F.substring("text", 1, 4), "UTF-8")), 1, 8)).alias(
            "min_hex_prefix"
        ),
    )


@query(
    "embedding_column_stats",
    oracle="""
    SELECT label,
           COUNT(*) AS n_vectors,
           MIN(len(embedding)) AS min_dim,
           MAX(len(embedding)) AS max_dim,
           CAST(SUM(len(list_filter(embedding, v -> v > 0))) AS BIGINT) AS n_positive
    FROM embeddings GROUP BY label
    """,
)
def embedding_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ArrayType(FloatType) hygiene stats — dimension consistency and
    sign distribution per label; the schema-validation pass a vector
    pipeline runs before indexing."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.min(F.size("embedding")).alias("min_dim"),
        F.max(F.size("embedding")).alias("max_dim"),
        F.sum(F.size(F.filter("embedding", lambda v: v > 0))).alias("n_positive"),
    )


# ---------------------------------------------------------------------------
# Decode stage: mapInPandas with a STUBBED decoder. The Spark-side
# contract (schema, Arrow batches, partition-parallel) is real.
# ---------------------------------------------------------------------------

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(blob: bytes) -> tuple[int, int, list[float]]:
    """STUB image decoder (media libraries aren't in this container).

    Deterministic fake: derives a "resolution" and a 4-dim "feature"
    from the blob bytes. Replace with PIL.Image.open(io.BytesIO(blob))
    + a real feature extractor; the Spark plumbing does not change.
    """
    n = len(blob)
    width, height = 16 + n % 64, 16 + (n // 64) % 64
    checksum = sum(blob[:32])
    feature = [float(n), float(checksum % 251), float(width), float(height)]
    return width, height, feature


def decode_media_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched decode: one pandas DataFrame per batch, vectorized
    per partition — the shape a real image/audio decode runs in."""
    for pdf in it:
        widths, heights, feats = [], [], []
        for blob in pdf["blob"]:
            w, h, f = _fake_decode(bytes(blob))
            widths.append(w)
            heights.append(h)
            feats.append(f)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(bytes(b)) for b in pdf["blob"]],
                "width": pd.array(widths, dtype="int32"),
                "height": pd.array(heights, dtype="int32"),
                "feature": feats,
            }
        )


def media_decode_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text → binary blob → mapInPandas decode → typed metadata
    + feature vector. Tested in tests/test_multimodal.py (not in the
    oracle set: mapInPandas is non-SQL-expressible by design)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        F.encode("text", "UTF-8").alias("blob"),
    )
    return docs.mapInPandas(decode_media_batches, DECODE_SCHEMA)


@query("media_decode_features")  # rows-only: mapInPandas, non-SQL-expressible
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregated view of the stubbed decode stage (deterministic, so the
    rows-only check is stable across runs)."""
    decoded = media_decode_pipeline(spark, sf_dir)
    return decoded.groupBy("media_type").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("width").alias("min_width"),
        F.max("height").alias("max_height"),
    )
