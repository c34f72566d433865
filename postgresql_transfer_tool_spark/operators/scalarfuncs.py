"""Scalar function surface: JSON, string, date/time, conditional.

The reference's motivating workload carries JSONB columns
(``event-table.sql:15-16``) and the README claims "JSON conversion"
sanitization (SURVEY.md §2.9); the engine realizes that as JVM-side JSON
path extraction (``get_json_object`` / ``from_json``) — never Python.
String/date/conditional functions are the ANSI scalar surface the
reference delegates to PostgreSQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..functions.exact import davg
from .registry import query


@query(
    "json_extract_events",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY 1
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONB carrier → typed extraction (SURVEY.md §1.3): the JSON stays a
    string column on disk; ``get_json_object`` runs in codegen."""
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        load_table(spark, sf_dir, "events")
        .groupBy((k % 10).alias("k_bucket"))
        .agg(F.count("*").alias("n"), F.max(k).alias("max_k"))
    )


@query(
    "json_schema_promotion",
    oracle="""
    SELECT CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS total_k,
           COUNT(*) AS n_parsed
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
)
def json_schema_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONB → StructType promotion via from_json with an explicit schema
    (the engine's "schema-on-read" path for semi-structured columns)."""
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = load_table(spark, sf_dir, "events").withColumn(
        "pj", F.from_json("props", schema)
    )
    return (
        parsed.filter(F.col("pj.k").isNotNull())
        .agg(F.sum("pj.k").alias("total_k"), F.count("*").alias("n_parsed"))
    )


@query(
    "string_functions",
    oracle="""
    SELECT UPPER(p_brand) AS brand_upper,
           MIN(LENGTH(p_name)) AS min_name_len,
           MAX(LENGTH(p_name)) AS max_name_len,
           COUNT(CASE WHEN p_name LIKE '%green%' THEN 1 END) AS n_green,
           MIN(SUBSTR(p_type, 1, 5)) AS min_type_prefix
    FROM part
    GROUP BY UPPER(p_brand)
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy(F.upper("p_brand").alias("brand_upper"))
        .agg(
            F.min(F.length("p_name")).alias("min_name_len"),
            F.max(F.length("p_name")).alias("max_name_len"),
            F.count(F.when(F.col("p_name").like("%green%"), 1)).alias("n_green"),
            F.min(F.substring("p_type", 1, 5)).alias("min_type_prefix"),
        )
    )


@query(
    "date_functions",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
           CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS mo,
           COUNT(*) AS n_orders,
           MIN(CAST(o_orderdate AS DATE)) AS first_day
    FROM orders
    GROUP BY 1, 2
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.min(F.col("o_orderdate").cast("date")).alias("first_day"),
        )
    )


@query(
    "conditional_functions",
    oracle="""
    SELECT
      CASE WHEN value < 10 THEN 'low' WHEN value < 100 THEN 'mid' ELSE 'high' END AS band,
      COUNT(*) AS n,
      COUNT(NULLIF(event_type, 'error')) AS n_non_error,
      COUNT(COALESCE(NULLIF(event_type, 'error'), NULL)) AS n_coalesced
    FROM events
    GROUP BY 1
    """,
)
def conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / NULLIF / COALESCE — the NULL-handling trio the reference
    leans on for sequence resync (COALESCE, after-running-script.sql:100)."""
    e = load_table(spark, sf_dir, "events")
    band = (
        F.when(F.col("value") < 10, "low")
        .when(F.col("value") < 100, "mid")
        .otherwise("high")
    )
    non_error = F.nullif(F.col("event_type"), F.lit("error"))
    return e.groupBy(band.alias("band")).agg(
        F.count("*").alias("n"),
        F.count(non_error).alias("n_non_error"),
        F.count(F.coalesce(non_error, F.lit(None))).alias("n_coalesced"),
    )


@query(
    "boolean_default_semantics",
    oracle="""
    SELECT COALESCE(CAST(json_extract_string(props, '$.synced') AS BOOLEAN), FALSE) AS synced,
           COUNT(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def boolean_default_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOOLEAN NOT NULL DEFAULT FALSE ingest semantics
    (event-table.sql:17 → SURVEY.md §1.3): absent JSON flag coalesces to
    false at read time."""
    e = load_table(spark, sf_dir, "events")
    synced = F.coalesce(
        F.get_json_object("props", "$.synced").cast("boolean"), F.lit(False)
    )
    return e.groupBy(synced.alias("synced")).agg(F.count("*").alias("n"))
