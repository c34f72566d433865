"""Set operations (UNION / INTERSECT / EXCEPT, with and without ALL).

Not in the reference (SURVEY.md §2.6); derived requirement — the engine
must answer the full relational algebra the reference's PostgreSQL
backend would. Scale note: INTERSECT/EXCEPT hash-shuffle both sides on
the full row; keys are projected down first so only the needed columns
move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query


@query(
    "union_all_account_balances",
    oracle="""
    SELECT kind, k, bal FROM (
      SELECT 'customer' AS kind, c_custkey AS k, c_acctbal AS bal FROM customer
      UNION ALL
      SELECT 'supplier' AS kind, s_suppkey AS k, s_acctbal AS bal FROM supplier
    ) t
    """,
)
def union_all_account_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_custkey").alias("k"),
        F.col("c_acctbal").alias("bal"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_suppkey").alias("k"),
        F.col("s_acctbal").alias("bal"),
    )
    return c.unionByName(s)


@query(
    "union_distinct_nation_keys",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def union_distinct_nation_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "intersect_nations_with_both",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def intersect_nations_with_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "except_nations_customers_only",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def except_nations_customers_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT (distinct) semantics
