"""Skew mitigation helpers: key salting for hot-key aggregates/joins.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; salting is the explicit tool for *aggregation* hot keys and for
joins where one key dominates (the classic NULL-key or power-law-user
case in a 100 TB event table).

AQE's rule also has structural preconditions salting doesn't (verified
in test_skew.py::test_aqe_splits_skewed_join_partition): it splits a
skewed reduce partition along map-output boundaries (a single-mapper
side is unsplittable), and both join children must read directly from
their own shuffle — an aggregation between the shuffle and the join
(e.g. a distinct-ed dim) defeats the rule's plan-pattern match. Where
those preconditions fail, the salted forms below are the fallback.

Two-phase salted aggregation: groupBy(key, salt) partial → groupBy(key)
final. Correct for any commutative/associative aggregate (count, sum,
min, max — and exact decimal sums, so the engine's bit-stable aggregate
discipline survives salting).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt derived from a stable row hash (not rand() —
    retries/speculative tasks must salt identically or counts drift)."""
    cols = [F.col(c) for c in df.columns]
    return df.withColumn(salt_col, F.pmod(F.xxhash64(*cols), F.lit(n_salts)))


def salted_count_sum(
    df: DataFrame,
    key: str,
    value: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Hot-key-safe count+sum: two-phase aggregation through a salted
    intermediate key. Output: (key, n, total) — identical to the direct
    groupBy, but the first shuffle spreads each hot key over n_salts
    reducers."""
    salted = with_salt(df.select(key, value.alias("_v")), n_salts)
    partial = salted.groupBy(key, "_salt").agg(
        F.count("*").alias("_n"), F.sum("_v").alias("_s")
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n"), F.sum("_s").alias("total")
    )


def broadcast_salted_join(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Skewed equi-join: salt the big side's key, replicate the small
    side across all salt values, join on (key, salt). Use when one key's
    row count breaks even AQE's split threshold and the small side is
    broadcastable after replication."""
    big_salted = with_salt(big, n_salts)
    salt_values = big.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("_salt")
    )
    small_replicated = small.crossJoin(F.broadcast(salt_values))
    return big_salted.join(F.broadcast(small_replicated), [key, "_salt"]).drop("_salt")
