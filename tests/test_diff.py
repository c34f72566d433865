"""Unit tests for snapshot diff + table checksum (operators/diff.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresql_transfer_tool_spark.catalog import load_table
from postgresql_transfer_tool_spark.operators.diff import (
    NULL_TOKEN,
    row_fingerprint,
    snapshot_diff,
    table_checksum,
)


def _checksum_pair(df, *cols):
    row = table_checksum(df, *cols).collect()[0]
    return row["n_rows"], row["content_checksum"]


def test_checksum_is_order_and_partitioning_invariant(spark, sf_dir):
    df = load_table(spark, sf_dir, "customer")
    cols = (F.col("c_custkey").cast("string"), F.col("c_name"))
    base = _checksum_pair(df, *cols)
    shuffled = _checksum_pair(
        df.orderBy(F.col("c_name").desc()).repartition(7), *cols
    )
    coalesced = _checksum_pair(df.coalesce(1), *cols)
    assert base == shuffled == coalesced


def test_checksum_detects_single_value_change(spark, sf_dir):
    df = load_table(spark, sf_dir, "customer")
    cols = (F.col("c_custkey").cast("string"), F.col("c_name"))
    base = _checksum_pair(df, *cols)
    # mutate exactly one row's compared column; row count must match
    # while the content checksum must not (the case COUNT(*) misses)
    mutated = df.withColumn(
        "c_name",
        F.when(F.col("c_custkey") == 1, F.concat(F.col("c_name"), F.lit("x")))
        .otherwise(F.col("c_name")),
    )
    mut = _checksum_pair(mutated, *cols)
    assert mut[0] == base[0]
    assert mut[1] != base[1]


def test_checksum_detects_drop_plus_duplicate(spark, sf_dir):
    # one row dropped + another duplicated keeps COUNT(*) identical;
    # the checksum must still differ
    df = load_table(spark, sf_dir, "customer")
    cols = (F.col("c_custkey").cast("string"), F.col("c_name"))
    base = _checksum_pair(df, *cols)
    dup = df.filter(F.col("c_custkey") == 2)
    swapped = df.filter(F.col("c_custkey") != 1).unionAll(dup)
    swp = _checksum_pair(swapped, *cols)
    assert swp[0] == base[0]
    assert swp[1] != base[1]


def test_null_rendering_distinguishes_null_from_empty(spark):
    # concat_ws silently drops NULLs; the sentinel must keep
    # (NULL, "a") distinct from ("", "a") and from ("a", NULL)
    df = spark.createDataFrame(
        [(None, "a"), ("", "a"), ("a", None)], "x string, y string"
    )
    fps = [
        r["fp"]
        for r in df.select(
            row_fingerprint(F.col("x"), F.col("y")).alias("fp")
        ).collect()
    ]
    assert len(set(fps)) == 3
    assert NULL_TOKEN != ""


def test_snapshot_diff_classifies_all_four_kinds(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k int, v string"
    )
    out = snapshot_diff(old, new, keys=["k"], compare=["v"])
    got = {r["k"]: r["change_type"] for r in out.collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_matches_oracle_query(spark, sf_dir, duck):
    # the registered query's Spark side must agree with its DuckDB
    # oracle row-for-row (same check the driver runs at sf0.01)
    from postgresql_transfer_tool_spark.operators.diff import (
        _DIFF_ORACLE,
        snapshot_diff_orders,
    )

    spark_rows = {
        r["change_type"]: (r["n"], r["key_sum"], r["cents_delta"])
        for r in snapshot_diff_orders(spark, sf_dir).collect()
    }
    duck_rows = {
        r[0]: (r[1], r[2], r[3]) for r in duck.execute(_DIFF_ORACLE).fetchall()
    }
    assert spark_rows == duck_rows
    assert spark_rows["unchanged"][0] > 0
    assert spark_rows["changed"][0] > 0


def test_checksums_oracle_parity(spark, sf_dir, duck):
    from postgresql_transfer_tool_spark.operators.diff import (
        _checksum_oracle,
        table_content_checksums,
    )

    spark_rows = {
        r["table_name"]: (r["n_rows"], r["content_checksum"])
        for r in table_content_checksums(spark, sf_dir).collect()
    }
    duck_rows = {
        r[0]: (r[1], r[2])
        for r in duck.execute(_checksum_oracle()).fetchall()
    }
    assert spark_rows == duck_rows
