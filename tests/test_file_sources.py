"""Multi-format source layer: every format must yield the same frame.

The contract under test (sources/files.py): schema-on-read with the
reflected schema, timestamp-microsecond fidelity through text formats,
float32 arrays through JSON, and schema-evolution reads for
heterogeneous ingest batches.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from postgresql_transfer_tool_spark.catalog import load_table
from postgresql_transfer_tool_spark.sources.files import (
    convert_table,
    read_parquet_merged,
    read_table_as,
    union_evolved,
    write_table_as,
)


def _sorted_rows(df, key):
    return [tuple(r) for r in df.orderBy(key).collect()]


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_orders_roundtrip_row_identical(spark, sf_dir, tmp_path, fmt):
    src = load_table(spark, sf_dir, "orders")
    back = convert_table(spark, sf_dir, "orders", str(tmp_path / f"o.{fmt}"), fmt)
    assert back.schema == src.schema
    assert _sorted_rows(back, "o_orderkey") == _sorted_rows(src, "o_orderkey")


def test_json_roundtrips_float_arrays(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "embeddings")
    back = convert_table(
        spark, sf_dir, "embeddings", str(tmp_path / "emb.json"), "json"
    )
    assert back.schema == src.schema
    assert _sorted_rows(back, "vec_id") == _sorted_rows(src, "vec_id")


def test_csv_rejects_nested_types(spark, sf_dir, tmp_path):
    """Arrays cannot survive CSV; the layer must fail loudly, not
    stringify."""
    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(Exception, match="(?i)csv|support"):
        write_table_as(emb, str(tmp_path / "bad.csv"), "csv")


def test_unknown_format_rejected(spark, sf_dir, tmp_path):
    df = load_table(spark, sf_dir, "region")
    with pytest.raises(ValueError, match="unsupported format"):
        write_table_as(df, str(tmp_path / "x"), "avro")
    with pytest.raises(ValueError, match="unsupported format"):
        read_table_as(spark, str(tmp_path / "x"), "avro", df.schema)


def test_merge_schema_parquet_batches(spark, sf_dir, tmp_path):
    """An ingest directory whose later batches grew a column: mergeSchema
    unions the schemas, early rows read NULL for the new column."""
    region = load_table(spark, sf_dir, "region")
    p1, p2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    region.write.parquet(p1)
    region.withColumn("ingest_tag", F.lit("v2")).write.parquet(p2)

    merged = read_parquet_merged(spark, p1, p2)
    assert set(merged.columns) == {*region.columns, "ingest_tag"}
    assert merged.count() == 2 * region.count()
    assert merged.filter(F.col("ingest_tag").isNull()).count() == region.count()


def test_union_evolved_aligns_by_name(spark, sf_dir):
    region = load_table(spark, sf_dir, "region")
    old = region.select("r_regionkey", "r_name")
    new = region.select("r_regionkey", "r_name").withColumn(
        "quality", F.lit(0.5)
    )
    u = union_evolved(old, new)
    assert set(u.columns) == {"r_regionkey", "r_name", "quality"}
    assert u.count() == 2 * region.count()
    assert u.filter(F.col("quality").isNull()).count() == region.count()


def test_csv_timestamp_keeps_micros(spark, tmp_path):
    """The pinned timestampFormat must carry microseconds through CSV —
    the default format truncates to millis."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, "2024-03-01 12:34:56.123456"), (2, "2024-03-01 00:00:00.000001")],
        ["id", "raw"],
    ).select("id", F.col("raw").cast("timestamp").alias("ts"))
    path = str(tmp_path / "ts.csv")
    write_table_as(df, path, "csv")
    back = read_table_as(spark, path, "csv", schema)
    assert _sorted_rows(back, "id") == _sorted_rows(df, "id")


def test_json_quarantine_splits_corrupt_rows(spark, tmp_path):
    from postgresql_transfer_tool_spark.sources.files import read_with_quarantine

    p = tmp_path / "dirty_json"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"id": 1, "v": 10.5}\n'
        "THIS IS NOT JSON\n"
        '{"id": 2, "v": 20.25}\n'
        '{"id": "not a number", "v": 3}\n'
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    clean, quarantine = read_with_quarantine(spark, str(p), "json", schema)
    assert sorted(tuple(r) for r in clean.collect()) == [(1, 10.5), (2, 20.25)]
    bad = [r[0] for r in quarantine.collect()]
    assert len(bad) == 2
    assert any("NOT JSON" in b for b in bad)


def test_csv_quarantine_splits_corrupt_rows(spark, tmp_path):
    from postgresql_transfer_tool_spark.sources.files import read_with_quarantine

    p = tmp_path / "dirty_csv"
    p.mkdir()
    (p / "part-0.csv").write_text(
        "id,v\n1,10.5\nnot_a_number,oops\n2,20.25\n"
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    clean, quarantine = read_with_quarantine(spark, str(p), "csv", schema)
    assert sorted(tuple(r) for r in clean.collect()) == [(1, 10.5), (2, 20.25)]
    assert [r[0] for r in quarantine.collect()] == ["not_a_number,oops"]


def test_quarantine_rejects_binary_formats(spark, tmp_path):
    from postgresql_transfer_tool_spark.sources.files import read_with_quarantine

    schema = T.StructType([T.StructField("id", T.LongType())])
    with pytest.raises(ValueError, match="quarantine"):
        read_with_quarantine(spark, str(tmp_path), "parquet", schema)
