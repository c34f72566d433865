"""Layout operators: compaction preserves data and shrinks file count;
sorted layout turns footer statistics into real skipping."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresql_transfer_tool_spark.catalog import load_table
from postgresql_transfer_tool_spark.functions.layout import (
    compact,
    file_key_ranges,
    overlap_fraction,
    sort_on_write,
)


def test_compact_shrinks_files_preserves_rows(spark, sf_dir, tmp_path):
    path = str(tmp_path / "fragmented")
    orders = load_table(spark, sf_dir, "orders")
    # simulate streaming ingest debris: 64 shuffled micro-files
    orders.repartition(64).write.parquet(path)

    before_rows = orders.count()
    n_before, n_after = compact(spark, path, target_bytes=1 << 30)
    assert n_before == 64
    assert n_after == 1  # fixture bytes fit one 1 GiB target file

    after = spark.read.parquet(path)
    assert after.count() == before_rows
    a = after.agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))).first()[0]
    b = orders.agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))).first()[0]
    assert a == b


def test_sorted_layout_gives_disjoint_file_ranges(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    sorted_path = str(tmp_path / "sorted")
    random_path = str(tmp_path / "random")
    sort_on_write(li, sorted_path, "l_orderkey", n_files=16)
    li.repartition(16).write.parquet(random_path)  # hash-scattered layout

    lo, hi = li.agg(F.min("l_orderkey"), F.max("l_orderkey")).first()
    probe_lo, probe_hi = lo, lo + (hi - lo) // 100  # ~1% of the key span

    sorted_frac = overlap_fraction(
        file_key_ranges(sorted_path, "l_orderkey"), probe_lo, probe_hi
    )
    random_frac = overlap_fraction(
        file_key_ranges(random_path, "l_orderkey"), probe_lo, probe_hi
    )
    # a 1% range predicate touches ~1 of 16 sorted files but every
    # hash-scattered file
    assert sorted_frac <= 2 / 16, sorted_frac
    assert random_frac == 1.0, random_frac


def test_sorted_layout_query_parity(spark, sf_dir, tmp_path):
    """Re-layout must never change results: filtered reads agree."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    path = str(tmp_path / "sorted_parity")
    sort_on_write(li, path, "l_orderkey", n_files=8)
    probe = li.filter(F.col("l_orderkey") < 100)
    probe_sorted = spark.read.parquet(path).filter(F.col("l_orderkey") < 100)
    assert sorted(map(tuple, probe.collect())) == sorted(
        map(tuple, probe_sorted.collect())
    )


def test_zorder_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order vs single-key sort: the sorted layout prunes perfectly on
    its key and not at all on the other; z-order prunes on BOTH."""
    from postgresql_transfer_tool_spark.functions.layout import zorder_on_write

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    z_path = str(tmp_path / "zorder")
    s_path = str(tmp_path / "keysort")
    zorder_on_write(li, z_path, ("l_orderkey", "l_partkey"), n_files=16)
    sort_on_write(li, s_path, "l_orderkey", n_files=16)

    stats = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey"),
    ).first()
    ok_lo, ok_hi, pk_lo, pk_hi = stats
    # ~1/8 span probes on each dimension
    ok_probe = (ok_lo, ok_lo + (ok_hi - ok_lo) // 8)
    pk_probe = (pk_lo, pk_lo + (pk_hi - pk_lo) // 8)

    def frac(path, col, probe):
        return overlap_fraction(file_key_ranges(path, col), *probe)

    # secondary-dimension probe: sorted layout cannot skip anything
    assert frac(s_path, "l_partkey", pk_probe) == 1.0
    # ...z-order skips a real fraction of files on that same probe
    assert frac(z_path, "l_partkey", pk_probe) <= 0.75
    # and still skips on the first dimension too
    assert frac(z_path, "l_orderkey", ok_probe) <= 0.75
    # parity: clustering must not change the data
    z_rows = spark.read.parquet(z_path).count()
    assert z_rows == li.count()
