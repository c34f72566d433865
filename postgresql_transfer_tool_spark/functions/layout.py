"""Physical-layout operators: small-file compaction and sort-on-write.

Two operational realities of a 100 TB lake that no query operator
fixes:

1. **Small files.** Streaming ingest and fine-grained partitioning
   produce thousands of KB-sized files; every scan then pays per-file
   open/footer/seek costs and the driver pays per-file planning. The
   fix is periodic compaction: rewrite a directory into
   ``ceil(bytes / target)`` files. ``coalesce`` (narrow, no shuffle)
   does the bin-packing — a compaction must not cost a shuffle of the
   whole table.

2. **Data skipping.** Parquet footers carry per-file/row-group min-max
   statistics, but statistics only *prune* if the layout gives them
   selectivity: a randomly-laid-out table has every file spanning the
   whole key range (every filter touches every file), while a
   range-sorted layout gives files disjoint key ranges — a point or
   range predicate then touches ``O(selectivity)`` files instead of all
   of them. ``sort_on_write`` = ``repartitionByRange`` (global range
   partitioning, one shuffle at write time) + ``sortWithinPartitions``
   (free local order, also enables row-group pruning within files).
   This is the parquet-native analog of clustering/Z-ordering, amortized
   over every subsequent scan — the same write-once/read-forever trade
   as the bucketed join layout (functions/bucketing.py).
"""

from __future__ import annotations

import glob
import math
import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: compaction target ~128 MB — the classic HDFS/parquet sweet spot:
#: large enough to amortize footers/opens, small enough to parallelize
DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _data_files(path: str) -> list[str]:
    return [
        f
        for f in glob.glob(os.path.join(path, "*.parquet"))
        if os.path.isfile(f)
    ]


def compact(
    spark: SparkSession, path: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> tuple[int, int]:
    """Rewrite ``path`` into ``ceil(total_bytes / target_bytes)`` files.

    Returns (files_before, files_after). Uses ``coalesce`` — a narrow
    repack with no shuffle — and a staged rewrite (write aside, then
    swap) so a failed compaction never leaves the directory partial.
    """
    files = _data_files(path)
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / target_bytes))
    tmp = path.rstrip("/") + ".compact_tmp"
    spark.read.parquet(path).coalesce(n_out).write.mode("overwrite").parquet(tmp)
    swap = path.rstrip("/") + ".compact_old"
    os.rename(path, swap)
    os.rename(tmp, path)
    shutil.rmtree(swap)
    return len(files), len(_data_files(path))


def sort_on_write(
    df: DataFrame, path: str, key: str | Column, n_files: int
) -> None:
    """Persist ``df`` range-clustered on ``key``: each output file owns
    a disjoint key range (file-level skipping) and is internally sorted
    (row-group-level skipping)."""
    (
        df.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(path)
    )


#: bits per dimension in the z-value (two dims → 2*bits total)
ZORDER_BITS = 16


def _zvalue(cols: list[str], bits: int = ZORDER_BITS) -> Column:
    """Interleave the bits of two quantized rank columns into a Morton
    (z-order) key — JVM-side expression, no Python in the row path."""
    assert len(cols) == 2, "z-order implemented for 2 dimensions"
    x, y = cols
    return F.expr(
        f"""aggregate(sequence(0, {bits - 1}), 0L, (acc, i) ->
              acc + shiftleft((shiftright({x}, i) & 1), 2*i)
                  + shiftleft((shiftright({y}, i) & 1), 2*i + 1))"""
    )


def zorder_on_write(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    n_files: int,
    bits: int = ZORDER_BITS,
) -> None:
    """Persist ``df`` clustered on the Morton interleave of two numeric
    columns: every output file covers a small rectangle of the 2-d key
    space, so range predicates on EITHER column (or both) skip files.
    Single-key sort gives perfect skipping on one column and none on
    the other; z-order trades a little of the first for a lot of the
    second — the standard multi-dimensional clustering choice
    (Delta/Iceberg OPTIMIZE ZORDER) expressed in plain Spark.

    Each dimension is affinely quantized to ``bits``-bit ranks from its
    own min/max (one tiny pre-aggregation), then the interleaved key
    drives the same range-partition + local-sort write as
    ``sort_on_write``. The z column is dropped from the stored data.
    """
    c1, c2 = cols
    mm = df.agg(
        F.min(c1).alias("min1"),
        F.max(c1).alias("max1"),
        F.min(c2).alias("min2"),
        F.max(c2).alias("max2"),
    ).first()
    top = (1 << bits) - 1

    def rank(col: str, lo: object, hi: object) -> Column:
        span = (hi - lo) or 1
        return ((F.col(col) - F.lit(lo)) * top / F.lit(span)).cast("long")

    z = df.withColumn("_zx", rank(c1, mm["min1"], mm["max1"])).withColumn(
        "_zy", rank(c2, mm["min2"], mm["max2"])
    )
    (
        z.withColumn("_z", _zvalue(["_zx", "_zy"], bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_zx", "_zy", "_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_key_ranges(path: str, column: str) -> list[tuple[object, object]]:
    """Per-file (min, max) of ``column`` from the parquet footers — the
    statistics a scan planner consults for skipping. Used by tests to
    assert layout quality without depending on engine internals."""
    import pyarrow.parquet as pq

    ranges: list[tuple[object, object]] = []
    for f in sorted(_data_files(path)):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(column)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                raise ValueError(f"no min/max stats for {column} in {f}")
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    return ranges


def overlap_fraction(
    ranges: list[tuple[object, object]], lo: object, hi: object
) -> float:
    """Fraction of files whose key range intersects [lo, hi] — i.e. the
    fraction of the table a range predicate must actually read."""
    hit = sum(1 for mn, mx in ranges if not (mx < lo or mn > hi))
    return hit / len(ranges) if ranges else 0.0
