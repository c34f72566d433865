"""Partition-scoped CDC upsert: merge micro-batches into a hive-
partitioned parquet target, rewriting ONLY the partitions the batch
touches (VERDICT r3 "Next round" #7).

The whole-target staged swap (tests/test_streaming_upsert.py's
foreachBatch pattern) is correct but rewrites 100 TB to apply a 1 MB
batch. With the target laid out hive-style on a partition column
(``transfer.py``'s ``partition_by`` machinery writes exactly this
layout), an upsert only needs to:

1. derive the touched partition values from the batch (distinct over
   the batch's partition column — bounded by partitions-per-batch, not
   table size);
2. read the CURRENT rows of just those partitions (a partition-pruned
   scan: the ``IN`` predicate lands in PartitionFilters, files of other
   partitions are never opened);
3. ``merge_into`` the batch (broadcast — batches are small by
   construction) and write the merged partitions to a staging dir;
4. swap each touched partition directory atomically (rename), leaving
   every untouched partition's files byte-identical on disk.

Contract: the partition column must be STABLE under updates — derived
from the key or an immutable attribute (an order's date, a user's
shard). A key whose partition value changed between versions would
leave its old row in the old partition; ``assert_stable`` (default on)
fails fast if a batch key collides with a target row in a DIFFERENT
partition, instead of silently double-storing.

At 100 TB this is the parquet-native equivalent of Delta/Iceberg
MERGE with dynamic partition overwrite: cost ∝ touched partitions,
not table size; the swap is per-partition-atomic (readers see old or
new, never partial) exactly like ``transfer.py``'s staged table copy.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import merge_into


def _part_dir(target_path: str, part_col: str, value) -> str:
    return os.path.join(target_path, f"{part_col}={value}")


def upsert_partitions(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    key: str,
    part_col: str,
    update_cols: Sequence[str],
    assert_stable: bool = True,
) -> list:
    """Merge ``batch`` into the partitioned target; returns the list of
    touched partition values. Batch rows must already carry
    ``part_col``. Empty batches are a no-op."""
    if batch.isEmpty():
        return []
    touched = sorted(
        r[0] for r in batch.select(part_col).distinct().collect()
    )
    if any(v is None for v in touched):
        raise ValueError(f"batch contains NULL {part_col} values")

    current = spark.read.parquet(target_path).filter(
        F.col(part_col).isin(touched)
    )
    if assert_stable:
        # a batch key already stored under a DIFFERENT partition would
        # be double-stored after the merge — fail fast (one pruned-scan
        # aggregate over the key projections, driver gets a single long)
        moved = (
            spark.read.parquet(target_path)
            .filter(~F.col(part_col).isin(touched))
            .select(key)
            .join(batch.select(key), key, "inner")
            .count()
        )
        if moved:
            raise ValueError(
                f"{moved} batch key(s) exist in the target under a "
                f"partition outside the batch's {part_col} values — the "
                "partition column is not stable under updates"
            )
    merged = merge_into(current, batch, key=key, update_cols=list(update_cols)).drop(
        "action"
    )

    staging = target_path.rstrip("/") + ".upsert_staging"
    shutil.rmtree(staging, ignore_errors=True)
    merged.write.partitionBy(part_col).mode("overwrite").parquet(staging)

    for v in touched:
        src = _part_dir(staging, part_col, v)
        dst = _part_dir(target_path, part_col, v)
        old = dst + ".old"
        if not os.path.isdir(src):
            # merge produced no rows for this value (possible only if the
            # batch rows for it were all dropped upstream) — leave target
            continue
        if os.path.isdir(dst):
            os.rename(dst, old)
        os.rename(src, dst)  # atomic publish of the new partition
        shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    return touched


class PartitionedUpsertSink:
    """foreachBatch target wrapping :func:`upsert_partitions` — the
    partition-pruned replacement for the whole-target staged swap."""

    def __init__(
        self,
        spark: SparkSession,
        target_path: str,
        key: str,
        part_col: str,
        update_cols: Sequence[str],
    ) -> None:
        self.spark = spark
        self.target_path = target_path
        self.key = key
        self.part_col = part_col
        self.update_cols = list(update_cols)

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        upsert_partitions(
            self.spark,
            self.target_path,
            batch_df,
            key=self.key,
            part_col=self.part_col,
            update_cols=self.update_cols,
        )
