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
4. swap each touched partition directory into place (rename), leaving
   every untouched partition's files byte-identical on disk.

Contract: the partition column must be STABLE under updates — derived
from the key or an immutable attribute (an order's date, a user's
shard). A key whose partition value changed between versions would
leave its old row in the old partition; ``assert_stable`` (default on)
fails fast if a batch key collides with a target row in a DIFFERENT
partition, instead of silently double-storing. NOTE the guard's real
cost: it joins the batch keys against the KEY COLUMN of every
*untouched* partition, i.e. a narrow single-column scan of nearly the
whole table per micro-batch. That is cheap relative to a rewrite but
is NOT ∝ touched partitions — for very large targets run it
periodically (every Nth batch) or pass ``assert_stable=False`` once
the partition derivation is trusted.

Swap semantics (honest version): each touched partition is replaced
with two ``os.rename`` calls — current dir parked in a sibling trash
dir OUTSIDE the partition-discovery namespace
(``<target>.upsert_old``), then the staged dir renamed in. Readers see
each touched partition either whole-old or whole-new, never a partial
file set — but a partition is briefly ABSENT between the two renames,
and a crash mid-swap leaves some partitions new, some old, possibly
one parked. Recovery is automatic: the next upsert first restores any
parked partition whose target dir is missing and discards parked dirs
that were superseded, then retries idempotently (merge is by key).
This is the parquet-native best effort; a transactional log (Delta /
Iceberg MERGE) is the answer when readers cannot tolerate the
brief-absence window.

Partition DIRECTORY NAMES are never reconstructed from values: Spark
escapes them (percent-encoding for ``:`` ``%`` ``=`` etc., its own
rendering for date/timestamp values), so the dirs Spark actually wrote
under staging are enumerated and swapped by name — a reconstructed
``f"{col}={value}"`` silently misses every escaped value (ADVICE r4).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import merge_into


def _recover(target_path: str, staging: str, trash: str) -> None:
    """Heal the target after a crashed prior upsert: a parked partition
    whose target dir is MISSING was mid-swap — restore it; a parked dir
    whose target dir exists was already superseded — discard it. Stale
    staging is always discardable (never referenced by the target)."""
    if os.path.isdir(trash):
        for d in os.listdir(trash):
            src = os.path.join(trash, d)
            dst = os.path.join(target_path, d)
            if os.path.isdir(src) and not os.path.exists(dst):
                os.rename(src, dst)
        shutil.rmtree(trash, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(staging + "_probe", ignore_errors=True)


def _escaped_dirnames(
    spark: SparkSession, batch: DataFrame, part_col: str, values: list, staging: str
) -> list[str]:
    """Spark-escaped partition directory names for ``values`` — derived
    by writing a 1-row-per-value probe and enumerating what Spark names
    the dirs (dir names are never reconstructed by hand: Spark
    percent-encodes ``:`` ``%`` ``=`` etc. and has its own rendering for
    date/timestamp values — module docstring / ADVICE r4)."""
    if not values:
        return []
    import pyspark.sql.types as T

    probe = staging + "_probe"
    pdf = spark.createDataFrame(
        [(v,) for v in values], T.StructType([batch.schema[part_col]])
    ).withColumn("_probe", F.lit(1))
    pdf.coalesce(1).write.partitionBy(part_col).mode("overwrite").parquet(probe)
    prefix = f"{part_col}="
    names = sorted(
        d
        for d in os.listdir(probe)
        if d.startswith(prefix) and os.path.isdir(os.path.join(probe, d))
    )
    shutil.rmtree(probe, ignore_errors=True)
    return names


def upsert_partitions(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    key: str,
    part_col: str,
    update_cols: Sequence[str],
    assert_stable: bool = True,
    delete_col: str | None = None,
) -> list:
    """Merge ``batch`` into the partitioned target; returns the list of
    touched partition values. Batch rows must already carry
    ``part_col``. Empty batches are a no-op. See the module docstring
    for the swap/crash semantics and ``assert_stable``'s scan cost.

    ``delete_col``: optional boolean column on the batch marking CDC
    delete events (``merge_into``'s WHEN MATCHED THEN DELETE). A
    partition whose rows are ALL deleted produces no staged dir and its
    target dir is removed (parked in trash first, like a swap). A crash
    between park and completion is healed by the normal recovery path:
    the parked dir is restored and the retried batch re-deletes it —
    idempotent because merge is by key."""
    staging = target_path.rstrip("/") + ".upsert_staging"
    trash = target_path.rstrip("/") + ".upsert_old"
    _recover(target_path, staging, trash)
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
        # key-column scan of all UNTOUCHED partitions (see module
        # docstring for why this is a near-full-table narrow scan)
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
    merged = merge_into(
        current,
        batch,
        key=key,
        update_cols=list(update_cols),
        delete_col=delete_col,
    ).drop("action")
    # Expected partition values of the MERGE RESULT (≠ touched when a
    # delete empties a whole partition): a cheap column-pruned
    # recompute of the merge plan, so a write anomaly stays
    # distinguishable from a legitimate full-partition delete.
    expected = {r[0] for r in merged.select(part_col).distinct().collect()}
    merged.write.partitionBy(part_col).mode("overwrite").parquet(staging)

    prefix = f"{part_col}="
    staged_dirs = sorted(
        d
        for d in os.listdir(staging)
        if d.startswith(prefix) and os.path.isdir(os.path.join(staging, d))
    )
    # Compare the SET of staged values against the expected set (a
    # count-only check lets one missing dir cancel against one
    # unexpected extra dir — ADVICE r5). Dir names are Spark-escaped,
    # so instead of reconstructing names, read the staged partition
    # values back and let Spark decode them; cast to the batch's own
    # part_col type so inference can't skew the comparison.
    part_type = batch.schema[part_col].dataType
    staged_vals = (
        {
            r[0]
            for r in spark.read.parquet(staging)
            .select(F.col(part_col).cast(part_type))
            .distinct()
            .collect()
        }
        if staged_dirs
        else set()
    )
    if staged_vals != expected or len(staged_dirs) != len(expected):
        missing = sorted(expected - staged_vals)
        extra = sorted(staged_vals - expected)
        raise RuntimeError(
            f"staging holds {len(staged_dirs)} partition dir(s) for "
            f"{len(expected)} expected value(s); missing={missing} "
            f"extra={extra} — refusing to swap"
        )
    removed = set(touched) - expected
    if removed and delete_col is None:
        # without delete semantics merge_into never drops rows, so a
        # touched value vanishing from the merge result is a bug
        raise RuntimeError(
            f"touched partition value(s) {sorted(removed)} produced no "
            "merged rows without delete semantics — refusing to swap"
        )
    os.makedirs(trash, exist_ok=True)
    for d in staged_dirs:
        src = os.path.join(staging, d)
        dst = os.path.join(target_path, d)
        if os.path.isdir(dst):
            os.rename(dst, os.path.join(trash, d))  # outside discovery
        os.rename(src, dst)
    for d in _escaped_dirnames(spark, batch, part_col, sorted(removed), staging):
        dst = os.path.join(target_path, d)
        if os.path.isdir(dst):
            os.rename(dst, os.path.join(trash, d))  # full-partition delete
    shutil.rmtree(trash, ignore_errors=True)
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
        assert_stable_every: int = 1,
        delete_col: str | None = None,
    ) -> None:
        """``assert_stable_every``: run the partition-stability guard on
        every Nth micro-batch (1 = every batch, 0 = never). The guard
        is a key-column scan of all UNTOUCHED partitions (see module
        docstring) — cheap relative to a rewrite but not ∝ touched
        partitions, so very large targets run it periodically once the
        partition derivation is trusted (ADVICE r4)."""
        self.spark = spark
        self.target_path = target_path
        self.key = key
        self.part_col = part_col
        self.update_cols = list(update_cols)
        self.assert_stable_every = assert_stable_every
        self.delete_col = delete_col
        self._batches_seen = 0

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        self._batches_seen += 1
        every = self.assert_stable_every
        # Always guard the FIRST batch after (re)start: a fresh (and
        # possibly wrong) partition derivation shows up immediately
        # instead of surviving N-1 unguarded batches (ADVICE r5).
        check = bool(every) and (
            self._batches_seen == 1 or self._batches_seen % every == 0
        )
        upsert_partitions(
            self.spark,
            self.target_path,
            batch_df,
            key=self.key,
            part_col=self.part_col,
            update_cols=self.update_cols,
            assert_stable=check,
            delete_col=self.delete_col,
        )
