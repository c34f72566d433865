"""Partitioned target layout: the transfer can lay events out by date so
downstream incremental reads prune partitions (the 100 TB output story)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from postgresql_transfer_tool_spark.catalog import TABLES, load_table
from postgresql_transfer_tool_spark.transfer import TransferPipeline


def test_partitioned_events_layout_and_pruning(spark, sf_dir, tmp_path):
    target = str(tmp_path / "tgt")
    report = TransferPipeline(
        spark,
        sf_dir,
        target,
        exclude=tuple(t for t in TABLES if t != "events"),
        partition_by={"events": ("ts_date",)},
    ).run()
    assert report.results["events"].status == "copied"

    out = os.path.join(target, "events.parquet")
    part_dirs = [d for d in os.listdir(out) if d.startswith("ts_date=")]
    assert len(part_dirs) > 1  # hive-style layout, one dir per day

    # row fidelity (partition column is additive)
    tdf = spark.read.parquet(out)
    src = load_table(spark, sf_dir, "events")
    assert tdf.count() == src.count()
    assert set(tdf.columns) == set(src.columns) | {"ts_date"}

    # partition pruning: a date filter must touch a subset of partitions
    one_day = tdf.filter(F.col("ts_date") == part_dirs[0].split("=")[1])
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert one_day.count() > 0
    # selected partition count shows up in the FileSourceScan metadata
    from postgresql_transfer_tool_spark.plans import physical_plan

    fplan = physical_plan(one_day)
    assert "PartitionFilters" in fplan
