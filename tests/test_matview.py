"""Incremental MV maintenance: merge ≡ recompute, and the refresh plan
must scan ONLY the delta (the property that makes it incremental)."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresql_transfer_tool_spark.catalog import load_table
from postgresql_transfer_tool_spark.operators.matview import (
    _MV_CUTOFF,
    mv_incremental_refresh,
)
from postgresql_transfer_tool_spark.plans import physical_plan


def test_refresh_plan_scans_only_delta(spark, sf_dir):
    df = mv_incremental_refresh(spark, sf_dir)
    plan = physical_plan(df)
    import re

    # count detail-section headers only ("(2) Scan parquet"), not the
    # tree rendering of the same node
    n_scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.MULTILINE))
    # one parquet scan (the delta); stored state enters via the
    # checkpoint boundary (LogicalRDD), not by rescanning history
    assert n_scans == 1, plan
    assert "RDDScan" in plan or "Scan ExistingRDD" in plan, plan


def test_delta_scan_has_pushed_hwm_filter(spark, sf_dir):
    plan = physical_plan(mv_incremental_refresh(spark, sf_dir))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("GreaterThanOrEqual(o_orderdate" in ln for ln in pushed), pushed


def test_merge_equals_recompute_rowwise(spark, sf_dir):
    full = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )
    inc = mv_incremental_refresh(spark, sf_dir)
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))


def test_cutoff_splits_fixture(spark, sf_dir):
    """Both state and delta must be non-empty or the test proves nothing."""
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(_MV_CUTOFF).cast("timestamp")
    assert orders.filter(F.col("o_orderdate") < cutoff).count() > 0
    assert orders.filter(F.col("o_orderdate") >= cutoff).count() > 0
