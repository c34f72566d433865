"""Custom per-group operators via applyInPandas (Arrow-batched).

The escape hatch for semantics the built-in operators can't express
(SURVEY.md §7.3 preference order: compose built-ins → applyInPandas →
mapPartitions). Used sparingly: everything else in this engine is
JVM-side; these two operators exist to prove the grouped-pandas path
with real schemas and deterministic outputs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query


def _mad_outliers(pdf: pd.DataFrame) -> pd.DataFrame:
    """Robust outlier count per group: |x - median| > 3 * MAD."""
    v = pdf["value"]
    med = v.median()
    mad = (v - med).abs().median()
    n_out = int(((v - med).abs() > 3 * mad).sum()) if mad > 0 else 0
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n_events": [len(pdf)],
            "median_value": [float(med)],
            "mad": [float(mad)],
            "n_outliers": [n_out],
        }
    )


@query("pandas_group_outliers")  # rows-only: pandas median ≠ SQL quantile FP-wise
def pandas_group_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust (median/MAD) outlier detection — grouped
    pandas with one Arrow batch per group. Deterministic (median of a
    fixed multiset), so the rows-only check is stable; exactness vs a
    driver-side pandas ground truth is asserted in
    tests/test_custom_pandas.py."""
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    return e.groupBy("event_type").applyInPandas(
        _mad_outliers,
        schema=(
            "event_type string, n_events long, median_value double, "
            "mad double, n_outliers long"
        ),
    )


def _user_resample_1d(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-user daily resample (pandas time-series op with no clean SQL
    equivalent at this altitude): daily event count + value sum over the
    user's active span, zero-filled for gap days."""
    s = pdf.set_index("ts").sort_index()
    daily = s["value"].resample("1D").agg(["count", "sum"]).fillna(0.0)
    return pd.DataFrame(
        {
            "user_id": pdf["user_id"].iloc[0],
            "day": daily.index,
            "n_events": daily["count"].astype("int64"),
            "total_value": daily["sum"].astype("float64"),
        }
    )


def user_daily_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped time-series resampling (pytest-verified; not in the oracle
    set — gap-day zero-filling is the pandas-native behavior under test)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    return e.groupBy("user_id").applyInPandas(
        _user_resample_1d,
        schema="user_id long, day timestamp, n_events long, total_value double",
    )
