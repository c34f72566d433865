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
    """Robust outlier count per group: |x - median| > 3 * MAD.

    Median and MAD are the DISCRETE (lower-element) quantile — an actual
    element of the multiset, never an interpolated midpoint. That is
    what makes the operator oracle-expressible: DuckDB's quantile_disc
    selects the same element bit-for-bit, and every downstream double op
    (abs subtract, 3×, compare) is identical IEEE arithmetic on both
    engines. Interpolating medians (pandas' default 'linear') would
    reintroduce engine-dependent FP."""
    v = pdf["value"]
    med = v.quantile(0.5, interpolation="lower")
    mad = (v - med).abs().quantile(0.5, interpolation="lower")
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


@query(
    "pandas_group_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, COUNT(*) AS n_events,
             quantile_disc(value, 0.5) AS median_value
      FROM events GROUP BY event_type
    ), madt AS (
      SELECT e.event_type,
             quantile_disc(abs(e.value - m.median_value), 0.5) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type
    ), outl AS (
      SELECT e.event_type,
             CAST(SUM(CASE WHEN abs(e.value - m.median_value) > 3 * t.mad
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_out
      FROM events e
      JOIN med m USING (event_type) JOIN madt t USING (event_type)
      GROUP BY e.event_type
    )
    SELECT m.event_type, m.n_events, m.median_value, t.mad,
           CASE WHEN t.mad > 0 THEN o.n_out ELSE CAST(0 AS BIGINT) END
             AS n_outliers
    FROM med m
    JOIN madt t USING (event_type)
    JOIN outl o USING (event_type)
    """,
)
def pandas_group_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust (median/MAD) outlier detection — grouped
    pandas with one Arrow batch per group. Discrete-quantile semantics
    make it fully oracle-checked (see _mad_outliers); exactness vs a
    driver-side pandas ground truth is additionally asserted in
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


def _merge_asof_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-user pd.merge_asof: most recent error at or before each
    purchase (the pandas-native as-of implementation)."""
    purchases = (
        pdf[pdf["event_type"] == "purchase"][["event_id", "user_id", "ts"]]
        .sort_values("ts")
    )
    errors = pdf[pdf["event_type"] == "error"][["ts"]].sort_values("ts")
    if len(purchases) == 0:
        return purchases.assign(us_since_last_error=pd.array([], dtype="Int64"))
    merged = pd.merge_asof(
        purchases, errors.rename(columns={"ts": "err_ts"}),
        left_on="ts", right_on="err_ts", direction="backward",
    )
    delta = (merged["ts"].astype("int64") - merged["err_ts"].astype("int64")) // 1000
    delta = delta.where(merged["err_ts"].notna(), other=pd.NA).astype("Int64")
    return merged.assign(us_since_last_error=delta)[
        ["event_id", "user_id", "us_since_last_error"]
    ]


def asof_join_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join, implementation 2: grouped pd.merge_asof (the
    preference-order fallback when window composition can't express the
    semantics — e.g. nearest-match tolerance). Equivalence with the
    window composition (operators/analytic.asof_join_purchase_last_error)
    is asserted in tests/test_custom_pandas.py."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    return e.groupBy("user_id").applyInPandas(
        _merge_asof_group,
        schema="event_id long, user_id long, us_since_last_error long",
    )


def user_daily_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped time-series resampling (pytest-verified; not in the oracle
    set — gap-day zero-filling is the pandas-native behavior under test)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    return e.groupBy("user_id").applyInPandas(
        _user_resample_1d,
        schema="user_id long, day timestamp, n_events long, total_value double",
    )
