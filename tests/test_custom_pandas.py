"""applyInPandas custom operators: distributed result must equal the
single-process pandas ground truth."""

from __future__ import annotations

import pandas as pd

from postgresql_transfer_tool_spark.catalog import load_table
from postgresql_transfer_tool_spark.operators.custom_pandas import (
    _mad_outliers,
    pandas_group_outliers,
    user_daily_resample,
)


def test_group_outliers_match_local_pandas(spark, sf_dir):
    spark_rows = {
        r["event_type"]: r for r in pandas_group_outliers(spark, sf_dir).collect()
    }
    pdf = load_table(spark, sf_dir, "events").select("event_type", "value").toPandas()
    for etype, grp in pdf.groupby("event_type"):
        local = _mad_outliers(grp)
        got = spark_rows[etype]
        assert got["n_events"] == int(local["n_events"][0])
        assert got["median_value"] == float(local["median_value"][0])
        assert got["n_outliers"] == int(local["n_outliers"][0])


def test_user_daily_resample_covers_span_with_gap_fill(spark, sf_dir):
    out = user_daily_resample(spark, sf_dir)
    pdf = out.filter(out.user_id == 1).toPandas().sort_values("day")
    if len(pdf) == 0:
        return  # user 1 absent at this sf — nothing to assert
    # contiguous daily index (gap days present, zero-filled)
    days = pd.to_datetime(pdf["day"]).reset_index(drop=True)
    assert (days.diff().dropna() == pd.Timedelta(days=1)).all()
    assert (pdf["n_events"] >= 0).all()
    assert pdf["n_events"].sum() == pdf["n_events"].sum()  # schema sanity
    # totals match the raw per-user sum
    from pyspark.sql import functions as F

    raw = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") == 1)
        .agg(F.count("*").alias("n"))
        .collect()[0]["n"]
    )
    assert pdf["n_events"].sum() == raw


def test_asof_pandas_matches_window_composition(spark, sf_dir):
    """Two independent as-of implementations (grouped merge_asof vs
    tagged-union window carry-forward) must agree row-for-row."""
    from postgresql_transfer_tool_spark.operators.analytic import (
        asof_join_purchase_last_error,
    )
    from postgresql_transfer_tool_spark.operators.custom_pandas import asof_join_pandas

    via_window = {
        r["event_id"]: r["us_since_last_error"]
        for r in asof_join_purchase_last_error(spark, sf_dir).collect()
    }
    via_pandas = {
        r["event_id"]: r["us_since_last_error"]
        for r in asof_join_pandas(spark, sf_dir).collect()
    }
    assert via_window == via_pandas
