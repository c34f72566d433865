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


def test_udtf_segmentation_matches_jvm_expression(spark, sf_dir):
    """Python UDTFs (Spark 3.5+/4) are the lateral-table escape hatch for
    variable-arity row expansion — but they're Python row-path, so the
    engine's production segmenter (semantic.text_segment_dedup) uses the
    JVM transform/slice expression instead. This differential pins the
    two implementations to identical output, so the fast path provably
    computes the UDTF semantics."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import udtf

    from postgresql_transfer_tool_spark.catalog import load_table
    from postgresql_transfer_tool_spark.operators.semantic import SEG_WORDS

    @udtf(returnType="seg_idx int, seg string")
    class SegmentUDTF:
        def eval(self, text: str):
            import re as _re

            # re.split mirrors Spark's split() exactly, including the
            # empty-text edge (both yield [''] for ''), where str.split()
            # would yield [] and diverge
            toks = _re.split(r"\s+", text.strip())
            for i in range(0, len(toks), SEG_WORDS):
                yield i // SEG_WORDS, " ".join(toks[i : i + SEG_WORDS])

    spark.udtf.register("segments_udtf", SegmentUDTF)
    docs = load_table(spark, sf_dir, "documents").limit(50)
    docs.createOrReplaceTempView("seg_docs")
    via_udtf = {
        (r.doc_id, r.seg_idx, r.seg)
        for r in spark.sql(
            "SELECT d.doc_id, s.seg_idx, s.seg FROM seg_docs d, LATERAL segments_udtf(d.text) s"
        ).collect()
    }
    via_jvm = {
        (r.doc_id, r.seg_idx, r.seg)
        for r in docs.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, int((size(split(trim(text), '\\\\s+')) + {SEG_WORDS - 1}) / {SEG_WORDS}) - 1),"
                    f" i -> concat_ws(' ', slice(split(trim(text), '\\\\s+'), i * {SEG_WORDS} + 1, {SEG_WORDS})))"
                )
            ).alias("seg_idx", "seg"),
        ).collect()
    }
    assert via_udtf == via_jvm
