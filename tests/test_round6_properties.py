"""Cheap high-signal invariants for the round-6 operators — the oracle
gate proves point equality; these pin semantic properties that must
hold for ANY input, so a future refactor that stays accidentally
oracle-equal on the fixture still can't break the meaning."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_interval_concurrency_invariants(spark):
    from postgresql_transfer_tool_spark.operators.incremental import (
        interval_concurrency_peak,
    )

    rows = interval_concurrency_peak(spark, SF).collect()
    assert rows, "no event types"
    from postgresql_transfer_tool_spark.catalog import load_table

    counts = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        # at least one interval is open at its own start; never more
        # open than the type has events
        assert 1 <= r["peak"] <= counts[r["event_type"]]


def test_ewma_first_day_and_bounds(spark):
    from postgresql_transfer_tool_spark.operators.incremental import (
        ewma_daily_value,
    )

    df = ewma_daily_value(spark, SF)
    w = df.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("ewma_scaled").alias("mx")
    )
    first = (
        df.join(w, ["event_type"])
        .filter(F.col("day") == F.col("d0"))
        .collect()
    )
    # day 0 has no lags: ewma = 128 * v(day0) exactly, and v >= 0
    # implies ewma >= 0 everywhere
    for r in first:
        assert r["ewma_scaled"] % 128 == 0
        assert r["ewma_scaled"] >= 0
    assert df.filter("ewma_scaled < 0").count() == 0


def test_percentile_quartiles_monotone(spark):
    from postgresql_transfer_tool_spark.operators.approx import (
        percentile_cont_quartiles,
    )

    rows = percentile_cont_quartiles(spark, SF).collect()
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r["o_orderpriority"], {})[r["quantile"]] = r["value"]
    for grp, qs in by_grp.items():
        assert set(qs) == {0.25, 0.5, 0.75}, (grp, qs)
        assert qs[0.25] <= qs[0.5] <= qs[0.75], (grp, qs)


def test_trigram_pairs_canonical_and_in_threshold(spark):
    from postgresql_transfer_tool_spark.operators.joins import (
        TRGM_SIM_PCT,
        trigram_similarity_names,
    )

    rows = trigram_similarity_names(spark, SF).collect()
    assert rows, "fixture should contain similar names"
    for r in rows:
        assert r["name_a"] < r["name_b"]  # canonical ordering, no dups
        assert TRGM_SIM_PCT / 100 - 1e-9 <= r["sim"] <= 1.0


def test_transition_matrix_row_sums(spark):
    """Σ transitions = Σ (events_per_user − 1) over users with ≥ 1
    event — the chain-length identity."""
    from postgresql_transfer_tool_spark.catalog import load_table
    from postgresql_transfer_tool_spark.operators.product_analytics import (
        event_transition_matrix,
    )

    total = (
        event_transition_matrix(spark, SF).agg(F.sum("n")).first()[0]
    )
    per_user = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg((F.count("*") - 1).alias("m"))
        .agg(F.sum("m"))
        .first()[0]
    )
    assert total == per_user
