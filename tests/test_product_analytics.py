"""Behavioral invariants for the product-analytics family.

Oracle parity (test_oracle_diff.py) proves Spark ≡ DuckDB; these prove
the shared semantics are the RIGHT ones — funnel stage monotonicity,
retention bounds, rolling-window dominance — properties that would
still hold if both engines were wrong together.
"""

from __future__ import annotations

from postgresql_transfer_tool_spark.operators.product_analytics import (
    RETENTION_DAYS,
    active_users_rolling,
    cohort_retention,
    funnel_user_conversion,
)


def test_funnel_stage_monotonicity(spark, sf_dir):
    row = funnel_user_conversion(spark, sf_dir).collect()[0]
    assert row.n_users >= row.n_view >= row.n_view_click >= row.n_full_funnel >= 0
    assert row.n_users > 0


def test_retention_bounds_and_day_zero(spark, sf_dir):
    rows = cohort_retention(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.day_offset <= RETENTION_DAYS
        assert 0 < r.n_active <= r.n_cohort
        assert 0.0 < r.retention <= 1.0
    # every user is active on their cohort day → day-0 retention is 1.0
    day0 = [r for r in rows if r.day_offset == 0]
    assert day0 and all(r.retention == 1.0 for r in day0)


def test_rolling_window_dominates_dau(spark, sf_dir):
    rows = active_users_rolling(spark, sf_dir).collect()
    assert rows
    by_day = sorted(rows, key=lambda r: r.day)
    for r in by_day:
        assert 0 <= r.dau <= r.wau_7d
    # the 7-day window over a contiguous fixture must strictly exceed a
    # single day somewhere (there are multiple active days)
    assert any(r.wau_7d > r.dau for r in by_day)


def test_rolling_hll_tracks_exact_counts(spark, sf_dir):
    """The sketch-merge rolling actives must agree with the exact path:
    DAU (still exact countDistinct) matches identically; the HLL union
    estimate stays within the lgK=14 error envelope (±2% is generous —
    at fixture cardinality the sketch is effectively exact)."""
    from postgresql_transfer_tool_spark.operators.product_analytics import (
        active_users_rolling,
        active_users_rolling_hll,
    )

    exact = {r.day: (r.dau, r.wau_7d) for r in active_users_rolling(spark, sf_dir).collect()}
    est = {
        r.day: (r.dau, r.wau_7d_estimate)
        for r in active_users_rolling_hll(spark, sf_dir).collect()
    }
    assert set(est) == set(exact)
    for day, (dau, wau) in exact.items():
        assert est[day][0] == dau
        assert abs(est[day][1] - wau) / wau <= 0.02, (day, est[day][1], wau)


def test_funnel_property_vs_python_reference(spark):
    """The strict-ordering funnel vs a pure-Python fold over adversarial
    event sequences (clicks before any view, purchases before clicks,
    interleaved repeats, missing stages) — orderings the fixture's
    random events may never produce."""
    from hypothesis import given, settings, strategies as st

    from postgresql_transfer_tool_spark.operators.product_analytics import (
        funnel_user_conversion,
    )

    event = st.tuples(
        st.integers(min_value=1, max_value=4),          # user_id
        st.sampled_from(["view", "click", "purchase", "error"]),
        st.integers(min_value=0, max_value=30),         # distinct ts seconds
    )
    events_strategy = st.lists(event, min_size=1, max_size=40, unique_by=lambda e: (e[0], e[2]))

    def reference(rows):
        by_user: dict[int, list] = {}
        for u, t, s in rows:
            by_user.setdefault(u, []).append((s, t))
        n_users = len(by_user)
        n_view = n_click = n_purchase = 0
        for evs in by_user.values():
            evs.sort()
            t_view = next((s for s, t in evs if t == "view"), None)
            if t_view is None:
                continue
            n_view += 1
            t_click = next((s for s, t in evs if t == "click" and s > t_view), None)
            if t_click is None:
                continue
            n_click += 1
            if any(t == "purchase" and s > t_click for s, t in evs):
                n_purchase += 1
        return n_users, n_view, n_click, n_purchase

    @settings(max_examples=15, deadline=None)
    @given(events_strategy)
    def check(rows):
        import tempfile

        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [
                (i, u, t, float(s), "{}",
                 __import__("datetime").datetime(2024, 1, 1, 0, 0, s))
                for i, (u, t, s) in enumerate(rows)
            ],
            "event_id long, user_id long, event_type string, value double, props string, ts timestamp",
        ).select("event_id", "ts", "user_id", "event_type", "value", "props")
        with tempfile.TemporaryDirectory() as d:
            df.coalesce(1).write.parquet(f"{d}/events.parquet")
            got = funnel_user_conversion(spark, d).collect()[0]
        assert (
            got.n_users, got.n_view, got.n_view_click, got.n_full_funnel
        ) == reference(rows)

    check()
