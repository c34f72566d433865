"""Accuracy-bound tests for the sketch-based operators (rows-only in the
oracle gate, so their quality contract is asserted here instead)."""

from __future__ import annotations

from postgresql_transfer_tool_spark.operators.approx import (
    ndv_approx,
    ndv_exact,
    quantiles_approx,
    stratified_sample,
)
from postgresql_transfer_tool_spark.catalog import load_table


def test_ndv_approx_within_bound(spark, sf_dir):
    exact = {r["event_type"]: r["ndv_users"] for r in ndv_exact(spark, sf_dir).collect()}
    approx = {
        r["event_type"]: r["ndv_users_approx"] for r in ndv_approx(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for k, ex in exact.items():
        assert abs(approx[k] - ex) <= max(2, 0.1 * ex), (k, ex, approx[k])


def test_quantiles_approx_ordered_and_in_range(spark, sf_dir):
    from pyspark.sql import functions as F

    bounds = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    rows = quantiles_approx(spark, sf_dir).join(bounds, "event_type").collect()
    assert rows
    for r in rows:
        assert r["lo"] <= r["p50"] <= r["p95"] <= r["p99"] <= r["hi"], r


def test_stratified_sample_proportions(spark, sf_dir):
    from pyspark.sql import functions as F

    totals = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    sampled = {
        r["event_type"]: r["n_sampled"] for r in stratified_sample(spark, sf_dir).collect()
    }
    assert set(sampled) <= {"click", "error"}
    # loose binomial bounds — sampling is seeded but proportions vary
    for k, frac in (("click", 0.1), ("error", 0.5)):
        if k in sampled:
            expected = totals[k] * frac
            assert 0.5 * expected <= sampled[k] <= 1.5 * expected, (k, sampled[k], expected)


def test_cms_estimate_upper_bounds_exact(spark, sf_dir):
    """CMS point estimates are one-sided: always ≥ the true count, and
    within the eps·N additive envelope (eps ≈ e/width; at fixture word
    volume collisions stay well under 10% of the true top-word counts)."""
    from postgresql_transfer_tool_spark.operators.approx import heavy_hitters_cms

    rows = heavy_hitters_cms(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.cms_estimate >= r.exact_n, (r.word, r.cms_estimate, r.exact_n)
        assert r.cms_estimate <= r.exact_n * 1.10, (r.word, r.cms_estimate, r.exact_n)


def test_kmv_overlap_estimator_error_bound(spark, sf_dir):
    """KMV Jaccard estimate vs exact: |err| within ~3 binomial std errs
    of the k=64 sketch (and exact when the union fits inside k)."""
    from postgresql_transfer_tool_spark.operators.corpus import (
        KMV_K,
        supplier_part_overlap_kmv,
    )

    rows = supplier_part_overlap_kmv(spark, sf_dir).collect()
    assert rows
    for r in rows:
        j, est = r["exact_jaccard"], r["kmv_jaccard"]
        union = r["n_parts_a"] + r["n_parts_b"] - r["n_inter"]
        if union <= KMV_K:
            assert est == j, r  # sketch holds the whole union: exact
        else:
            se = (j * (1 - j) / KMV_K) ** 0.5
            assert abs(est - j) <= max(3 * se, 3 / KMV_K), r


def test_hll_deterministic_within_bound(spark, sf_dir):
    """The deterministic HLL's estimate tracks the exact NDV. In the
    linear-counting regime (NDV << m=1024, which holds at fixture
    scale) the expected relative error is ~sqrt(m)/NDV-ish — use a
    conservative 15% + absolute slack of 3."""
    from postgresql_transfer_tool_spark.operators.approx import ndv_hll_deterministic

    exact = {r["event_type"]: r["ndv_users"] for r in ndv_exact(spark, sf_dir).collect()}
    est = {
        r["event_type"]: r["ndv_hll"]
        for r in ndv_hll_deterministic(spark, sf_dir).collect()
    }
    assert set(exact) == set(est)
    for k, ex in exact.items():
        assert abs(est[k] - ex) <= max(3, 0.15 * ex), (k, ex, est[k])


def test_hll_rolling_det_matches_exact_rolling(spark, sf_dir):
    """Register-merged rolling estimate vs the exact rolling distinct."""
    from postgresql_transfer_tool_spark.operators.product_analytics import (
        ROLLING_DAYS,
        active_users_rolling,
        active_users_rolling_hll_det,
    )

    exact = {
        r["day"]: r[f"wau_{ROLLING_DAYS}d"]
        for r in active_users_rolling(spark, sf_dir).collect()
    }
    est = {
        r["day"]: r["ndv_hll"]
        for r in active_users_rolling_hll_det(spark, sf_dir).collect()
    }
    assert set(exact) == set(est)
    for day, ex in exact.items():
        assert abs(est[day] - ex) <= max(3, 0.15 * ex), (day, ex, est[day])


def test_hash_sample_quantiles_near_exact_deciles(spark, sf_dir):
    """Sample deciles land near the exact equi-depth boundaries: the
    empirical CDF of each estimated boundary must be within
    ~4/sqrt(k) of its target decile (k=256 → ±0.25 worst-case at the
    tiny sf0.001 fixture where k_eff == group size makes it exact;
    keep the loose bound so the test also holds at larger SFs)."""
    from pyspark.sql import functions as F

    from postgresql_transfer_tool_spark.operators.approx import quantiles_hash_sample

    est = quantiles_hash_sample(spark, sf_dir).collect()
    assert len(est) == 45  # 5 event types x 9 deciles
    vals = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sort_array(F.collect_list("value")).alias("vs"),
        )
        .collect()
    )
    by_type = {r["event_type"]: (r["n"], r["vs"]) for r in vals}
    for r in est:
        n, vs = by_type[r["event_type"]]
        cdf = sum(1 for v in vs if v <= r["est_boundary"]) / n
        assert abs(cdf - r["decile"] / 10) <= 0.25, (r, cdf)


def test_correlation_matrix_matches_builtin_corr(spark, sf_dir):
    """The exact-moment pairwise r agrees with Spark's built-in corr
    (streaming accumulation) to float tolerance, for every pair."""
    from pyspark.sql import functions as F

    from postgresql_transfer_tool_spark.operators.stats import (
        _CM_PAIRS,
        correlation_matrix_lineitem,
    )

    got = {
        (r["col_x"], r["col_y"]): r["pearson_r"]
        for r in correlation_matrix_lineitem(spark, sf_dir).collect()
    }
    assert set(got) == set(_CM_PAIRS)
    li = load_table(spark, sf_dir, "lineitem")
    ref = li.agg(
        *[F.corr(a, b).alias(f"{a}:{b}") for a, b in _CM_PAIRS]
    ).collect()[0]
    for a, b in _CM_PAIRS:
        assert abs(got[(a, b)] - ref[f"{a}:{b}"]) < 1e-9, (a, b)


def test_hll_deterministic_partitioning_invariant(spark, sf_dir):
    """The register sums are exact integers and registers merge by MAX,
    so the HLL output must be BIT-identical under different shuffle
    partitionings — the property that makes the sketch verifiable at
    any cluster size."""
    from postgresql_transfer_tool_spark.operators.approx import ndv_hll_deterministic

    def run():
        return sorted(
            (r["event_type"], r["m_nonzero"], r["reg_sum_scaled"], r["ndv_hll"])
            for r in ndv_hll_deterministic(spark, sf_dir).collect()
        )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = run()
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        b = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b
