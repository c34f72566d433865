"""Property tests for the exact-aggregation discipline (functions/exact):
the decimal-sum of arbitrary doubles must equal the Python-decimal
ground truth regardless of partitioning — the invariant every oracle
check rests on."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings, strategies as st

from postgresql_transfer_tool_spark.functions.exact import dsum

finite_doubles = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


def _ground_truth(values: list[float], scale: int = 4) -> float:
    # Decimal(v) is the double's EXACT binary expansion — what both Spark
    # and DuckDB actually cast (the shortest repr would round differently
    # near decimal tie-points; exact binary values never land on a tie,
    # so the rounding mode is moot).
    q = Decimal(1).scaleb(-scale)
    total = sum(Decimal(v).quantize(q, rounding=ROUND_HALF_UP) for v in values)
    return float(total)


@settings(max_examples=10, deadline=None)
@given(st.lists(finite_doubles, min_size=1, max_size=300), st.integers(1, 7))
def test_dsum_matches_decimal_ground_truth_any_partitioning(values, n_parts):
    from postgresql_transfer_tool_spark.session import get_spark

    spark = get_spark("exact-prop")
    df = spark.createDataFrame([(v,) for v in values], "v double").repartition(n_parts)
    got = df.agg(dsum("v", 18, 4).alias("s")).collect()[0]["s"]
    # NB: ground truth quantizes via repr→Decimal (exactly the double's
    # shortest decimal), while Spark casts the binary double — these agree
    # because decimal tie-points are never exactly representable as doubles
    assert got == _ground_truth(values), (got, _ground_truth(values))
