"""Property test for the O2 bug class (SURVEY.md §4, §5 point 5).

The reference paginates with OFFSET and no ORDER BY
(transfer_data_script.py:109-113) — PostgreSQL may repeat or skip rows
across chunks. The engine's three scan strategies must all yield the
same multiset:

  full scan ≡ ordered-offset pagination ≡ partition-range scan
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from postgresql_transfer_tool_spark.catalog import load_table


def _multiset(df):
    return sorted(tuple(r) for r in df.collect())


@settings(max_examples=5, deadline=None)
@given(page_size=st.integers(min_value=7, max_value=997))
def test_ordered_pagination_equals_full_scan(page_size):
    # session fixtures aren't available inside @given — use the active one
    from postgresql_transfer_tool_spark.session import get_spark

    spark = get_spark("pagination-prop")
    sf_dir = "/root/testdata/sf0.001"
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    total = orders.count()
    full = _multiset(orders)

    pages = []
    for off in range(0, total, page_size):
        pages.extend(
            _multiset(orders.orderBy("o_orderkey").offset(off).limit(page_size))
        )
    assert sorted(pages) == full


def test_partition_range_scan_equals_full_scan(spark, sf_dir):
    """The partitioned-read strategy (what replaces OFFSET for bulk copy):
    disjoint PK-range predicates over the same table."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).collect()[0]
    n_parts = 7
    step = (hi - lo + n_parts) // n_parts
    chunks = []
    for i in range(n_parts):
        a, b = lo + i * step, lo + (i + 1) * step
        pred = (F.col("o_orderkey") >= a) & (F.col("o_orderkey") < b)
        if i == n_parts - 1:
            pred = F.col("o_orderkey") >= a
        chunks.extend(_multiset(orders.filter(pred)))
    assert sorted(chunks) == _multiset(orders)


def test_repartitioned_scan_is_stable_multiset(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    assert _multiset(li.repartition(13)) == _multiset(li)