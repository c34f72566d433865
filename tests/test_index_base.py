"""Shared persistent-index machinery (functions/index_base.py):
generation swap recoverability (r8 ADVICE #3), tombstone/stamp side
relations, and the single-writer lock primitive."""

from __future__ import annotations

import os
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from postgresql_transfer_tool_spark.functions.index_base import (
    ConcurrentIndexWriteError,
    add_tombstones,
    apply_tombstones,
    expired_ids,
    index_root,
    record_stamps,
    recover_swap,
    single_writer,
    swap_table,
    table_location,
    tombstones,
)


def _external(spark, name: str, root: str, sub: str, n: int):
    spark.range(n).write.option("path", os.path.join(root, sub)).saveAsTable(name)


def test_swap_table_and_crash_recovery(spark):
    root = tempfile.mkdtemp(prefix="idxbase_")
    live = f"idxb_live_{uuid.uuid4().hex[:8]}"
    tmp = f"{live}_compacting"
    _external(spark, live, root, "gen1", 10)
    _external(spark, tmp, root, "gen2", 20)

    assert table_location(spark, live).rstrip("/").endswith("gen1")
    assert index_root(spark, live) == root

    swap_table(spark, live, tmp)
    assert spark.table(live).count() == 20  # new generation live
    assert not spark.catalog.tableExists(tmp)
    assert not spark.catalog.tableExists(f"{live}_retired")

    # crash window between the two renames: live is gone, retired holds
    # the data — recover_swap restores the handle
    spark.sql(f"ALTER TABLE {live} RENAME TO {live}_retired")
    assert recover_swap(spark, live) is True
    assert spark.table(live).count() == 20
    assert recover_swap(spark, live) is False  # healthy state: no-op
    spark.sql(f"DROP TABLE {live}")


def test_tombstones_accumulate_distinct_and_apply_broadcast(spark):
    root = tempfile.mkdtemp(prefix="idxbase_")
    t = f"idxb_data_{uuid.uuid4().hex[:8]}"
    _external(spark, t, root, "data", 100)

    assert tombstones(spark, t) is None  # nothing deleted yet: no table
    add_tombstones(spark, t, spark.range(5).select(F.col("id")))
    add_tombstones(spark, t, spark.range(3, 8).select(F.col("id")))  # overlap
    tombs = tombstones(spark, t)
    assert {r.id for r in tombs.collect()} == set(range(8))
    assert tombs.count() == 8  # overlapping retractions stay distinct

    survived = apply_tombstones(spark.table(t), tombs, "id")
    assert survived.count() == 92
    # the anti-join broadcasts the tombstone side (index side unshuffled)
    plan = survived._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    stem = t.rsplit("_", 1)[0]
    for side in (f"{stem}_tombstones", f"{stem}_stamps"):
        spark.sql(f"DROP TABLE IF EXISTS {side}")
    spark.sql(f"DROP TABLE {t}")


def test_stamps_ttl_latest_wins(spark):
    root = tempfile.mkdtemp(prefix="idxbase_")
    t = f"idxb_ttl_{uuid.uuid4().hex[:8]}"
    _external(spark, t, root, "data", 10)

    assert expired_ids(spark, t, 99).count() == 0  # no ledger: nothing expires
    record_stamps(spark, t, spark.range(0, 6).select("id"), stamp=0)
    record_stamps(spark, t, spark.range(4, 8).select("id"), stamp=1)
    # ids 4,5 were re-ingested at stamp 1 — their TTL refreshed
    assert {r.id for r in expired_ids(spark, t, 1).collect()} == {0, 1, 2, 3}
    assert {r.id for r in expired_ids(spark, t, 2).collect()} == set(range(8))
    stem = t.rsplit("_", 1)[0]
    for side in (f"{stem}_tombstones", f"{stem}_stamps"):
        spark.sql(f"DROP TABLE IF EXISTS {side}")
    spark.sql(f"DROP TABLE {t}")


def test_single_writer_lock_is_exclusive_and_released(spark):
    root = tempfile.mkdtemp(prefix="idxbase_")
    t = f"idxb_lock_{uuid.uuid4().hex[:8]}"
    _external(spark, t, root, "data", 1)

    with single_writer(spark, t, op="first"):
        assert os.path.exists(os.path.join(root, "_writer.lock"))
        with pytest.raises(ConcurrentIndexWriteError, match="op=first"):
            with single_writer(spark, t, op="second"):
                pass
    # released on exit — a new writer acquires; released even on error
    with pytest.raises(RuntimeError, match="boom"):
        with single_writer(spark, t, op="crashing"):
            raise RuntimeError("boom")
    assert not os.path.exists(os.path.join(root, "_writer.lock"))
    spark.sql(f"DROP TABLE {t}")
