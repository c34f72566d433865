"""Bounded session memos: eviction must release block-manager storage.

VERDICT r6 "What's wrong" #1: the plain-dict session memos pinned one
checkpointed RDD per (applicationId, sf_dir) forever — a long-lived
session sweeping many datasets accumulated unreleasable blocks. The
CheckpointMemo bounds entries with LRU eviction and unpersists the
backing RDDs of every evicted DataFrame (including lineage-hidden
extras like the shingle memo's pre-explode checkpoint).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresql_transfer_tool_spark.functions.memo import (
    CheckpointMemo,
    unpersist_checkpoints,
)


def _persistent_rdd_ids(spark) -> set[int]:
    m = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in m.keySet().toArray()}


def _checkpointed(spark, tag: int):
    """A small MATERIALIZED localCheckpoint (eager) so its blocks are
    persisted immediately — eviction must remove exactly these."""
    return (
        spark.range(100)
        .select((F.col("id") + tag).alias("v"))
        .localCheckpoint(eager=True)
    )


def test_evicted_entries_unpersist_blocks(spark):
    memo = CheckpointMemo(capacity=2)
    before = _persistent_rdd_ids(spark)

    dfs = {}
    for i in range(4):  # 4 entries through a capacity-2 memo
        snap = _persistent_rdd_ids(spark)
        df = _checkpointed(spark, i)
        created = _persistent_rdd_ids(spark) - snap
        assert created, "eager localCheckpoint should persist blocks"
        dfs[i] = (df, created)
        memo.put(i, df)

    # LRU: entries 0 and 1 evicted, 2 and 3 retained
    assert set(memo.keys()) == {2, 3}
    alive = _persistent_rdd_ids(spark)
    for i in (0, 1):
        assert not (dfs[i][1] & alive), f"entry {i} blocks survived eviction"
    for i in (2, 3):
        assert dfs[i][1] <= alive, f"entry {i} blocks were wrongly released"
    # retained entries still usable
    assert memo.get(2).count() == 100

    # clear() releases the rest
    memo.clear()
    alive = _persistent_rdd_ids(spark)
    for i in (2, 3):
        assert not (dfs[i][1] & alive), f"entry {i} blocks survived clear()"
    assert len(memo) == 0
    # nothing this test created remains
    assert not (_persistent_rdd_ids(spark) - before) & {
        i for _, c in dfs.values() for i in c
    }


def test_get_refreshes_lru_order(spark):
    memo = CheckpointMemo(capacity=2)
    a, b, c = (_checkpointed(spark, t) for t in (10, 20, 30))
    memo.put("a", a)
    memo.put("b", b)
    assert memo.get("a") is a  # refresh 'a' → 'b' becomes LRU
    memo.put("c", c)
    assert set(memo.keys()) == {"a", "c"}


def test_extra_checkpoints_released_with_entry(spark):
    """The shingle-memo shape: the entry's primary DataFrame consumes a
    pre-explode checkpoint through RDD lineage — the pre checkpoint
    never appears in the primary's logical plan, so it must be passed
    as an eviction extra and freed alongside."""
    memo = CheckpointMemo(capacity=1)
    snap = _persistent_rdd_ids(spark)
    pre = _checkpointed(spark, 100)
    pre_ids = _persistent_rdd_ids(spark) - snap
    post = pre.select((F.col("v") * 2).alias("w")).localCheckpoint(eager=True)
    memo.put("x", post, pre)
    memo.put("y", _checkpointed(spark, 200))  # evicts x
    assert not (pre_ids & _persistent_rdd_ids(spark)), (
        "pre-explode extra checkpoint leaked on eviction"
    )


def test_operator_memos_are_bounded(spark):
    """Every session memo in the operator modules is a CheckpointMemo
    (not a plain dict) — the class this test pins is 'someone adds a
    new dict cache and reintroduces the leak'."""
    from postgresql_transfer_tool_spark.operators import (
        corpus,
        dedup,
        graph,
        similarity,
    )

    for mod, name in [
        (dedup, "_SHINGLE_CACHE"),
        (dedup, "_LSH_PAIRS_CACHE"),
        (similarity, "_QUANT_CACHE"),
        (corpus, "_TOKS_CACHE"),
        (graph, "_EDGE_CACHE"),
    ]:
        assert isinstance(getattr(mod, name), CheckpointMemo), f"{mod.__name__}.{name}"


def test_unpersist_checkpoints_is_safe_on_plain_df(spark):
    # no LogicalRDD leaves → no-op, never raises
    assert unpersist_checkpoints(spark.range(10).toDF("id")) == 0


def test_put_overwrite_unpersists_replaced_entry(spark):
    # ADVICE r7: put() on a present key must free the replaced entry's
    # blocks instead of silently dropping the handles.
    memo = CheckpointMemo(capacity=4)
    snap = _persistent_rdd_ids(spark)
    old = _checkpointed(spark, 0)
    old_blocks = _persistent_rdd_ids(spark) - snap
    assert old_blocks
    memo.put("k", old)

    new = _checkpointed(spark, 1)
    memo.put("k", new)
    alive = _persistent_rdd_ids(spark)
    assert not (old_blocks & alive), "replaced entry's blocks leaked"
    assert memo.get("k").count() == 100  # replacement unharmed
    memo.clear()


def test_put_overwrite_keeps_shared_handles(spark):
    # re-putting the SAME DataFrame (e.g. refreshing extras) must not
    # unpersist the handle being re-inserted.
    memo = CheckpointMemo(capacity=4)
    df = _checkpointed(spark, 7)
    memo.put("k", df)
    memo.put("k", df)  # idempotent re-put
    assert memo.get("k").count() == 100
    memo.clear()

def test_put_overwrite_keeps_blocks_shared_via_lineage(spark):
    # r8 ADVICE #4: the replacement may READ the replaced entry's
    # checkpoint blocks through a *different* DataFrame handle (a derived
    # plan whose LogicalRDD leaves are the old entry's). Overwrite must
    # compare by checkpoint RDD ids, not handle identity — unpersisting
    # the old handle would tear blocks the replacement still scans.
    from postgresql_transfer_tool_spark.functions.memo import checkpoint_rdd_ids

    memo = CheckpointMemo(capacity=4)
    snap = _persistent_rdd_ids(spark)
    base = _checkpointed(spark, 3)
    base_blocks = _persistent_rdd_ids(spark) - snap
    assert base_blocks
    memo.put("k", base)

    derived = base.select((F.col("v") * 2).alias("w"))  # new handle, same leaf
    assert checkpoint_rdd_ids(derived) & checkpoint_rdd_ids(base)
    memo.put("k", derived)
    alive = _persistent_rdd_ids(spark)
    assert base_blocks <= alive, "shared-lineage blocks were torn on overwrite"
    assert memo.get("k").count() == 100  # derived plan still computable
    memo.clear()
