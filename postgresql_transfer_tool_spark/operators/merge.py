"""MERGE / upsert emulation (Delta-style ``MERGE INTO`` without a
transactional table format).

The reference loads every table with truncate-and-reload
(``transfer_data_script.py`` drops and refills); real warehouses apply
CDC batches with MERGE semantics instead. A naive full-outer join would
shuffle the entire target (Spark cannot broadcast any side of a full
outer join), so ``merge_into`` decomposes exactly like Delta's merge
does: the matched/kept rows come from a broadcast LEFT join (the wide
target never moves — the CDC batch, almost always tiny relative to the
table, is the build side), and the inserts from a LEFT ANTI join that
shuffles only the target's key column projection, never its payload.

``merge_into`` is the reusable engine API; the registered query drives
it through a deterministic snapshot/batch split of ``orders`` so the
driver can oracle-check full MERGE semantics (update + insert + keep)
against DuckDB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key: str,
    update_cols: Sequence[str],
    broadcast_source: bool = True,
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE ``source`` into ``target`` on ``key``.

    WHEN MATCHED: take ``update_cols`` from the source row.
    WHEN MATCHED AND source.``delete_col``: drop the target row
    (WHEN MATCHED THEN DELETE — only when ``delete_col`` is given; a
    delete marker for an absent key is a no-op, CDC convention).
    WHEN NOT MATCHED (source only): insert the source row.
    WHEN NOT MATCHED BY SOURCE (target only): keep the target row.

    Returns the merged relation plus an ``action`` audit column
    (update / insert / keep); deleted rows are absent from the result.
    Columns outside ``update_cols`` must exist in both sides (inserted
    rows take them from the source); ``delete_col`` is a source-only
    boolean and never appears in the output.

    Shape (the scale-critical part): matched/kept rows are a broadcast
    LEFT join — the full-width target is never shuffled; inserts are a
    LEFT ANTI join of the source against the target's *key projection*
    (one narrow column of the target moves, not the table). Spark
    cannot broadcast a full-outer join, so the single-join formulation
    would silently sort-merge-shuffle 100 TB.

    ``broadcast_source=True`` is a CALLER CONTRACT: the source must be
    bounded by construction (a CDC micro-batch, a bounded key range) —
    the hint exists because Catalyst's size estimate for a derived
    batch is often unknown, exactly when a hint is justified. Pass
    ``broadcast_source=False`` whenever the source can grow with the
    data; the plain join lets AQE pick broadcast vs shuffle at runtime.
    The registry demo queries synthesize their batches from base
    tables, so the plan-sweep (``tests/test_plans.py`` broadcast-hint
    sweep) carries an explicit allowlist entry for them citing this
    contract.
    """
    t = target.alias("t")
    s = (F.broadcast(source) if broadcast_source else source).alias("s")
    matched = F.col(f"s.{key}").isNotNull()

    def pick(c: str) -> Column:
        if c in update_cols:
            return F.when(matched, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        return F.col(f"t.{c}").alias(c)

    upserted = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "left")
    if delete_col is not None:
        # matched deletes drop out here; the same filter shape keeps the
        # broadcast-left-join plan (the full-width target still never
        # shuffles — the delete test is a per-row predicate on it).
        upserted = upserted.filter(
            ~(matched & F.coalesce(F.col(f"s.{delete_col}"), F.lit(False)))
        )
    upserted = upserted.select(
        *[pick(c) for c in target.columns],
        F.when(matched, F.lit("update")).otherwise(F.lit("keep")).alias("action"),
    )
    ins_src = (
        source.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
        if delete_col is not None
        else source
    )
    inserts = ins_src.join(
        target.select(key), on=key, how="left_anti"
    ).select(*target.columns, F.lit("insert").alias("action"))
    return upserted.unionByName(inserts)


@query(
    "merge_upsert_orders",
    oracle="""
    WITH target AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 10 < 8
    ),
    batch AS (
      SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             o_totalprice + 100.0 AS o_totalprice
      FROM orders WHERE o_orderkey % 10 >= 5
    )
    SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
           COALESCE(t.o_custkey, s.o_custkey) AS o_custkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
                ELSE t.o_orderstatus END AS o_orderstatus,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                ELSE t.o_totalprice END AS o_totalprice,
           CASE WHEN t.o_orderkey IS NULL THEN 'insert'
                WHEN s.o_orderkey IS NOT NULL THEN 'update'
                ELSE 'keep' END AS action
    FROM target t FULL OUTER JOIN batch s ON t.o_orderkey = s.o_orderkey
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE a simulated CDC batch (keys ending 5-9, repriced +100,
    status 'U') into an orders snapshot (keys ending 0-7): keys 5-7
    update, 8-9 insert, 0-4 keep. The +100.0 reprice is a single IEEE
    add on identical inputs, so values hash-match bit-exactly."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    target = orders.filter(F.col("o_orderkey") % 10 < 8)
    batch = orders.filter(F.col("o_orderkey") % 10 >= 5).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + F.lit(100.0)).alias("o_totalprice"),
    )
    return merge_into(
        target, batch, "o_orderkey", update_cols=("o_orderstatus", "o_totalprice")
    )


@query(
    "merge_scd2_customer_balance",
    oracle="""
    WITH current AS (
      SELECT c_custkey, c_acctbal, 0 AS version
      FROM customer
    ),
    changes AS (
      SELECT c_custkey, c_acctbal + 50.0 AS c_acctbal
      FROM customer WHERE c_custkey % 20 = 0
    )
    SELECT c_custkey, c_acctbal, version, is_current FROM (
      SELECT c.c_custkey, c.c_acctbal, c.version,
             (ch.c_custkey IS NULL) AS is_current
      FROM current c LEFT JOIN changes ch ON c.c_custkey = ch.c_custkey
      UNION ALL
      SELECT c_custkey, c_acctbal, 1 AS version, TRUE AS is_current
      FROM changes
    ) v
    """,
)
def merge_scd2_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 merge: balance changes for every 20th customer close
    the current version (is_current=false) and append a new version row
    — the expire-and-append union shape, one broadcast join + union."""
    current = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", F.lit(0).alias("version")
    )
    changes = (
        current.filter(F.col("c_custkey") % 20 == 0)
        .select("c_custkey", (F.col("c_acctbal") + F.lit(50.0)).alias("c_acctbal"))
    )
    changed_keys = changes.select(F.col("c_custkey").alias("ch_custkey"))
    expired = current.join(
        F.broadcast(changed_keys),
        current.c_custkey == changed_keys.ch_custkey,
        "left",
    ).select(
        "c_custkey",
        "c_acctbal",
        "version",
        F.col("ch_custkey").isNull().alias("is_current"),
    )
    appended = changes.select(
        "c_custkey",
        "c_acctbal",
        F.lit(1).alias("version"),
        F.lit(True).alias("is_current"),
    )
    return expired.unionAll(appended)


@query(
    "merge_cdc_with_deletes",
    oracle="""
    WITH target AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 10 < 8
    ),
    batch AS (
      SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             o_totalprice + 100.0 AS o_totalprice,
             (o_orderkey % 10 = 7 OR o_orderkey % 10 = 9) AS is_del
      FROM orders WHERE o_orderkey % 10 >= 5
    )
    SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
           COALESCE(t.o_custkey, s.o_custkey) AS o_custkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
                ELSE t.o_orderstatus END AS o_orderstatus,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                ELSE t.o_totalprice END AS o_totalprice,
           CASE WHEN t.o_orderkey IS NULL THEN 'insert'
                WHEN s.o_orderkey IS NOT NULL THEN 'update'
                ELSE 'keep' END AS action
    FROM target t FULL OUTER JOIN batch s ON t.o_orderkey = s.o_orderkey
    WHERE NOT COALESCE(s.is_del, FALSE)
    """,
)
def merge_cdc_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with WHEN MATCHED THEN DELETE: a simulated CDC batch where
    keys ending 5-6 are updates, key-ending-8 rows are inserts, and the
    delete marker covers a matched key (ending 7 — row removed) and an
    absent key (ending 9 — no-op, the CDC convention for a delete that
    raced ahead of the snapshot). Same broadcast-left-join shape as
    merge_upsert_orders: the full-width target never shuffles; the
    delete test is a per-row predicate on the joined row.

    Reference analog: the reference applies PG logical-replication-style
    change batches row-by-row (pg-data-transfer.py's per-row upsert
    loop); DELETE events are the third verb of that stream."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    target = orders.filter(F.col("o_orderkey") % 10 < 8)
    batch = (
        orders.filter(F.col("o_orderkey") % 10 >= 5)
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") + 100.0)
        .withColumn(
            "is_del",
            (F.col("o_orderkey") % 10 == 7) | (F.col("o_orderkey") % 10 == 9),
        )
    )
    return merge_into(
        target,
        batch,
        key="o_orderkey",
        update_cols=["o_orderstatus", "o_totalprice"],
        delete_col="is_del",
    )
