"""Streaming CDC upsert: foreachBatch + merge_into maintaining a
continuously-updated parquet target.

The composition the modern form of the reference's transfer loop needs:
instead of truncate-and-reload (``transfer_data_script.py``), each
micro-batch of changed rows MERGEs into the target — updates overwrite,
new keys insert, untouched keys survive. State after all batches must
equal applying the batches sequentially in batch mode.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresql_transfer_tool_spark.catalog import load_table
from postgresql_transfer_tool_spark.operators.merge import merge_into


def test_foreachbatch_merge_maintains_target(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    # initial target: the "already migrated" snapshot (keys % 3 == 0)
    target_path = str(tmp_path / "target")
    orders.filter(F.col("o_orderkey") % 3 == 0).write.parquet(target_path)

    # CDC landing: two batch files — updates to existing keys (priced up)
    # and brand-new keys
    landing = str(tmp_path / "cdc")
    b1 = orders.filter(F.col("o_orderkey") % 3 == 1)
    b2 = orders.filter((F.col("o_orderkey") % 3 == 0) & (F.col("o_orderkey") % 2 == 0)).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1000.0
    )
    b1.write.parquet(landing)  # batch 1: inserts
    b2.write.mode("append").parquet(landing)  # batch 2: updates

    schema = orders.schema
    stream = spark.readStream.schema(schema).parquet(landing)

    def apply_batch(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        current = spark.read.parquet(target_path)
        merged = merge_into(
            current,
            batch_df,
            key="o_orderkey",
            update_cols=["o_totalprice", "o_orderstatus"],
        ).drop("action")
        # collect-and-rewrite through a staging dir: the source of the
        # read is also the write target (same pattern as transfer.py's
        # staged-atomic copy)
        staging = target_path + ".staging"
        merged.write.mode("overwrite").parquet(staging)
        import shutil

        shutil.rmtree(target_path)
        shutil.move(staging, target_path)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    final = spark.read.parquet(target_path)
    # expected state: snapshot ∪ inserts, with updated prices where the
    # update batch touched (both CDC files may land in ONE micro-batch;
    # merge semantics make the outcome identical either way)
    expected = (
        orders.filter(F.col("o_orderkey") % 3 == 0)
        .join(b2.select("o_orderkey"), "o_orderkey", "left_anti")
        .unionByName(b1)
        .unionByName(b2)
    )
    assert final.count() == expected.count()
    a = sorted(map(tuple, final.select(*orders.columns).collect()))
    b = sorted(map(tuple, expected.select(*orders.columns).collect()))
    assert a == b
