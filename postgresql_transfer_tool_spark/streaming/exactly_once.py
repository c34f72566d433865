"""Idempotent / exactly-once-ish sink via foreachBatch + epoch ledger.

SURVEY.md §7.4 hard-part 1: Spark cannot replicate the reference's
per-table ACID commit against a remote RDBMS (K5/K6). The engine's
upgrade path is an idempotent sink: every micro-batch carries a
monotonically increasing epoch id; the sink writes the batch to an
epoch-scoped location, then records the epoch in a ledger — atomically,
write-then-rename. A replayed epoch (failure/retry, which Structured
Streaming's at-least-once delivery permits) is detected in the ledger
and skipped, making the end-to-end pipeline effectively exactly-once
for an idempotent target.

For a real RDBMS target the same pattern holds with a staging table +
``INSERT ... SELECT`` guarded by an epochs table in one transaction.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame


class EpochLedger:
    """Committed-epoch record, atomic via write-then-rename."""

    def __init__(self, path: str) -> None:
        self.path = path

    def committed(self) -> set[int]:
        if not os.path.exists(self.path):
            return set()
        with open(self.path) as f:
            return set(json.load(f))

    def commit(self, epoch_id: int) -> None:
        epochs = self.committed()
        epochs.add(epoch_id)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sorted(epochs), f)
        os.replace(tmp, self.path)


class IdempotentParquetSink:
    """foreachBatch target: parquet partition per epoch, ledger-guarded."""

    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir
        self.ledger = EpochLedger(os.path.join(out_dir, "_epochs.json"))
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id in self.ledger.committed():
            return  # replayed batch: already durable, skip (idempotence)
        batch_df.write.mode("overwrite").parquet(
            os.path.join(self.out_dir, f"epoch={epoch_id}")
        )
        self.ledger.commit(epoch_id)  # commit point: rename is atomic

    def read_all(self, spark) -> DataFrame:
        paths = [
            os.path.join(self.out_dir, f"epoch={e}")
            for e in sorted(self.ledger.committed())
        ]
        return spark.read.parquet(*paths)
