"""applyInPandasWithState: streaming state must converge to the batch
ground truth after all micro-batches are processed."""

from __future__ import annotations

import math

from postgresql_transfer_tool_spark.streaming.incremental import prepare_landing
from postgresql_transfer_tool_spark.streaming.stateful import (
    batch_user_activity,
    streaming_user_activity,
)


def test_stateful_user_activity_converges_to_batch(spark, sf_dir, tmp_path):
    landing = str(tmp_path / "landing")
    prepare_landing(spark, sf_dir, landing)

    q = streaming_user_activity(spark, landing, "t_user_activity")
    try:
        q.processAllAvailable()
        streamed = {
            r["user_id"]: r
            for r in spark.sql(
                "SELECT * FROM t_user_activity"
            ).collect()
        }
    finally:
        q.stop()

    batch = {r["user_id"]: r for r in batch_user_activity(spark, landing).collect()}
    assert set(streamed) == set(batch)
    for uid, b in batch.items():
        s = streamed[uid]
        assert s["event_count"] == b["event_count"], uid
        # float sum tolerance: streaming folds in micro-batch order
        assert math.isclose(s["total_value"], b["total_value"], rel_tol=1e-9), uid
        assert s["last_seen"] == b["last_seen"], uid
