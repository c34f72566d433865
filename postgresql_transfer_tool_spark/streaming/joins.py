"""Stream-stream joins with watermark-bounded state.

The missing piece between the engine's streaming aggregations and its
batch join surface: joining two *unbounded* streams. Without bounds the
join state grows forever; Structured Streaming makes the state finite
through (a) watermarks on both sides and (b) an event-time range
condition relating the two streams — together they let the engine
evict state older than `watermark + range`.

At 100 TB/day the state store holds only the range window per key, and
the shuffle partitions both streams on the join key once — the same
co-partitioned shape as a batch shuffle join, amortized continuously.

Batch equivalence: for a finite input that has fully arrived, the
stream-stream inner join emits exactly the rows of the batch join with
the same ON clause — asserted in tests/test_streaming_join.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: how out-of-order events may arrive before being dropped
_WATERMARK = "1 hour"
#: how far back an error is attributed to a subsequent purchase
_ATTRIBUTION = "30 minutes"


def purchase_error_attribution(purchases: DataFrame, errors: DataFrame) -> DataFrame:
    """Inner join: each purchase paired with the same user's errors in
    the preceding 30 minutes (the streaming form of the as-of/range
    join family — ``asof_join_purchase_last_error`` is its batch
    analog).

    Works identically on streaming or batch inputs — the query shape is
    the contract; only state management differs.
    """
    p = purchases.select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
    )
    e = errors.select(
        F.col("event_id").alias("e_event_id"),
        F.col("user_id").alias("e_user_id"),
        F.col("ts").alias("e_ts"),
    )
    if purchases.isStreaming:
        p = p.withWatermark("p_ts", _WATERMARK)
    if errors.isStreaming:
        e = e.withWatermark("e_ts", _WATERMARK)
    return p.join(
        e,
        F.expr(
            f"""p_user_id = e_user_id
            AND e_ts >= p_ts - INTERVAL {_ATTRIBUTION}
            AND e_ts <= p_ts"""
        ),
    ).select("p_event_id", "p_user_id", "p_ts", "e_event_id", "e_ts")


def purchase_error_attribution_outer(
    purchases: DataFrame, errors: DataFrame
) -> DataFrame:
    """LEFT OUTER stream-stream join: every purchase, paired with the
    same user's errors in the preceding 30 minutes OR NULL-extended if
    none arrived. The semantically hard streaming case: the engine can
    only emit the NULL row once the error-side watermark has passed the
    purchase's match window — before that, a matching error could still
    arrive. So outer results trail the watermark by design: purchases
    newer than (max event time - watermark) stay in state, unemitted,
    until later input advances the clock. State stays bounded exactly
    as in the inner form (watermark + range condition ⇒ eviction);
    outer-ness changes only what is emitted at eviction time, not what
    is stored. Batch equivalence on fully-arrived input modulo that
    trailing window is asserted in tests/test_streaming_join.py."""
    p = purchases.select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
    )
    e = errors.select(
        F.col("event_id").alias("e_event_id"),
        F.col("user_id").alias("e_user_id"),
        F.col("ts").alias("e_ts"),
    )
    if purchases.isStreaming:
        p = p.withWatermark("p_ts", _WATERMARK)
    if errors.isStreaming:
        e = e.withWatermark("e_ts", _WATERMARK)
    return p.join(
        e,
        F.expr(
            f"""p_user_id = e_user_id
            AND e_ts >= p_ts - INTERVAL {_ATTRIBUTION}
            AND e_ts <= p_ts"""
        ),
        "leftOuter",
    ).select("p_event_id", "p_user_id", "p_ts", "e_event_id", "e_ts")
