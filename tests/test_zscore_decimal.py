"""Regression for the z-score decimal-overflow divergence (ADVICE r3).

Before the fix, the daily sum ``ds`` was the widened decimal(28,4), so
``ds*ds`` hit Spark's 38-digit precision cap and was ROUNDED at scale 6,
while the DuckDB oracle kept the product exact at scale 8 — oracle
parity held only because the committed fixtures carry <=2 fractional
digits. This test synthesizes events whose daily sums have nonzero
3rd/4th fractional digits (the exact failure mode) and asserts the
Spark query still hash-matches the oracle bit-for-bit.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from postgresql_transfer_tool_spark.operators import registry
from postgresql_transfer_tool_spark.testing import compare_query, duckdb_connection

registry.load_all()


def _write_events(tmp_path) -> str:
    # values chosen so daily sums land on .0007/.1234-style 4-decimal
    # tails, and large enough that sums of squares stress precision
    rows = []
    base = 1_699_920_000_000_000  # us epoch, midnight-aligned (19675 days)
    day_us = 86_400_000_000
    vals = [1234.5678, 9876.5433, 0.0001, 55555.1239, 313.3331, 77.7777]
    for d in range(14):
        for i, v in enumerate(vals):
            rows.append(
                {
                    "event_id": d * 100 + i,
                    "ts": base + d * day_us + i * 3_600_000_000,
                    "user_id": i,
                    "event_type": "purchase" if i % 2 else "click",
                    "value": v + d * 1111.1117,
                    "props": "{}",
                }
            )
    table = pa.table(
        {
            "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
            "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
            "value": pa.array([r["value"] for r in rows], pa.float64()),
            "props": pa.array([r["props"] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(str(tmp_path), "events.parquet"))
    return str(tmp_path)


def test_zscore_exact_at_four_fractional_digits(spark, tmp_path):
    sf_dir = _write_events(tmp_path)
    con = duckdb_connection(sf_dir, tables=("events",))
    try:
        name = "timeseries_anomaly_zscore"
        res = compare_query(
            spark, con, name, registry.QUERIES[name], registry.ORACLES[name], sf_dir
        )
        assert res.ok, f"{name}: " + "; ".join(res.problems)
        assert res.n_rows == 14 * 2  # 14 days x 2 event types
    finally:
        con.close()
