"""Sessionization determinism under (user_id, ts) ties (VERDICT r1 #9).

The r1 bug class: the cumulative-sum window ordered by ts alone while
session-marking ordered by (ts, event_id) — any duplicate timestamp at a
session boundary made session assignment engine- (and run-)dependent.
Both windows now tie-break on event_id; these tests plant adversarial
duplicate timestamps and assert Spark ≡ DuckDB on synthetic fixtures.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime, timedelta

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from postgresql_transfer_tool_spark.operators import registry
from postgresql_transfer_tool_spark.operators.incremental import (
    sessionization_gap_30m,
)
from postgresql_transfer_tool_spark.testing import canon_rows

BASE = datetime(2024, 1, 1)

#: minute offsets straddling the 30-min gap: 29/30/31 probe the boundary,
#: repeats in the pool make identical-ts collisions likely.
_MINUTE_POOL = [0, 0, 10, 29, 30, 31, 60, 60, 61, 91, 120, 120]


def _run_both(spark, rows: list[tuple[int, int, int]]):
    """rows = (event_id, user_id, minutes); returns (spark, duck) canon."""
    tmp = tempfile.mkdtemp(prefix="sess_prop_")
    try:
        df = spark.createDataFrame(
            [
                (eid, uid, BASE + timedelta(minutes=m))
                for eid, uid, m in rows
            ],
            "event_id long, user_id long, ts timestamp",
        )
        df.coalesce(1).write.parquet(os.path.join(tmp, "events.parquet"))
        sdf = sessionization_gap_30m(spark, tmp)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"'{os.path.join(tmp, 'events.parquet')}/*.parquet'"
        )
        cur = con.execute(registry.ORACLES["sessionization_gap_30m"])
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        con.close()
        return canon_rows(srows, scols), canon_rows(drows, dcols)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_sessionization_boundary_ties_deterministic(spark):
    """Hand-built worst case: duplicate timestamps exactly at a session
    boundary, event_ids deliberately out of timestamp order."""
    rows = [
        # user 1: tie at t=0 (ids reversed), boundary gap to t=31
        (5, 1, 0), (3, 1, 0), (7, 1, 31), (6, 1, 31),
        # user 2: tie exactly 30 min after start (gap == 30m: same session)
        (10, 2, 0), (11, 2, 30), (12, 2, 30),
        # user 3: three-way tie then a new session
        (20, 3, 60), (21, 3, 60), (22, 3, 60), (23, 3, 120),
    ]
    s, d = _run_both(spark, rows)
    assert s == d


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from(_MINUTE_POOL)),
        min_size=1,
        max_size=25,
    )
)
def test_sessionization_property_spark_equals_duckdb(spark, data):
    rows = [(i, uid, m) for i, (uid, m) in enumerate(data)]
    s, d = _run_both(spark, rows)
    assert s == d
