"""Reference-derived migration fixture tests (FIXTURES.md §B).

Synthesizes the reference's motivating table
(``/root/reference/event-table.sql:5-19`` — analytics_analyticsevent)
with SEEDED VIOLATIONS (duplicate ids, orphaned user_ids, NULLs in NOT
NULL columns) and asserts the generic validators catch every one
(SURVEY.md §5 point 3) — plus the JSONB carrier, BOOLEAN-default and
serial-HWM semantics of §1.3 on the same data.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from postgresql_transfer_tool_spark.catalog import ForeignKey, TableInfo
from postgresql_transfer_tool_spark.transfer import TransferPipeline

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),           # BIGSERIAL PK
        T.StructField("created", T.TimestampType(), False),
        T.StructField("modified", T.TimestampType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("sent_at", T.TimestampType(), False),
        T.StructField("organization_id", T.LongType(), True),   # nullable FK
        T.StructField("user_id", T.LongType(), True),           # required FK (violated)
        T.StructField("identify", T.StringType(), True),        # JSONB carrier
        T.StructField("properties", T.StringType(), True),      # JSONB carrier
        T.StructField("synced_with_posthog", T.BooleanType(), True),
        T.StructField("last_local_modified_at", T.TimestampType(), True),
    ]
)


@pytest.fixture(scope="module")
def event_source(spark, tmp_path_factory):
    """analytics_analyticsevent + users parent, with seeded violations:
    ids 1,2 duplicated; user_id 999 orphaned; one NULL user_id."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(1, 101):
        rows.append(
            (
                i if i > 2 else 1,  # ids 1,1,1 → duplicate PK
                t0, t0, f"event_{i}", t0,
                None if i % 5 == 0 else 1,
                999 if i == 50 else (None if i == 51 else (i % 10) + 1),
                '{"source": "web", "v": %d}' % i,
                '{"k": %d}' % i,
                None if i % 3 == 0 else (i % 2 == 0),
                t0 if i % 4 == 0 else None,
            )
        )
    src = str(tmp_path_factory.mktemp("event_src"))
    spark.createDataFrame(rows, EVENT_SCHEMA).write.parquet(
        os.path.join(src, "analytics_analyticsevent.parquet")
    )
    users = spark.createDataFrame(
        [(u, f"user_{u}") for u in range(1, 11)], "user_id long, user_name string"
    )
    users.write.parquet(os.path.join(src, "users.parquet"))
    return src


EVENT_CATALOG = {
    "users": TableInfo("users", primary_key=("user_id",)),
    "analytics_analyticsevent": TableInfo(
        "analytics_analyticsevent",
        primary_key=("id",),
        foreign_keys=(
            ForeignKey(
                "analytics_analyticsevent", ("user_id",), "users", ("user_id",),
                on_delete="CASCADE",
            ),
        ),
        serial_columns=("id",),
    ),
}


class _EventPipeline(TransferPipeline):
    # the fixture universe is these two tables, not the TPC-H set
    def run(self):
        import postgresql_transfer_tool_spark.catalog as cat

        orig = cat.TABLES
        cat.TABLES = tuple(EVENT_CATALOG)
        try:
            return super().run()
        finally:
            cat.TABLES = orig


def test_seeded_violations_detected(spark, event_source, tmp_path):
    report = _EventPipeline(
        spark, event_source, str(tmp_path / "tgt"), catalog=EVENT_CATALOG
    ).run()
    ev = report.results["analytics_analyticsevent"]
    assert ev.status == "copied"
    # 2 extra rows under id=1 → duplicate-key groups detected
    assert ev.pk_violations >= 1
    # user_id 999 has no parent → exactly one orphan (NULL user_id is skipped)
    assert ev.fk_orphans["analytics_analyticsevent.user_id"] == 1
    # violations must fail the pipeline, not silently pass (§7.4 hard-part 5)
    assert not report.ok
    # FK DDL still emitted with the referential action preserved (C5)
    assert any("ON DELETE CASCADE" in s for s in report.fk_ddl)
    # serial HWM: max(id)=100 → next value 101 (A4/K7)
    assert ev.next_sequence_value == 101


def test_jsonb_and_boolean_default_semantics(spark, event_source):
    df = spark.read.parquet(
        os.path.join(event_source, "analytics_analyticsevent.parquet")
    )
    # JSONB promotion: carrier string → typed struct (SURVEY.md §1.3)
    promoted = df.select(
        F.from_json("identify", "source string, v long").alias("j"),
        F.get_json_object("properties", "$.k").cast("long").alias("k"),
        F.coalesce("synced_with_posthog", F.lit(False)).alias("synced"),
    )
    rows = promoted.collect()
    assert all(r["j"]["source"] == "web" for r in rows)
    assert sorted(r["k"] for r in rows) == list(range(1, 101))
    # BOOLEAN NOT NULL DEFAULT FALSE ingest: no NULLs survive the coalesce
    assert promoted.filter(F.col("synced").isNull()).count() == 0


def test_incremental_flag_filter_on_fixture(spark, event_source):
    """I1 on the real flag column: unsynced = false-or-null flag."""
    df = spark.read.parquet(
        os.path.join(event_source, "analytics_analyticsevent.parquet")
    )
    synced = F.coalesce("synced_with_posthog", F.lit(False))
    unsynced = df.filter(~synced).count()
    synced_n = df.filter(synced).count()
    assert unsynced + synced_n == 100
    assert unsynced > 0 and synced_n > 0
