"""Type-mapping tests (SURVEY.md §1.3 table + general scalar surface),
including property-based round-trips (§5 point 5)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from postgresql_transfer_tool_spark.types import (
    create_table_ddl,
    pg_to_spark,
    reflect_schema,
    spark_to_pg,
)


@pytest.mark.parametrize(
    "pg,expected",
    [
        ("bigserial", T.LongType()),           # event-table.sql:6
        ("timestamptz", T.TimestampType()),    # event-table.sql:7-8
        ("timestamp with time zone", T.TimestampType()),
        ("timestamp without time zone", T.TimestampNTZType()),
        ("character varying(255)", T.StringType()),  # event-table.sql:9
        ("bigint", T.LongType()),              # event-table.sql:11-13
        ("jsonb", T.StringType()),             # event-table.sql:15-16 (carrier)
        ("boolean", T.BooleanType()),          # event-table.sql:17
        ("numeric(12,2)", T.DecimalType(12, 2)),
        ("numeric", T.DecimalType(38, 18)),
        ("integer[]", T.ArrayType(T.IntegerType())),
        ("_int4", T.ArrayType(T.IntegerType())),
        ("double precision", T.DoubleType()),
        ("bytea", T.BinaryType()),
        ("uuid", T.StringType()),
        ("sometype_we_never_saw", T.StringType()),  # lossless degradation
    ],
)
def test_pg_to_spark(pg, expected):
    assert pg_to_spark(pg) == expected


def test_reflect_event_table_schema():
    """The reference's motivating DDL (event-table.sql:5-19) reflects to
    the Spark schema documented in FIXTURES.md §B."""
    cols = [
        ("id", "bigserial", False),
        ("created", "timestamptz", False),
        ("name", "character varying(255)", False),
        ("organization_id", "bigint", True),
        ("identify", "jsonb", True),
        ("synced_with_posthog", "boolean", False),
        ("last_local_modified_at", "timestamptz", True),
    ]
    schema = reflect_schema(cols)
    assert schema["id"].dataType == T.LongType() and not schema["id"].nullable
    assert schema["identify"].dataType == T.StringType()
    assert schema["organization_id"].nullable


def test_spark_to_pg_and_ddl():
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("created", T.TimestampType(), False),
            T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
            T.StructField("vec", T.ArrayType(T.FloatType()), True),
        ]
    )
    ddl = create_table_ddl(
        schema, "analytics_event", primary_key=("id",), serial_columns=("id",)
    )
    assert "CREATE TABLE IF NOT EXISTS public.analytics_event" in ddl
    assert "id bigserial NOT NULL" in ddl
    assert "created timestamptz NOT NULL" in ddl
    assert "props jsonb" in ddl
    assert "vec real[]" in ddl
    assert "PRIMARY KEY (id)" in ddl


def test_quoted_identifier_ddl_roundtrip():
    """Reference parity: after-running-script.sql:84-126 handles schema
    \"fde-local\" with quoted identifiers — synthesized DDL must too."""
    from postgresql_transfer_tool_spark.types import quote_ident

    assert quote_ident("lineitem") == "lineitem"  # clean names untouched
    assert quote_ident("fde-local") == '"fde-local"'
    assert quote_ident("MixedCase") == '"MixedCase"'
    assert quote_ident("order") == '"order"'  # reserved word
    assert quote_ident('wei"rd') == '"wei""rd"'  # embedded quote doubles

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("User Name", T.StringType(), True),
        ]
    )
    ddl = create_table_ddl(
        schema, "My-Table", target_schema="fde-local", primary_key=("id",)
    )
    assert 'CREATE TABLE IF NOT EXISTS "fde-local"."My-Table"' in ddl
    assert '"User Name" text' in ddl
    assert "PRIMARY KEY (id)" in ddl


def test_fk_ddl_quotes_hyphenated_schema():
    from postgresql_transfer_tool_spark.catalog import ForeignKey, TableInfo
    from postgresql_transfer_tool_spark.transfer import fk_ddl_statement

    info = TableInfo(name="nation", schema="fde-local")
    fk = ForeignKey("nation", ("n_regionkey",), "region", ("r_regionkey",))
    stmt = fk_ddl_statement(info, fk)
    assert 'ALTER TABLE "fde-local".nation' in stmt
    assert 'REFERENCES "fde-local".region (r_regionkey)' in stmt


def test_spark_to_pg_rejects_unmappable():
    with pytest.raises(ValueError):
        spark_to_pg(T.NullType())


def test_property_roundtrip_pg_spark_pg():
    """Every PG type we can emit maps back to a Spark type that emits a
    PG type parsing to the same Spark type (fixed-point after one hop)."""
    from hypothesis import given, strategies as st

    base = st.sampled_from(
        ["smallint", "integer", "bigint", "real", "double precision",
         "boolean", "text", "bytea", "date", "timestamptz", "numeric(10,2)"]
    )

    @given(base)
    def check(pg):
        spark_t = pg_to_spark(pg)
        pg2 = spark_to_pg(spark_t)
        assert pg_to_spark(pg2) == spark_t

    check()


# ---------------------------------------------------------------------------
# schema_compat — the §2.9 "Schema Validation" checker
# ---------------------------------------------------------------------------


def _st(*fields):
    return T.StructType([T.StructField(n, t, nullable) for n, t, nullable in fields])


def test_schema_compat_equal_and_widening():
    from postgresql_transfer_tool_spark.types import is_loadable, schema_compat

    src = _st(("a", T.IntegerType(), True), ("b", T.FloatType(), True))
    dst = _st(("a", T.LongType(), True), ("b", T.DoubleType(), True))
    rep = {r["column"]: r["verdict"] for r in schema_compat(src, dst)}
    assert rep == {"a": "widening", "b": "widening"}
    assert is_loadable(schema_compat(src, dst))
    assert is_loadable(schema_compat(src, src))


def test_schema_compat_narrowing_and_incompatible():
    from postgresql_transfer_tool_spark.types import is_loadable, schema_compat

    src = _st(("a", T.LongType(), True), ("b", T.StringType(), True))
    dst = _st(("a", T.IntegerType(), True), ("b", T.DateType(), True))
    rep = {r["column"]: r["verdict"] for r in schema_compat(src, dst)}
    assert rep == {"a": "narrowing", "b": "incompatible"}
    assert not is_loadable(schema_compat(src, dst))


def test_schema_compat_decimal_rules():
    from postgresql_transfer_tool_spark.types import schema_compat

    # wider precision AND integral digits → widening; fewer integral → narrowing
    src = _st(("d", T.DecimalType(10, 2), True), ("i", T.LongType(), True))
    good = _st(("d", T.DecimalType(12, 2), True), ("i", T.DecimalType(19, 0), True))
    bad = _st(("d", T.DecimalType(12, 6), True), ("i", T.DecimalType(18, 4), True))
    assert [r["verdict"] for r in schema_compat(src, good)] == ["widening", "widening"]
    # 12-6=6 integral < 10-2=8 → narrowing; 18-4=14 < 19 → narrowing
    assert [r["verdict"] for r in schema_compat(src, bad)] == ["narrowing", "narrowing"]


def test_schema_compat_missing_extra_nullability():
    from postgresql_transfer_tool_spark.types import is_loadable, schema_compat

    src = _st(("a", T.IntegerType(), True), ("gone", T.StringType(), True))
    dst = _st(
        ("a", T.IntegerType(), False),          # source nullable → NOT NULL target
        ("extra_ok", T.StringType(), True),     # nullable extra: fine
        ("extra_bad", T.StringType(), False),   # NOT NULL extra: rejects every row
    )
    rep = {r["column"]: r["verdict"] for r in schema_compat(src, dst)}
    assert rep == {
        "a": "nullability",
        "gone": "missing",
        "extra_ok": "extra",
        "extra_bad": "nullability",
    }
    assert not is_loadable(schema_compat(src, dst))


def test_schema_compat_array_recursion():
    from postgresql_transfer_tool_spark.types import schema_compat

    src = _st(("v", T.ArrayType(T.IntegerType()), True))
    dst = _st(("v", T.ArrayType(T.LongType()), True))
    assert schema_compat(src, dst)[0]["verdict"] == "widening"


def test_schema_compat_widening_narrowing_duality():
    """Property: a widening verdict one way must be narrowing the other
    way, equal and incompatible are symmetric, and NO pair may be safe
    (equal/widening) in both directions unless identical — the checker
    can't let a lossy round-trip look clean. (Both directions CAN be
    narrowing: int ↔ decimal(10,2) loses integral digits one way and the
    fraction the other.)"""
    from hypothesis import given, strategies as st

    from postgresql_transfer_tool_spark.types import _column_verdict

    scalars = st.sampled_from(
        [
            T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
            T.FloatType(), T.DoubleType(), T.StringType(), T.DateType(),
            T.TimestampType(), T.TimestampNTZType(), T.BooleanType(),
            T.DecimalType(10, 2), T.DecimalType(12, 2), T.DecimalType(12, 6),
            T.DecimalType(19, 0),
        ]
    )

    @given(scalars, scalars)
    def check(a, b):
        fwd, rev = _column_verdict(a, b), _column_verdict(b, a)
        assert (fwd == "equal") == (rev == "equal"), (a, b)
        assert (fwd == "incompatible") == (rev == "incompatible"), (a, b)
        if fwd == "widening":
            assert rev == "narrowing", (a, b)
        if a != b:
            assert not (fwd in ("equal", "widening") and rev in ("equal", "widening")), (a, b)

    check()


def test_schema_compat_array_element_nullability():
    from postgresql_transfer_tool_spark.types import is_loadable, schema_compat

    src = _st(("v", T.ArrayType(T.IntegerType(), containsNull=True), True))
    dst = _st(("v", T.ArrayType(T.IntegerType(), containsNull=False), True))
    rep = schema_compat(src, dst)
    assert rep[0]["verdict"] == "narrowing"
    assert not is_loadable(rep)
    # the reverse direction (non-null elements into nullable slots) is safe
    rev = schema_compat(dst, src)[0]["verdict"]
    assert rev in ("equal", "widening")
