"""PostgreSQL ↔ Spark type mapping and DDL synthesis.

The reference copies column definitions opaquely through SQLAlchemy
(``transfer_data_script.py:62``) and creates targets with
``CREATE TABLE IF NOT EXISTS`` semantics (``checkfirst=True``,
``transfer_data_script.py:59-71`` — K2). The engine needs the mapping
explicit in both directions:

- PG→Spark: typing a reflected JDBC source (SURVEY.md §1.3 table, plus
  the general scalar surface SQLAlchemy would reflect);
- Spark→PG: synthesizing target DDL for RDBMS sinks, including the
  JSONB carrier convention and BIGSERIAL for generated keys.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# PG → Spark (reflection direction). Patterns are matched against
# normalized type names from information_schema / pg_catalog.
# ---------------------------------------------------------------------------

_PG_TO_SPARK: list[tuple[str, T.DataType]] = [
    (r"^(big)?serial$", T.LongType()),
    (r"^smallserial$", T.IntegerType()),
    (r"^smallint$|^int2$", T.ShortType()),
    (r"^integer$|^int$|^int4$", T.IntegerType()),
    (r"^bigint$|^int8$", T.LongType()),
    (r"^real$|^float4$", T.FloatType()),
    (r"^double precision$|^float8$", T.DoubleType()),
    (r"^numeric(\(.*\))?$|^decimal(\(.*\))?$", T.DecimalType(38, 18)),
    (r"^money$", T.DecimalType(19, 2)),
    (r"^boolean$|^bool$", T.BooleanType()),
    (r"^(character varying|varchar)(\(\d+\))?$", T.StringType()),
    (r"^(character|char)(\(\d+\))?$", T.StringType()),
    (r"^text$|^citext$|^name$", T.StringType()),
    (r"^uuid$", T.StringType()),
    # JSONB/JSON land as a string carrier; promotion happens on demand
    # via from_json with an explicit schema (SURVEY.md §1.3)
    (r"^jsonb?$", T.StringType()),
    (r"^xml$", T.StringType()),
    (r"^bytea$", T.BinaryType()),
    (r"^date$", T.DateType()),
    # TIMESTAMPTZ is an instant → TimestampType (session-tz rendering);
    # plain TIMESTAMP is wall-clock → TimestampNTZType
    (r"^timestamp(\(\d+\))? with time zone$|^timestamptz$", T.TimestampType()),
    (r"^timestamp(\(\d+\))?( without time zone)?$", T.TimestampNTZType()),
    (r"^time.*$", T.StringType()),
    (r"^interval$", T.DayTimeIntervalType()),
    (r"^inet$|^cidr$|^macaddr8?$", T.StringType()),
]


def _numeric_with_precision(pg_type: str) -> T.DataType | None:
    m = re.match(r"^(?:numeric|decimal)\((\d+)(?:,\s*(\d+))?\)$", pg_type)
    if m:
        precision = int(m.group(1))
        scale = int(m.group(2) or 0)
        return T.DecimalType(min(precision, 38), min(scale, 37))
    return None


def pg_to_spark(pg_type: str) -> T.DataType:
    """Map one PostgreSQL type name to its Spark type.

    Array types (``integer[]`` / ``_int4``) recurse into ArrayType;
    unknown types degrade to StringType (the lossless carrier) rather
    than failing reflection — matching the reference's copy-whatever
    behavior (``transfer_data_script.py:62``).
    """
    t = pg_type.strip().lower()
    if t.endswith("[]"):
        return T.ArrayType(pg_to_spark(t[:-2]))
    if t.startswith("_"):
        return T.ArrayType(pg_to_spark(t[1:]))
    exact = _numeric_with_precision(t)
    if exact is not None:
        return exact
    for pattern, spark_type in _PG_TO_SPARK:
        if re.match(pattern, t):
            return spark_type
    return T.StringType()


def reflect_schema(columns: list[tuple[str, str, bool]]) -> T.StructType:
    """Build a StructType from reflected (name, pg_type, nullable) rows
    (the engine's half of MetaData.reflect, S1)."""
    return T.StructType(
        [T.StructField(name, pg_to_spark(pg_type), nullable) for name, pg_type, nullable in columns]
    )


# ---------------------------------------------------------------------------
# Identifier quoting. The reference's third PL/pgSQL block handles the
# hyphenated schema "fde-local" with quoted identifiers
# (after-running-script.sql:84-126); all DDL synthesized here must
# round-trip such names. Quoting follows pg_dump: only when the name is
# not a clean lowercase identifier or collides with a keyword, so DDL
# for conventional names stays byte-stable.
# ---------------------------------------------------------------------------

_CLEAN_IDENT = re.compile(r"^[a-z_][a-z0-9_]*$")

#: keywords that commonly appear as table/column names and MUST be quoted
#: (subset of the PG reserved list — extend as needed).
_RESERVED = frozenset(
    "all and any array as asc between case cast check collate column "
    "constraint create cross current_date current_time current_timestamp "
    "default desc distinct do else end except false for foreign from full "
    "grant group having in initially inner intersect into is join leading "
    "left like limit localtime localtimestamp natural not null offset on "
    "only or order outer primary references returning right select "
    "session_user some table then to trailing true union unique user "
    "using when where window with".split()
)


def quote_ident(name: str) -> str:
    """Quote one identifier for PostgreSQL DDL when needed; embedded
    double quotes double per the SQL standard."""
    if _CLEAN_IDENT.match(name) and name not in _RESERVED:
        return name
    return '"' + name.replace('"', '""') + '"'


def quote_qualified(schema: str, name: str) -> str:
    return f"{quote_ident(schema)}.{quote_ident(name)}"


# ---------------------------------------------------------------------------
# Spark → PG (DDL synthesis direction, K2).
# ---------------------------------------------------------------------------

_SPARK_TO_PG: dict[type, str] = {
    T.ByteType: "smallint",
    T.ShortType: "smallint",
    T.IntegerType: "integer",
    T.LongType: "bigint",
    T.FloatType: "real",
    T.DoubleType: "double precision",
    T.BooleanType: "boolean",
    T.StringType: "text",
    T.BinaryType: "bytea",
    T.DateType: "date",
    T.TimestampType: "timestamptz",
    T.TimestampNTZType: "timestamp",
}


def spark_to_pg(dt: T.DataType) -> str:
    if isinstance(dt, T.DecimalType):
        return f"numeric({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"{spark_to_pg(dt.elementType)}[]"
    if isinstance(dt, (T.MapType, T.StructType)):
        return "jsonb"  # nested data round-trips through the JSONB carrier
    pg = _SPARK_TO_PG.get(type(dt))
    if pg is None:
        raise ValueError(f"no PostgreSQL mapping for Spark type {dt}")
    return pg


# ---------------------------------------------------------------------------
# Schema-compatibility validation. The reference README claims "Schema
# Validation" (README.md:3,9) but ships only existence checks (SURVEY.md
# §2.9); this is the real type-compatibility checker: given a reflected
# source schema and an existing target schema, classify every column so
# a transfer can refuse (or warn) BEFORE moving 100 TB into a target
# that silently truncates.
# ---------------------------------------------------------------------------

#: safe implicit promotions, source → wider target
_WIDENING: dict[type, tuple[type, ...]] = {
    T.ByteType: (T.ShortType, T.IntegerType, T.LongType, T.DoubleType, T.DecimalType),
    T.ShortType: (T.IntegerType, T.LongType, T.DoubleType, T.DecimalType),
    T.IntegerType: (T.LongType, T.DoubleType, T.DecimalType),
    T.LongType: (T.DecimalType,),
    T.FloatType: (T.DoubleType,),
    T.DateType: (T.TimestampType, T.TimestampNTZType),
}


def _column_verdict(src: T.DataType, dst: T.DataType) -> str:
    if src == dst:
        return "equal"
    if isinstance(src, T.DecimalType) and isinstance(dst, T.DecimalType):
        widen = (
            dst.precision >= src.precision
            and dst.scale >= src.scale
            and dst.precision - dst.scale >= src.precision - src.scale
        )
        return "widening" if widen else "narrowing"
    if isinstance(src, T.ArrayType) and isinstance(dst, T.ArrayType):
        # element nullability is part of the contract: nullable elements
        # into a containsNull=False target would violate the target schema
        if src.containsNull and not dst.containsNull:
            return "narrowing"
        return _column_verdict(src.elementType, dst.elementType)
    for wider in _WIDENING.get(type(src), ()):
        if isinstance(dst, wider):
            if isinstance(dst, T.DecimalType):
                # the integer must fit the decimal's integral digits
                need = {T.ByteType: 3, T.ShortType: 5, T.IntegerType: 10, T.LongType: 19}[
                    type(src)
                ]
                if dst.precision - dst.scale < need:
                    return "narrowing"
            return "widening"
    for wider in _WIDENING.get(type(dst), ()):
        if isinstance(src, wider):
            return "narrowing"
    return "incompatible"


def schema_compat(
    source: T.StructType, target: T.StructType
) -> list[dict[str, str]]:
    """Column-by-column compatibility report for loading ``source`` rows
    into an existing ``target`` table.

    One dict per column: ``{column, verdict, source, target}`` with
    verdict ∈ ``equal | widening | narrowing | incompatible | missing
    (absent in target) | extra (target-only) | nullability (source
    nullable, target NOT NULL)``. Narrowing/incompatible/missing/
    nullability make the pair unloadable (see :func:`is_loadable`);
    ``extra`` target columns are fine iff nullable (reported so callers
    can decide). Nested Array element types recurse; everything else
    compares structurally.
    """
    report: list[dict[str, str]] = []
    tgt = {f.name: f for f in target.fields}
    for f in source.fields:
        t = tgt.pop(f.name, None)
        if t is None:
            report.append(
                {"column": f.name, "verdict": "missing", "source": f.dataType.simpleString(), "target": ""}
            )
            continue
        verdict = _column_verdict(f.dataType, t.dataType)
        if verdict in ("equal", "widening") and f.nullable and not t.nullable:
            verdict = "nullability"
        report.append(
            {
                "column": f.name,
                "verdict": verdict,
                "source": f.dataType.simpleString(),
                "target": t.dataType.simpleString(),
            }
        )
    for f in tgt.values():
        report.append(
            {
                "column": f.name,
                "verdict": "extra" if f.nullable else "nullability",
                "source": "",
                "target": f.dataType.simpleString(),
            }
        )
    return report


def is_loadable(report: list[dict[str, str]]) -> bool:
    """True when every source column lands losslessly (equal/widening)
    and no target constraint (NOT NULL extra/narrower column) can reject
    rows."""
    return all(r["verdict"] in ("equal", "widening", "extra") for r in report)


def create_table_ddl(
    schema: T.StructType,
    table: str,
    target_schema: str = "public",
    primary_key: tuple[str, ...] = (),
    serial_columns: tuple[str, ...] = (),
    if_not_exists: bool = True,
) -> str:
    """CREATE TABLE statement for an RDBMS target — the engine's K2
    (idempotent via IF NOT EXISTS, like the reference's checkfirst=True).
    Serial columns emit BIGSERIAL so the sequence machinery the resync
    step (K7) maintains actually exists on the target."""
    cols = []
    for f in schema.fields:
        if f.name in serial_columns:
            pg = "bigserial"
        else:
            pg = spark_to_pg(f.dataType)
        null = "" if f.nullable and f.name not in primary_key else " NOT NULL"
        cols.append(f"    {quote_ident(f.name)} {pg}{null}")
    if primary_key:
        cols.append(
            f"    PRIMARY KEY ({', '.join(quote_ident(c) for c in primary_key)})"
        )
    ine = "IF NOT EXISTS " if if_not_exists else ""
    body = ",\n".join(cols)
    return f"CREATE TABLE {ine}{quote_qualified(target_schema, table)} (\n{body}\n)"
