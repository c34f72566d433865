"""PG array-literal codec unit tests + server-less render/parse
round-trip (VERDICT r3 "Next round" #5 — text[]/jsonb typed read).

The live end-to-end test (real PostgreSQL COPY both ways) is
test_pgcopy_live.py::test_text_array_and_jsonb_typed_roundtrip; these
cover the codec itself, including the quoting corners, without a
server in the loop.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from postgresql_transfer_tool_spark.sources.pgcopy import (
    _from_pg_text,
    _to_pg_text,
    parse_pg_array_literal,
)


@pytest.mark.parametrize(
    "lit,expected",
    [
        ("{}", []),
        ("{a,b,c}", ["a", "b", "c"]),
        ('{a,"b c",NULL}', ["a", "b c", None]),
        ('{"NULL"}', ["NULL"]),  # quoted: the word, not the marker
        ("{NULL}", [None]),
        ('{""}', [""]),
        ('{"a,b","{x}","\\"q\\""}', ["a,b", "{x}", '"q"']),
        ('{"back\\\\slash"}', ["back\\slash"]),
        ('{"línea\nnueva",plain}', ["línea\nnueva", "plain"]),
        ("{ leading, trailing }", [" leading", " trailing "]),
    ],
)
def test_parse_pg_array_literal(lit, expected):
    assert parse_pg_array_literal(lit) == expected


def test_parse_rejects_malformed():
    assert parse_pg_array_literal(None) is None
    with pytest.raises(ValueError):
        parse_pg_array_literal("1,2,3")
    with pytest.raises(ValueError):
        parse_pg_array_literal('{"a"x}')


def _roundtrip(spark, values):
    """Render text[] with the write path, parse with the read path —
    identity must hold for any element content."""
    field = T.StructField("arr", T.ArrayType(T.StringType(), True), True)
    df = spark.createDataFrame(
        [(v,) for v in values], T.StructType([field])
    )
    rendered = df.select(_to_pg_text(field))
    lits = [r["arr"] for r in rendered.collect()]
    return [parse_pg_array_literal(x) for x in lits]


def test_render_parse_identity_adversarial(spark):
    values = [
        ["a", "b c", None, "NULL", "", 'quo"te', "back\\slash", "{brace},comma"],
        [],
        None,
        ["\n", "\t", " ", "héllo 世界"],
    ]
    assert _roundtrip(spark, values) == values


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",), blacklist_characters="\x00"
                ),
                max_size=12,
            ),
        ),
        max_size=6,
    )
)
def test_render_parse_identity_property(arr):
    """Driver-side property: the render rule (always-quote + backslash
    escapes) inverts through the parser for arbitrary content."""

    def render(a):
        if a is None:
            return None
        parts = [
            "NULL"
            if x is None
            else '"' + x.replace("\\", "\\\\").replace('"', '\\"') + '"'
            for x in a
        ]
        return "{" + ",".join(parts) + "}"

    assert parse_pg_array_literal(render(arr)) == arr


def test_spark_read_cast_string_array(spark):
    """The distributed read path: array<string> column through
    _from_pg_text decodes PG quoting (incl. NULL vs "NULL")."""
    field = T.StructField("arr", T.ArrayType(T.StringType(), True), True)
    df = spark.createDataFrame(
        [('{a,"b,c",NULL,"NULL",""}',), ("{}",), (None,)],
        T.StructType([T.StructField("arr", T.StringType(), True)]),
    )
    out = [r["arr"] for r in df.select(_from_pg_text(field)).collect()]
    assert out == [["a", "b,c", None, "NULL", ""], [], None]


def test_spark_read_cast_date_array(spark):
    """Non-string quoted-element arrays cast element-wise after decode."""
    field = T.StructField("ds", T.ArrayType(T.DateType(), True), True)
    df = spark.createDataFrame(
        [("{2024-01-02,NULL}",)],
        T.StructType([T.StructField("ds", T.StringType(), True)]),
    )
    [row] = df.select(_from_pg_text(field)).collect()
    import datetime

    assert row["ds"] == [datetime.date(2024, 1, 2), None]


# ---------------------------------------------------------------------------
# composite (row-type) literals — directive r5 #6
# ---------------------------------------------------------------------------

import pytest as _pytest

from postgresql_transfer_tool_spark.sources.pgcopy import parse_pg_row_literal


@_pytest.mark.parametrize(
    "lit,expected",
    [
        ("(1,abc,t)", ["1", "abc", "t"]),
        ('("a, b",,"")', ["a, b", None, ""]),  # quoted comma, NULL, empty str
        ('("he said ""hi""","a\\\\b")', ['he said "hi"', "a\\b"]),  # doubled
        ('("back\\"slash")', ['back"slash']),  # input-style backslash escape
        ("(,)", [None, None]),
        ("()", [None]),  # 1-field NULL row
        ('("\\\\x6162",f)', ["\\x6162", "f"]),  # bytea field + bool
    ],
)
def test_parse_pg_row_literal(lit, expected):
    assert parse_pg_row_literal(lit) == expected


def test_parse_row_rejects_malformed():
    for bad in ("{1,2}", "(a,b", '("unterminated)'):
        with _pytest.raises(ValueError):
            parse_pg_row_literal(bad)
    assert parse_pg_row_literal(None) is None


def test_parse_rejects_dangling_backslash():
    """A quoted field ending in a lone backslash must raise the
    documented ValueError, not IndexError (ADVICE r5): the escape
    consumes body[i+1], which is past the end of the literal body."""
    with _pytest.raises(ValueError, match="backslash"):
        parse_pg_row_literal('(a,"b\\)')  # body ends on the escape char
    with _pytest.raises(ValueError, match="backslash"):
        parse_pg_row_literal('("\\)')
    from postgresql_transfer_tool_spark.sources.pgcopy import parse_pg_array_literal

    with _pytest.raises(ValueError, match="backslash"):
        parse_pg_array_literal('{"a\\}')


def test_composite_render_parse_identity(spark):
    """Spark-side inverse pair: _struct_to_pg_row_literal's output must
    decode back to the same struct through _from_pg_text — including
    quotes/commas/backslashes, NULL fields, NULL rows, bool and bytea
    fields (the exact conventions PG's composite I/O uses)."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from postgresql_transfer_tool_spark.sources.pgcopy import (
        _from_pg_text,
        _to_pg_text,
    )

    st = T.StructType(
        [
            T.StructField("s", T.StringType()),
            T.StructField("n", T.IntegerType()),
            T.StructField("ok", T.BooleanType()),
            T.StructField("b", T.BinaryType()),
        ]
    )
    field = T.StructField("a", st)
    rows = [
        Row(a=Row(s='he said "hi", twice\\', n=7, ok=True, b=b"\x00\xffA")),
        Row(a=Row(s="", n=None, ok=False, b=None)),
        Row(a=None),
    ]
    df = spark.createDataFrame(rows, T.StructType([field]))
    rendered = df.select(_to_pg_text(field, frozenset({"a"})))
    lits = [r.a for r in rendered.collect()]
    assert lits[2] is None
    assert lits[1] == '("",,"f",)'  # empty string ≠ NULL; f for false
    back = (
        spark.createDataFrame([(x,) for x in lits], "a string")
        .select(_from_pg_text(field))
        .collect()
    )
    assert [r.a for r in back] == [r.a for r in rows]


def test_bytea_array_elements_unhex(spark):
    """ADVICE r4 (low): bytea[] elements must decode the \\x hex
    literal to real bytes — a string→binary cast yields the UTF-8 bytes
    of the literal itself."""
    from pyspark.sql import types as T

    from postgresql_transfer_tool_spark.sources.pgcopy import _from_pg_text

    field = T.StructField("bs", T.ArrayType(T.BinaryType()))
    # PG array output doubles the backslash of each \x literal inside
    # quotes: {"\\x6162","\\x00ff",NULL}
    lit = '{"\\\\x6162","\\\\x00ff",NULL}'
    got = (
        spark.createDataFrame([(lit,), (None,)], "bs string")
        .select(_from_pg_text(field))
        .collect()
    )
    assert got[0].bs == [bytearray(b"ab"), bytearray(b"\x00\xff"), None]
    assert got[1].bs is None
