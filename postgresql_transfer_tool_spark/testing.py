"""Shared test/verification helpers: DuckDB-oracle differential checking.

Mechanizes the driver's correctness gate (SURVEY.md §5): run the Spark
query and the ANSI-SQL oracle on the same parquet fixtures, compare row
count, column names, and an order-insensitive canonical row multiset with
exact (bit-level) equality.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb

from .catalog import TABLES, table_path


def canon_value(v) -> str:
    """Canonical engine-independent form of one cell."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest round-trip repr — exact for doubles
    return str(v)


def canon_rows(rows, colnames: list[str]) -> list[tuple[str, ...]]:
    """Order-insensitive canonical multiset: columns sorted by name, then rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(canon_value(r[i]) for i in order) for r in rows)


def duckdb_connection(
    sf_dir: str, tables: tuple[str, ...] = TABLES
) -> duckdb.DuckDBPyConnection:
    """A DuckDB connection with every fixture table registered as a view
    (matching the driver's pre-registered views). ``tables`` narrows the
    set for tests running against a synthesized partial fixture dir."""
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    return con


@dataclass
class DiffResult:
    name: str
    problems: list[str] = field(default_factory=list)
    n_rows: int = 0

    @property
    def ok(self) -> bool:
        return not self.problems


def _duck_type_class(t: str) -> str:
    """Coarse type class of a DuckDB type string, at the granularity the
    driver's typed value-hash is sensitive to. Round-1 evidence: BIGINT
    vs Spark INT hashed equal, but HUGEINT (un-cast integer SUM) did not
    — so int widths up to 64 collapse to one class and int128 does not."""
    t = t.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT", "UINTEGER"):
        return "int"
    if t in ("HUGEINT", "UBIGINT", "UHUGEINT"):
        return "int128"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.endswith("[]") or t.startswith("STRUCT") or t.startswith("MAP"):
        return "nested"
    return {"VARCHAR": "string", "BOOLEAN": "bool", "DATE": "date", "BLOB": "binary"}.get(
        t, t.lower()
    )


def _spark_type_class(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"  # NTZ-vs-LTZ is hash-equal (driver r1 evidence: q3)
    if isinstance(dt, (T.ArrayType, T.StructType, T.MapType)):
        return "nested"
    return {
        T.StringType: "string",
        T.BooleanType: "bool",
        T.DateType: "date",
        T.BinaryType: "binary",
    }.get(type(dt), dt.simpleString())


def compare_query(spark, con, name: str, fn, oracle: str | None, sf_dir: str) -> DiffResult:
    """Run one Spark query vs its oracle and diff the results."""
    res = DiffResult(name)
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res.n_rows = len(srows)
    if oracle is None:
        return res  # rows-only query: success == it ran
    # type-class parity first (lazy — DuckDB binds the query without
    # executing): catches HUGEINT/DECIMAL-vs-int divergence that the
    # stringified value diff below cannot see
    rel = con.sql(oracle)
    dtypes = {c: _duck_type_class(str(t)) for c, t in zip(rel.columns, rel.types)}
    stypes = {f.name: _spark_type_class(f.dataType) for f in sdf.schema.fields}
    for c in sorted(set(dtypes) & set(stypes)):
        if dtypes[c] != stypes[c]:
            res.problems.append(f"type[{c}]: spark={stypes[c]} duck={dtypes[c]}")
    if res.problems:
        return res
    cur = con.execute(oracle)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    if sorted(scols) != sorted(dcols):
        res.problems.append(f"columns: spark={sorted(scols)} duck={sorted(dcols)}")
        return res
    if len(srows) != len(drows):
        res.problems.append(f"rowcount: spark={len(srows)} duck={len(drows)}")
        return res
    sk, dk = canon_rows(srows, scols), canon_rows(drows, dcols)
    if sk != dk:
        diffs = [(a, b) for a, b in zip(sk, dk) if a != b][:3]
        res.problems.append(f"values differ; first diffs: {diffs}")
    return res
