"""JDBC source/sink layer — the PostgreSQL-facing half of the engine.

The reference reads with unordered OFFSET/LIMIT pagination
(``transfer_data_script.py:107-114`` — O(N²) server work and
non-deterministic, SURVEY.md §4 O1-O2) and writes one INSERT per row
(``transfer_data_script.py:126``). The engine replaces both:

- reads: ``spark.read.jdbc`` partitioned on a numeric column — N
  parallel range scans, each a single server-side cursor (O(N) total);
- writes: batched inserts (``batchsize``), per-partition connections.

No JDBC jar ships in the test container, so everything here is pure
option/SQL construction (unit-tested) plus thin ``spark.read`` calls
that activate when a URL is supplied; the reflection/DDL/sequence SQL
is additionally executed verbatim against a live throwaway PostgreSQL
in ``tests/test_pg_integration.py``, and real data movement is
live-tested through the ``COPY`` bridge (``sources/pgcopy.py``).
Constraint reflection (S1, which Spark's JDBC reader does not surface)
is implemented as ``information_schema``/``pg_catalog`` queries shipped
through the JDBC ``query`` option.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

DEFAULT_FETCH_SIZE = 10_000  # rows per round-trip on read
DEFAULT_BATCH_SIZE = 10_000  # rows per INSERT batch on write
DEFAULT_NUM_PARTITIONS = 32


@dataclass(frozen=True)
class JdbcTarget:
    url: str  # jdbc:postgresql://host:port/db
    user: str
    password: str
    schema: str = "public"

    def properties(self) -> dict[str, str]:
        return {
            "user": self.user,
            "password": self.password,
            "driver": "org.postgresql.Driver",
        }


def partitioned_read_options(
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    fetch_size: int = DEFAULT_FETCH_SIZE,
) -> dict[str, str]:
    """Options for a deterministic partitioned scan: Spark issues
    ``num_partitions`` WHERE-range queries on ``partition_column`` —
    the scale-correct replacement for the reference's chunk loop
    (chunk_size=1000, ``transfer_data_script.py:85``)."""
    if upper_bound <= lower_bound:
        num_partitions = 1
    return {
        "dbtable": table,
        "partitionColumn": partition_column,
        "lowerBound": str(lower_bound),
        "upperBound": str(upper_bound),
        "numPartitions": str(num_partitions),
        "fetchsize": str(fetch_size),
        "pushDownPredicate": "true",
        # server-side aggregation/LIMIT/TABLESAMPLE pushdown. NOTE: these
        # are honored only by the DSv2 path (a JDBCTableCatalog-registered
        # table); the V1 `format("jdbc")` reader used by read_table ignores
        # them (it pushes predicates + column pruning only). They are set
        # here so the same option dict drives a catalog-registered table,
        # where COUNT(*)/MAX(id) HWM probes (A1-A4) run server-side and
        # move zero rows over the wire.
        "pushDownAggregate": "true",
        "pushDownLimit": "true",
        "pushDownTableSample": "true",
    }


def read_table(
    spark: SparkSession,
    target: JdbcTarget,
    table: str,
    partition_column: str | None = None,
    bounds: tuple[int, int] | None = None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> DataFrame:
    """Full-table scan (S2) — partitioned when a numeric column + bounds
    are known (bounds come from one cheap MIN/MAX agg, replacing the
    reference's COUNT-before-scan, O7)."""
    reader = spark.read.format("jdbc").option("url", target.url)
    for k, v in target.properties().items():
        reader = reader.option(k, v)
    if partition_column and bounds:
        for k, v in partitioned_read_options(
            table, partition_column, bounds[0], bounds[1], num_partitions
        ).items():
            reader = reader.option(k, v)
    else:
        reader = reader.option("dbtable", table).option(
            "fetchsize", str(DEFAULT_FETCH_SIZE)
        )
    return reader.load()


def write_table(
    df: DataFrame,
    target: JdbcTarget,
    table: str,
    mode: str = "append",
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> None:
    """Batched JDBC sink (K1 done right: ``batchsize`` rows per INSERT,
    one connection per partition, vs the reference's one statement per
    row)."""
    (
        df.write.format("jdbc")
        .option("url", target.url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .options(**target.properties())
        .mode(mode)
        .save()
    )


# ---------------------------------------------------------------------------
# Catalog / constraint reflection SQL (S1/S4/S5): what
# MetaData.reflect() gathers via SQLAlchemy, expressed as pg_catalog
# queries shipped through the JDBC `query` option.
# ---------------------------------------------------------------------------


def tables_in_schema_sql(schema: str) -> str:
    """S4 — ``pg_tables`` scan (after-running-script.sql:7-10)."""
    return (
        "SELECT tablename FROM pg_tables "
        f"WHERE schemaname = '{schema}' ORDER BY tablename"
    )


def primary_key_sql(schema: str, table: str) -> str:
    return f"""
    SELECT a.attname AS column_name
    FROM pg_index i
    JOIN pg_class c ON c.oid = i.indrelid
    JOIN pg_namespace n ON n.oid = c.relnamespace
    JOIN pg_attribute a ON a.attrelid = c.oid AND a.attnum = ANY(i.indkey)
    WHERE i.indisprimary AND n.nspname = '{schema}' AND c.relname = '{table}'
    ORDER BY a.attnum
    """


def foreign_keys_sql(schema: str) -> str:
    """FK edges with referential actions — the metadata the reference
    walks via SQLAlchemy constraint objects
    (``transfer_data_with_constraints_script.py:104-171``)."""
    return f"""
    SELECT tc.table_name, kcu.column_name,
           ccu.table_name AS ref_table, ccu.column_name AS ref_column,
           rc.delete_rule, rc.update_rule
    FROM information_schema.table_constraints tc
    JOIN information_schema.key_column_usage kcu
      ON tc.constraint_name = kcu.constraint_name
     AND tc.table_schema = kcu.table_schema
    JOIN information_schema.constraint_column_usage ccu
      ON ccu.constraint_name = tc.constraint_name
     AND ccu.table_schema = tc.table_schema
    JOIN information_schema.referential_constraints rc
      ON rc.constraint_name = tc.constraint_name
     AND rc.constraint_schema = tc.table_schema
    WHERE tc.constraint_type = 'FOREIGN KEY' AND tc.table_schema = '{schema}'
    """


def unique_constraints_sql(schema: str) -> str:
    """UNIQUE constraint reflection — the metadata the reference rebuilds
    on the target via SQLAlchemy ``UniqueConstraint`` objects
    (``transfer_data_with_constraints_script.py:84-87``). One row per
    (table, constraint, column); reassemble multi-column constraints with
    :func:`unique_from_rows`."""
    return f"""
    SELECT tc.table_name, tc.constraint_name, kcu.column_name,
           kcu.ordinal_position
    FROM information_schema.table_constraints tc
    JOIN information_schema.key_column_usage kcu
      ON kcu.constraint_name = tc.constraint_name
     AND kcu.table_schema = tc.table_schema
    WHERE tc.constraint_type = 'UNIQUE' AND tc.table_schema = '{schema}'
    ORDER BY tc.table_name, tc.constraint_name, kcu.ordinal_position
    """


def check_constraints_sql(schema: str) -> str:
    """CHECK constraint reflection (reference rebuilds them via
    ``CheckConstraint(sqltext=...)``,
    ``transfer_data_with_constraints_script.py:88-90``). PostgreSQL also
    surfaces every NOT NULL as a synthetic ``... IS NOT NULL`` check —
    filtered out here, matching what SQLAlchemy's reflection returns."""
    return f"""
    SELECT tc.table_name, tc.constraint_name, cc.check_clause
    FROM information_schema.table_constraints tc
    JOIN information_schema.check_constraints cc
      ON cc.constraint_name = tc.constraint_name
     AND cc.constraint_schema = tc.table_schema
    WHERE tc.constraint_type = 'CHECK' AND tc.table_schema = '{schema}'
      AND cc.check_clause NOT LIKE '%IS NOT NULL'
    ORDER BY tc.table_name, tc.constraint_name
    """


def unique_from_rows(
    rows: list[tuple[str, str, str, int]],
) -> dict[str, tuple[tuple[str, ...], ...]]:
    """(table, constraint, column, ordinal) rows → per-table column-tuple
    sets, the shape ``TableInfo.unique`` stores."""
    grouped: dict[str, dict[str, list[tuple[int, str]]]] = {}
    for table, constraint, column, ordinal in rows:
        grouped.setdefault(table, {}).setdefault(constraint, []).append(
            (ordinal, column)
        )
    return {
        table: tuple(
            tuple(col for _, col in sorted(cols))
            for _, cols in sorted(constraints.items())
        )
        for table, constraints in grouped.items()
    }


def checks_from_rows(
    rows: list[tuple[str, str, str]],
) -> dict[str, tuple[str, ...]]:
    """(table, constraint, clause) rows → per-table check expressions
    (``TableInfo.checks``). Strips the outer parens PostgreSQL adds to
    ``check_clause``."""
    grouped: dict[str, list[tuple[str, str]]] = {}
    for table, constraint, clause in rows:
        clause = clause.strip()
        while clause.startswith("((") and clause.endswith("))"):
            clause = clause[1:-1]
        grouped.setdefault(table, []).append((constraint, clause))
    return {
        table: tuple(clause for _, clause in sorted(items))
        for table, items in grouped.items()
    }


def serial_sequence_sql(schema: str, table: str, column: str) -> str:
    """S5 — the sequence↔column probe (after-running-script.sql:15).

    The first argument is TEXT parsed under SQL identifier rules, so
    mixed-case/hyphenated names (the reference's ``fde-local`` schema,
    after-running-script.sql:97) must arrive pre-quoted — exactly how
    the reference concatenates ``'fde-local.' || table_name`` fails for
    mixed-case tables; ``quote_qualified`` handles both."""
    from ..types import quote_qualified

    qualified = quote_qualified(schema, table).replace("'", "''")
    return f"SELECT pg_get_serial_sequence('{qualified}', '{column}') AS seq"


def setval_sql(sequence: str, value: int, is_called: bool = True) -> str:
    """K7 — sequence resync statement (after-running-script.sql:20-21,
    100-102). Executed driver-side through a passthrough connection."""
    return f"SELECT setval('{sequence}', {value}, {str(is_called).lower()})"


def read_query(spark: SparkSession, target: JdbcTarget, sql: str) -> DataFrame:
    """Ship an arbitrary catalog query through the JDBC ``query`` option
    (how every reflection SQL above reaches a live server)."""
    return (
        spark.read.format("jdbc")
        .option("url", target.url)
        .option("query", sql)
        .options(**target.properties())
        .load()
    )


def reflect_catalog(spark: SparkSession, target: JdbcTarget):
    """S1 against a live PostgreSQL: assemble ``TableInfo`` per table from
    the reflection queries — the engine's analog of the reference's
    ``MetaData.reflect()`` startup (``transfer_data_script.py:30-35``),
    now including UNIQUE and CHECK constraints so the C2/C3 validators
    can run against discovered (not hand-declared) metadata."""
    from ..catalog import TableInfo

    schema = target.schema
    tables = [
        r[0] for r in read_query(spark, target, tables_in_schema_sql(schema)).collect()
    ]
    unique = unique_from_rows(
        [tuple(r) for r in read_query(spark, target, unique_constraints_sql(schema)).collect()]
    )
    checks = checks_from_rows(
        [tuple(r) for r in read_query(spark, target, check_constraints_sql(schema)).collect()]
    )
    out: dict[str, TableInfo] = {}
    for t in tables:
        pk = tuple(
            r[0]
            for r in read_query(spark, target, primary_key_sql(schema, t)).collect()
        )
        out[t] = TableInfo(
            name=t,
            schema=schema,
            primary_key=pk,
            unique=unique.get(t, ()),
            checks=checks.get(t, ()),
        )
    return out


#: pg_constraint action codes → DDL keywords (NO ACTION → None, the
#: default that fk_ddl_statement omits).
FK_ACTION_CODES = {
    "a": None,
    "r": "RESTRICT",
    "c": "CASCADE",
    "n": "SET NULL",
    "d": "SET DEFAULT",
}


def foreign_keys_detailed_sql(schema: str) -> str:
    """FK reflection that survives COMPOSITE keys: one row per
    (constraint, column position), with the child↔parent column
    correspondence taken from conkey/confkey WITH ORDINALITY.
    ``information_schema.constraint_column_usage`` (the simpler query
    above) cannot express that correspondence — a two-column FK comes
    back as an unordered column bag — so reflection that must rebuild
    DDL uses this form. Reassemble with :func:`fk_edges_from_rows`."""
    return f"""
    SELECT c.conname, rel.relname AS table_name, att.attname AS column_name,
           frel.relname AS ref_table, fatt.attname AS ref_column,
           k.ord, c.confdeltype, c.confupdtype
    FROM pg_constraint c
    JOIN pg_class rel ON rel.oid = c.conrelid
    JOIN pg_namespace n ON n.oid = rel.relnamespace
    JOIN pg_class frel ON frel.oid = c.confrelid
    CROSS JOIN LATERAL unnest(c.conkey, c.confkey)
         WITH ORDINALITY AS k(attnum, fattnum, ord)
    JOIN pg_attribute att
      ON att.attrelid = c.conrelid AND att.attnum = k.attnum
    JOIN pg_attribute fatt
      ON fatt.attrelid = c.confrelid AND fatt.attnum = k.fattnum
    WHERE c.contype = 'f' AND n.nspname = '{schema}'
    ORDER BY c.conname, k.ord
    """


def fk_edges_from_rows(rows):
    """(conname, table, column, ref_table, ref_column, ord, del, upd)
    rows → ``ForeignKey`` edges, composite columns kept in key order.
    Grouping keys on (table, conname): PostgreSQL constraint names are
    unique per TABLE, not per schema — two tables may both carry an
    ``fk_customer`` and must not merge into one garbled edge."""
    from ..catalog import ForeignKey

    grouped: dict[tuple[str, str], dict] = {}
    for conname, table, col, ref_table, ref_col, ord_, del_c, upd_c in rows:
        g = grouped.setdefault(
            (table, conname),
            {"table": table, "ref_table": ref_table, "cols": [],
             "ref_cols": [], "del": del_c, "upd": upd_c},
        )
        g["cols"].append((int(ord_), col))
        g["ref_cols"].append((int(ord_), ref_col))
    return [
        ForeignKey(
            g["table"],
            tuple(c for _, c in sorted(g["cols"])),
            g["ref_table"],
            tuple(c for _, c in sorted(g["ref_cols"])),
            on_delete=FK_ACTION_CODES.get(g["del"]),
            on_update=FK_ACTION_CODES.get(g["upd"]),
        )
        for g in grouped.values()
    ]
