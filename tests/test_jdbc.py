"""JDBC layer unit tests (no PostgreSQL in the container — these cover
option/SQL construction; live round-trips activate when a URL exists)."""

from __future__ import annotations

from postgresql_transfer_tool_spark.sources.jdbc import (
    JdbcTarget,
    foreign_keys_sql,
    partitioned_read_options,
    primary_key_sql,
    serial_sequence_sql,
    setval_sql,
    tables_in_schema_sql,
)


def test_partitioned_read_options():
    opts = partitioned_read_options("public.orders", "o_orderkey", 1, 15000, 32)
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["numPartitions"] == "32"
    assert opts["pushDownPredicate"] == "true"
    assert int(opts["fetchsize"]) >= 1000  # ≥ the reference's chunk_size


def test_partitioned_read_degenerate_bounds():
    opts = partitioned_read_options("t", "id", 5, 5)
    assert opts["numPartitions"] == "1"  # empty or single-row range → no empty tasks


def test_target_properties():
    t = JdbcTarget("jdbc:postgresql://h:5432/db", "u", "p")
    assert t.properties()["driver"] == "org.postgresql.Driver"


def test_reflection_sql_shapes():
    assert "pg_tables" in tables_in_schema_sql("public")
    assert "indisprimary" in primary_key_sql("public", "orders")
    assert "FOREIGN KEY" in foreign_keys_sql("public")
    assert "pg_get_serial_sequence" in serial_sequence_sql("public", "t", "id")
    assert setval_sql("public.t_id_seq", 42, False) == (
        "SELECT setval('public.t_id_seq', 42, false)"
    )
