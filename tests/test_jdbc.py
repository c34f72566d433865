"""JDBC layer unit tests (no PostgreSQL in the container — these cover
option/SQL construction; live round-trips activate when a URL exists)."""

from __future__ import annotations

from postgresql_transfer_tool_spark.sources.jdbc import (
    JdbcTarget,
    check_constraints_sql,
    checks_from_rows,
    foreign_keys_sql,
    partitioned_read_options,
    primary_key_sql,
    serial_sequence_sql,
    setval_sql,
    tables_in_schema_sql,
    unique_constraints_sql,
    unique_from_rows,
)


def test_partitioned_read_options():
    opts = partitioned_read_options("public.orders", "o_orderkey", 1, 15000, 32)
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["numPartitions"] == "32"
    assert opts["pushDownPredicate"] == "true"
    # aggregate/limit/sample pushdown: HWM probes must run server-side
    assert opts["pushDownAggregate"] == "true"
    assert opts["pushDownLimit"] == "true"
    assert opts["pushDownTableSample"] == "true"
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


def test_unique_reflection_sql_shape():
    sql = unique_constraints_sql("public")
    assert "'UNIQUE'" in sql
    assert "key_column_usage" in sql
    assert "ordinal_position" in sql  # multi-column order preserved


def test_check_reflection_sql_shape():
    sql = check_constraints_sql("public")
    assert "'CHECK'" in sql
    assert "check_clause" in sql
    assert "IS NOT NULL" in sql  # PG's synthetic NOT NULL checks excluded


def test_unique_from_rows_multi_column_order():
    rows = [
        # ordinal order deliberately scrambled within the constraint
        ("users", "uq_users_email", "email", 1),
        ("users", "uq_users_org_name", "name", 2),
        ("users", "uq_users_org_name", "org_id", 1),
        ("parts", "uq_parts_sku", "sku", 1),
    ]
    out = unique_from_rows(rows)
    assert out["users"] == (("email",), ("org_id", "name"))
    assert out["parts"] == (("sku",),)


def test_checks_from_rows_strips_outer_parens():
    rows = [
        ("lineitem", "ck_qty", "((l_quantity > 0))"),
        ("lineitem", "ck_disc", "(l_discount >= 0) AND (l_discount <= 1)"),
    ]
    out = checks_from_rows(rows)
    assert out["lineitem"] == (
        "(l_discount >= 0) AND (l_discount <= 1)",
        "(l_quantity > 0)",
    )
