"""Constraint validators — schema-level query semantics (SURVEY.md §2.5).

The reference *reconstructs* PK / UNIQUE / CHECK / FK constraints on the
target and lets PostgreSQL enforce them
(``transfer_data_with_constraints_script.py:80-91,138-164``). Spark
enforces none, so each constraint becomes a validation query the engine
must answer; the transfer pipeline (transfer.py) fails a table whose
validators return violations rather than silently writing them.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

# ---------------------------------------------------------------------------
# C1 — PRIMARY KEY: uniqueness + non-null. One summary row per table so
# the whole audit is a single DataFrame. At scale each check is one
# hash-aggregate on the PK columns (map-side partials; no row data moves).
# ---------------------------------------------------------------------------

#: audited key per table. lineitem's classic TPC-H compound key is
#: *intentionally violated* by the fixture (duplicate linenumbers), so
#: the audit demonstrates both outcomes: clean keys report 0, and the
#: violated candidate key reports its duplicate count.
_PK_AUDIT: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderkey",),
    "customer": ("c_custkey",),
    "lineitem": ("l_orderkey", "l_linenumber"),
    "events": ("event_id",),
}


def _pk_oracle() -> str:
    parts = []
    for t, pk in _PK_AUDIT.items():
        keys = ", ".join(pk)
        notnull = " AND ".join(f"{c} IS NOT NULL" for c in pk)
        parts.append(f"""
        SELECT '{t}' AS table_name,
               (SELECT COUNT(*) FROM (
                   SELECT 1 FROM {t} WHERE {notnull}
                   GROUP BY {keys} HAVING COUNT(*) > 1) d) AS duplicate_keys,
               (SELECT COUNT(*) FROM {t} WHERE NOT ({notnull})) AS null_keys
        """)
    return "\nUNION ALL\n".join(parts)


@query("pk_violation_audit", oracle=_pk_oracle())
def pk_violation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = []
    for t, pk_cols in _PK_AUDIT.items():
        pk = list(pk_cols)
        df = load_table(spark, sf_dir, t)
        notnull = reduce(
            Column.__and__, [F.col(c).isNotNull() for c in pk]
        )
        # ONE groupBy pass per table (guide §1.2): grouping on the PK
        # puts null-key rows in their own groups, so duplicate groups
        # (count>1, keys non-null) and null-key ROWS (sum of counts of
        # null-key groups) both fall out of a single scan+aggregate —
        # the previous shape scanned each table twice (dup branch +
        # null branch) and cross-joined the two one-row results.
        out.append(
            df.groupBy(*pk)
            .count()
            .agg(
                F.count_if((F.col("count") > 1) & notnull).alias(
                    "duplicate_keys"
                ),
                F.coalesce(
                    F.sum(F.when(~notnull, F.col("count"))), F.lit(0)
                ).alias("null_keys"),
            )
            .select(
                F.lit(t).alias("table_name"), "duplicate_keys", "null_keys"
            )
        )
    return reduce(DataFrame.unionByName, out)


# ---------------------------------------------------------------------------
# C2 — UNIQUE constraint check (reference rebuilds UniqueConstraint,
# transfer_data_with_constraints_script.py:84-87). Returns the violating
# key values — empty result == constraint holds.
# ---------------------------------------------------------------------------


@query(
    "unique_violations_nation_name",
    oracle="""
    SELECT n_name, COUNT(*) AS n
    FROM nation GROUP BY n_name HAVING COUNT(*) > 1
    """,
)
def unique_violations_nation_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "nation")
        .groupBy("n_name")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


# ---------------------------------------------------------------------------
# C3 — CHECK constraint: the reference carries the raw SQL text
# (transfer_data_with_constraints_script.py:88-90); the engine evaluates
# it with F.expr (PG check expressions are largely ANSI). Two checks: one
# that holds (0 violations) and one seeded to fail, so both outcomes are
# exercised.
# ---------------------------------------------------------------------------

_CHECK_HOLDS = "l_quantity > 0 AND l_discount >= 0 AND l_discount <= 1 AND l_tax >= 0"
_CHECK_FAILS = "l_quantity <= 25"


@query(
    "check_constraint_audit",
    oracle=f"""
    SELECT 'lineitem_valid_ranges' AS check_name,
           COUNT(*) FILTER (WHERE NOT ({_CHECK_HOLDS})) AS violations
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_qty_le_25' AS check_name,
           COUNT(*) FILTER (WHERE NOT ({_CHECK_FAILS})) AS violations
    FROM lineitem
    """,
)
def check_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def audit(name: str, check_sql: str) -> DataFrame:
        return li.agg(
            F.lit(name).alias("check_name"),
            F.count_if(~F.expr(check_sql)).alias("violations"),
        )

    return audit("lineitem_valid_ranges", _CHECK_HOLDS).unionByName(
        audit("lineitem_qty_le_25", _CHECK_FAILS)
    )


# ---------------------------------------------------------------------------
# Row-count validation (A1 as a post-transfer check): source vs target
# counts per table — the check the reference only does by log-reading
# (transfer_data_script.py:115-133). Exercised end-to-end in
# tests/test_transfer.py; here as a self-comparison query.
# ---------------------------------------------------------------------------


@query(
    "rowcount_validation_self",
    oracle="""
    SELECT 'orders' AS table_name,
           (SELECT COUNT(*) FROM orders) AS source_rows,
           (SELECT COUNT(*) FROM orders) AS target_rows,
           (SELECT COUNT(*) FROM orders) - (SELECT COUNT(*) FROM orders) AS diff
    """,
)
def rowcount_validation_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "orders").count()
    return spark.createDataFrame(
        [("orders", n, n, 0)], "table_name string, source_rows long, target_rows long, diff long"
    )
