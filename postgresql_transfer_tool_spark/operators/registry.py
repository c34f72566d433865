"""Query registry — the single source of truth for the driver contract.

Every implemented operator registers (name → Spark callable) and, when the
semantics are ANSI-SQL-expressible, (name → DuckDB oracle SQL). The
``__spark_entry__`` module re-exports the registry as ``queries()`` /
``oracle_sql()``; the verification driver runs both sides at sf=0.01 and
compares row count + schema + order-insensitive value hash.

Rules enforced by convention here (SURVEY.md §5):
- every computed column is aliased identically in Spark and SQL;
- float results go through exact decimal aggregation (functions/exact.py)
  so hashes are engine- and order-independent;
- queries take (spark, sf_dir) and must not mutate session state other
  than temp views.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query, optionally with its DuckDB oracle SQL.

    ``oracle=None`` marks a genuinely non-SQL-expressible operator (the
    driver then records a weaker rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side-effects run."""
    from . import (  # noqa: F401
        relational,
        joins,
        windows,
        setops,
        scalarfuncs,
        constraints,
        incremental,
        analytic,
        tpch_extra,
        dedup,
        similarity,
        text,
        approx,
        multimodal,
        custom_pandas,
    )
