"""Differential test: every registered query vs its DuckDB oracle.

This is the same gate the verification driver runs at sf=0.01, executed
here at sf=0.001 for speed. A query passing here passes the driver's
check modulo scale (all queries are written scale-invariantly: exact
decimal aggregation, deterministic tie-breaks).
"""

from __future__ import annotations

import pytest

from postgresql_transfer_tool_spark.operators import registry
from postgresql_transfer_tool_spark.testing import compare_query

registry.load_all()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    fn = registry.QUERIES[name]
    oracle = registry.ORACLES.get(name)
    res = compare_query(spark, duck, name, fn, oracle, sf_dir)
    assert res.ok, f"{name}: " + "; ".join(res.problems)


def test_every_query_has_oracle_or_is_declared_weak(spark):
    # Rows-only queries are allowed (non-SQL-expressible), but should stay
    # a small minority; this guard keeps us honest about oracle coverage.
    weak = set(registry.QUERIES) - set(registry.ORACLES)
    assert len(weak) <= max(3, len(registry.QUERIES) // 4), (
        f"too many oracle-less queries: {sorted(weak)}"
    )
