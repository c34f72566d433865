"""Property test for merge_into: against a reference dict-merge, for
arbitrary target/source key sets and update values.

The invariant (Delta MERGE semantics): matched keys take the source's
update columns, unmatched source keys insert whole rows, unmatched
target keys survive untouched — and the output never duplicates a key.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from postgresql_transfer_tool_spark.operators.merge import merge_into

keys = st.sets(st.integers(0, 40), min_size=1, max_size=25)
vals = st.integers(-1000, 1000)


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(max_examples=12, deadline=None)
@given(tkeys=keys, skeys=keys, seed=vals)
def test_merge_semantics_match_dict_merge(_spark, tkeys, skeys, seed):
    spark = _spark
    target_rows = [(k, k * 10 + seed, f"t{k}") for k in sorted(tkeys)]
    source_rows = [(k, k * 10 + seed + 7, f"s{k}") for k in sorted(skeys)]
    target = spark.createDataFrame(target_rows, ["k", "v", "tag"])
    source = spark.createDataFrame(source_rows, ["k", "v", "tag"])

    merged = merge_into(target, source, key="k", update_cols=["v"])
    got = {r["k"]: (r["v"], r["tag"], r["action"]) for r in merged.collect()}

    expected = {}
    for k, v, tag in target_rows:
        if k in skeys:
            sv = k * 10 + seed + 7
            expected[k] = (sv, tag, "update")  # update takes source v, keeps target tag
        else:
            expected[k] = (v, tag, "keep")
    for k, v, tag in source_rows:
        if k not in tkeys:
            expected[k] = (v, tag, "insert")  # insert takes the whole source row

    assert got == expected
    assert len(got) == len(tkeys | skeys)  # no key duplication, ever
