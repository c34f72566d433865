"""Catalog-statistics sizing for the ANN family (VERDICT r3 #8).

The adaptive sizes (LSH bit width, IVF/SemDeDup cell count) must come
from parquet footer metadata, not a runtime count() — at 100 TB a
count() is a full scan job just to learn n. Footer num_rows is exact,
so the sizes are identical to what count() produced.
"""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame

from postgresql_transfer_tool_spark.catalog import table_row_count
from postgresql_transfer_tool_spark.operators.similarity import (
    ivf_cells_for,
    lsh_bits_for,
    lsh_candidate_pairs,
)


@pytest.mark.parametrize(
    "sf,n,bits,cells",
    [("sf0.001", 500, 6, 16), ("sf0.01", 500, 6, 16), ("sf0.1", 2000, 8, 64)],
)
def test_footer_count_exact_and_sizes_unchanged(sf, n, bits, cells):
    d = f"/root/testdata/{sf}"
    assert table_row_count(d, "embeddings") == n
    assert lsh_bits_for(n) == bits
    assert ivf_cells_for(n) == cells


def test_ann_sizing_runs_no_count_job(spark, sf_dir, monkeypatch):
    """Building + executing the LSH candidate plan must never call
    DataFrame.count() — sizing reads the footer instead."""

    def boom(self):
        raise AssertionError("DataFrame.count() called during ANN sizing")

    monkeypatch.setattr(DataFrame, "count", boom)
    df = lsh_candidate_pairs(spark, sf_dir)
    assert df.limit(1).collect() is not None
