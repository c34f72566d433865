"""Guards on the map-side vectorized ANN helpers (ADVICE r5):

- ``top_cells_by_cosine`` with a centroid sample smaller than k would
  emit duplicate cell ids while the SQL oracle's ``crk <= k`` window
  emits fewer rows — silent parity break; it must refuse at
  construction.
- a zero-norm query vector (nq = 0) makes every cosine NaN, the
  all-False argmax scan then picks int64-max and ``searchsorted``
  indexes past the centroid array — an opaque IndexError; it must
  raise a clear error instead.
"""

import pytest

from postgresql_transfer_tool_spark.operators.similarity import (
    argmin_cell_sqdist,
    top_cells_by_cosine,
)

CENT = [(0, [1, 0], 1), (1, [0, 1], 1), (2, [1, 1], 2)]


def test_rejects_centroid_sample_smaller_than_k():
    with pytest.raises(ValueError, match="< k"):
        top_cells_by_cosine(CENT, 4)
    with pytest.raises(ValueError, match="empty"):
        top_cells_by_cosine([], 1)
    with pytest.raises(ValueError, match="empty"):
        argmin_cell_sqdist([])


def test_rejects_zero_norm_query_vector(spark):
    udf = top_cells_by_cosine(CENT, 2)
    zero = spark.createDataFrame([([0, 0], 0)], "qe array<bigint>, nq bigint")
    with pytest.raises(Exception, match="zero-norm"):
        zero.select(udf("qe", "nq")).collect()


def test_valid_vectors_still_rank(spark):
    udf = top_cells_by_cosine(CENT, 2)
    ok = spark.createDataFrame(
        [([2, 1], 5), ([0, 3], 9)], "qe array<bigint>, nq bigint"
    )
    rows = ok.select(udf("qe", "nq").alias("c")).collect()
    # [2,1]: cos→ 2/√5≈.894, 1/√5≈.447, 3/√10≈.949 ⇒ [2, 0]; [0,3] ⇒ [1, 2]
    assert rows[0]["c"] == [2, 0]
    assert rows[1]["c"] == [1, 2]
