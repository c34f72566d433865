"""Property tests for winnowing fingerprints (text.winnow_fps_from).

1. The Spark array-expression pipeline matches a pure-Python winnowing
   fold (hashlib.md5, explicit window scan) on arbitrary documents.
2. The SIGMOD'03 guarantee: two documents sharing a substring of length
   >= K + W - 1 (after whitespace-strip + lowercase normalization)
   share at least one fingerprint.
"""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from postgresql_transfer_tool_spark.operators.text import (
    WINNOW_K,
    WINNOW_W,
    winnow_fps_from,
)

#: Alphabet kept small so k-gram collisions/repeats actually occur.
doc_text = st.text(alphabet="ab X", min_size=0, max_size=60)


def _py_winnow(text: str) -> set[int]:
    """Reference implementation: the set of all window-minimum hashes."""
    s = re.sub(r"\s+", "", text).lower()
    k, w = WINNOW_K, WINNOW_W
    if len(s) < k + w - 1:
        return set()
    hs = [
        int(hashlib.md5(s[i : i + k].encode()).hexdigest()[:8], 16)
        for i in range(len(s) - k + 1)
    ]
    return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}


def _spark_winnow(spark, texts: list[str]) -> dict[int, set[int]]:
    docs = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    out = winnow_fps_from(docs).collect()
    got = {r["doc_id"]: set(r["fps"]) for r in out}
    # Docs below the minimum normalized length are filtered out entirely.
    for i in range(len(texts)):
        got.setdefault(i, set())
    return got


@settings(max_examples=10, deadline=None)
@given(texts=st.lists(doc_text, min_size=1, max_size=6))
def test_spark_matches_python_winnowing(spark, texts):
    got = _spark_winnow(spark, texts)
    for i, t in enumerate(texts):
        assert got[i] == _py_winnow(t), f"doc {i}: {t!r}"


@settings(max_examples=10, deadline=None)
@given(
    prefix_a=doc_text,
    prefix_b=doc_text,
    shared=st.text(alphabet="abcd", min_size=WINNOW_K + WINNOW_W - 1, max_size=20),
)
def test_shared_substring_shares_fingerprint(spark, prefix_a, prefix_b, shared):
    # Plant the same >= K+W-1 run in both docs; the winnowing guarantee
    # says their fingerprint sets must intersect.
    a = prefix_a + shared
    b = prefix_b + shared
    got = _spark_winnow(spark, [a, b])
    assert got[0] & got[1], (a, b)
