"""Fifth scale point — 1000×sf0.1, single family (round-13 VERDICT #7).

The 100× suite (500k docs) is green; this pushes ONE family —
MinHash-LSH through its PERSISTENT index — to ~5M documents to find
the next wall: index build wall-clock, files-per-bucket in the
bucketed band/shingle tables (the small-files failure mode), and the
probe's candidates/doc at a realistic batch size.

Documents-only corpus (the embeddings families keep their 100× point):
the same per-copy character-class bijections as scale_corpus, written
in APPEND CHUNKS of 100 copies — a single 1000-branch union plan costs
Catalyst quadratic analysis time; ten 100-branch plans do not.

Opt-in via SPARK_GRAFT_SWEEP_1000X=1 (heavier than the 100× sweep:
~5 GB of corpus + index writes). Measurements recorded in SCALE.md.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from scale_corpus import ID_STRIDE, permuted_alphabet

from postgresql_transfer_tool_spark.catalog import load_table, table_row_count

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SWEEP_1000X"),
    reason="1000x sweep is opt-in (SPARK_GRAFT_SWEEP_1000X=1)",
)

SF_MID = "/root/testdata/sf0.1"
COPIES = 1000
CHUNK = 100
N_FILES = 64


def _build_docs_corpus(spark, out_dir: str) -> None:
    assert COPIES * 5000 < ID_STRIDE
    docs = load_table(spark, SF_MID, "documents")
    path = f"{out_dir}/documents.parquet"
    for lo in range(0, COPIES, CHUNK):
        parts = []
        for k in range(lo, lo + CHUNK):
            if k == 0:
                parts.append(docs)
                continue
            src, dst = permuted_alphabet(k)
            parts.append(
                docs.select(
                    (F.col("doc_id") + k * ID_STRIDE).alias("doc_id"),
                    F.translate("text", src, dst).alias("text"),
                    "lang", "source", "n_chars",
                )
            )
        d = parts[0]
        for p in parts[1:]:
            d = d.unionByName(p)
        d.repartition(N_FILES // (COPIES // CHUNK) or 1).write.mode(
            "append"
        ).parquet(path)


@pytest.fixture(scope="module")
def x1000_dir(spark):
    out = tempfile.mkdtemp(prefix="x1000_corpus_")
    t0 = time.time()
    _build_docs_corpus(spark, out)
    print(f"1000x corpus build: {time.time() - t0:.0f}s", flush=True)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def _files_per_bucket(spark, table: str) -> tuple[float, int]:
    """(mean, max) parquet files per bucket of a bucketed table —
    bucket id is encoded in the file name's _NNNNN suffix."""
    from postgresql_transfer_tool_spark.functions.index_base import (
        table_location,
    )

    loc = table_location(spark, table)
    counts: dict[int, int] = {}
    for f in os.listdir(loc):
        m = re.search(r"_(\d{5})(?:[._]|$)", f)
        if f.endswith(".parquet") and m:
            b = int(m.group(1))
            counts[b] = counts.get(b, 0) + 1
    assert counts, f"no bucketed files under {loc}"
    vals = list(counts.values())
    return sum(vals) / len(vals), max(vals)


def test_minhash_index_1000x(spark, x1000_dir):
    """5M documents through the persistent MinHash-LSH index:

    1. one-time index build (the only corpus-sized shuffle) completes,
       timed;
    2. files-per-bucket stays sane (the bucketed layout's small-files
       wall);
    3. a 12.5k-doc batch probe is candidate-bounded: candidates/doc
       within the same ceiling every smaller point obeys, and the
       probe never rescans the corpus.
    """
    from postgresql_transfer_tool_spark.operators.dedup_index import (
        build_dedup_index,
        dedup_batch_against_index,
    )

    n_docs = table_row_count(x1000_dir, "documents")
    assert n_docs == COPIES * 5000

    docs = load_table(spark, x1000_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 400 != 0)
    batch = docs.filter(F.col("doc_id") % 400 == 0)

    name = "ddidx1000x"
    t0 = time.time()
    index = build_dedup_index(
        spark, corpus, tempfile.mkdtemp(prefix=name), name
    )
    build_s = time.time() - t0
    mean_b, max_b = _files_per_bucket(spark, index.bands_table)
    mean_s, max_s = _files_per_bucket(spark, index.shingles_table)
    print(
        f"1000x index: build {build_s:.0f}s  files/bucket "
        f"bands mean {mean_b:.1f} max {max_b}  "
        f"shingles mean {mean_s:.1f} max {max_s}",
        flush=True,
    )

    n_batch = batch.count()
    t0 = time.time()
    res = dedup_batch_against_index(spark, batch, index)
    n_cand = res.matched.count() if hasattr(res, "matched") else -1
    novel = res.novel_ids.count()
    probe_s = time.time() - t0
    print(
        f"1000x probe: batch {n_batch}  matched-pairs {n_cand}  "
        f"novel {novel}  wall {probe_s:.0f}s  "
        f"pairs/doc {n_cand / n_batch:.2f}",
        flush=True,
    )
    assert n_cand / n_batch <= 50, (n_cand, n_batch)
    assert 0 < novel <= n_batch
    for d in res.checkpoints:
        from postgresql_transfer_tool_spark.functions.memo import (
            unpersist_checkpoints,
        )

        unpersist_checkpoints(d)
    for t in (index.bands_table, index.shingles_table,
              f"{name}_tombstones", f"{name}_stamps"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
