"""Measure probe latency vs tombstone count for the persistent dedup
index (VERDICT r9 "Next round" #8) — the number behind SCALE.md's
"compaction cadence bounds probe overhead" claim.

Deletions are tombstones anti-joined (broadcast) into every probe until
a compaction folds them physically; the probe therefore pays a per-read
cost proportional to the tombstone backlog. This tool builds the dedup
index over a synthesized 10x corpus (37.5k docs — big enough that the
probe itself dominates scheduler noise), then times the standard batch
probe at a ladder of tombstone backlogs and once more after compaction,
printing one JSON line:

    {"corpus": N, "points": [{"tombstones": n, "probe_sec": s}, ...],
     "post_compaction_sec": s}

Run serialized (never concurrently with bench/pytest):

    python tools/compaction_cadence.py [copies] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tests.scale_corpus import build_scaled_corpus
    from postgresql_transfer_tool_spark.catalog import load_table
    from postgresql_transfer_tool_spark.functions.memo import unpersist_checkpoints
    from postgresql_transfer_tool_spark.operators.dedup_index import (
        build_dedup_index,
        compact_dedup_index,
        dedup_batch_against_index,
        delete_from_dedup_index,
    )

    corpus_dir = tempfile.mkdtemp(prefix="cadence_corpus_")
    build_scaled_corpus(spark, corpus_dir, copies)
    docs = load_table(spark, corpus_dir, "documents").repartition(32, "doc_id")
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0).localCheckpoint(eager=True)
    corpus_ids = [r.doc_id for r in corpus.select("doc_id").collect()]
    corpus_ids.sort()

    name = f"cadence_{uuid.uuid4().hex[:8]}"
    index = build_dedup_index(
        spark, corpus, tempfile.mkdtemp(prefix=name), name
    )

    def probe_sec() -> float:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            res = dedup_batch_against_index(spark, batch, index)
            res.matched.count()
            best = min(best, time.perf_counter() - t0)
            for d in res.checkpoints:
                unpersist_checkpoints(d)
        return round(best, 3)

    probe_sec()  # warm-up: file listing, codegen, shuffle services

    n = len(corpus_ids)
    points = []
    done = 0
    for frac in (0.0, 0.01, 0.10, 0.50):
        target = int(n * frac)
        if target > done:
            delete_from_dedup_index(
                spark,
                index,
                spark.createDataFrame(
                    [(i,) for i in corpus_ids[done:target]], "doc_id bigint"
                ),
            )
            done = target
        points.append({"tombstones": done, "probe_sec": probe_sec()})

    compact_dedup_index(spark, index, tempfile.mkdtemp(prefix=f"{name}_g2"))
    post = probe_sec()

    print(json.dumps({
        "corpus": n,
        "batch": batch.count(),
        "points": points,
        "post_compaction_sec": post,
        "copies": copies,
        "reps": reps,
    }))


if __name__ == "__main__":
    main()
