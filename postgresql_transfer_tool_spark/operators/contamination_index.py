"""Persistent benchmark-decontamination index — X4's incremental path.

The same build-once / probe-per-batch inversion as the cross-batch
dedup index (operators/dedup_index.py), applied to benchmark
decontamination (the Brown et al. GPT-3 appendix-C check that
`contamination_ngram_overlap` runs monolithically): the held-out sets'
word-5-gram universe is persisted ONCE as a parquet table bucketed on
``gram``; every incoming training batch tokenizes ITSELF — O(batch) —
and probes its grams against the index. The benchmark corpus is never
re-tokenized, never rescanned, and in the sort-merge path never
shuffled (its bucketed layout satisfies the join distribution; only the
batch side is exchanged). When the gram set is small enough, AQE's
auto-broadcast picks the broadcast plan instead — both plans leave the
per-batch cost ∝ batch.

No explicit broadcast hint: the index relation is an unbounded-leaf
table scan under the registry-wide broadcast-hint sweep's rules
(plans.broadcast_hint_violations), and the RIGHT plan is a runtime size
decision — exactly the class that sweep exists to protect.

Reference parity: extends the reference's incremental "rows not yet
processed" posture (transfer_data_script.py:96-133) to held-out-set
decontamination, the check every training-data pipeline runs per
ingest batch.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.bucketing import index_table_name, write_bucketed
from ..functions.memo import CheckpointMemo, unpersist_checkpoints
from .corpus import _BENCH_MOD, _NGRAM, _SQL_TOKS
from .registry import query

#: bucket count at fixture scale; size like any bucketed layout at 100 TB
N_GRAM_BUCKETS = 16

def _grams_expr():
    # built lazily: F.expr needs an active SparkContext, and operator
    # modules import at registry load time, before any session exists
    return F.expr(
        f"array_distinct(transform(sequence(0, size(toks)-{_NGRAM}),"
        " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],"
        " toks[i+4])))"
    )


def gram_arrays_from_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, grams) — distinct word-5-gram array per document of an
    arbitrary (doc_id, text, ...) relation; documents shorter than
    _NGRAM tokens are dropped (they carry no 5-grams), matching the
    monolithic operator and its oracle."""
    return (
        docs.withColumn("toks", F.split(F.trim("text"), r"\s+"))
        .filter(F.size("toks") >= _NGRAM)
        .select("doc_id", _grams_expr().alias("grams"))
    )


def build_contamination_index(
    spark: SparkSession,
    bench_docs: DataFrame,
    path: str,
    name: str,
    n_buckets: int = N_GRAM_BUCKETS,
) -> str:
    """Persist the DISTINCT gram universe of the held-out corpus as a
    single-column bucketed table; returns the table name. The benchmark
    tokenization cost is paid exactly once, here."""
    pre = gram_arrays_from_docs(bench_docs).localCheckpoint(eager=False)
    grams = pre.select(F.explode("grams").alias("gram")).distinct()
    table = f"{name}_grams"
    write_bucketed(grams, table, path, "gram", n_buckets)
    unpersist_checkpoints(pre)
    return table


def check_batch_contamination(
    spark: SparkSession, batch_docs: DataFrame, grams_table: str
) -> DataFrame:
    """Per-document contamination stats for one training batch probed
    against the persisted gram index: (doc_id, n_grams, n_shared,
    is_contaminated) — the exact output contract of the monolithic
    `contamination_ngram_overlap`, computed without touching the
    benchmark corpus.

    Ownership: the returned plan hides a lazy localCheckpoint (the
    batch's pre-explode gram arrays) that materializes on first action.
    Long-running callers probing batch after batch must release it —
    ``unpersist_checkpoints(result)`` once the result is consumed, or
    park the result in a ``CheckpointMemo`` (the registry query below
    does the latter) — or block-manager storage grows one checkpoint
    per batch for the life of the session."""
    # pre-explode cut: Generate would otherwise re-evaluate the 5-gram
    # transform per OUTPUT element (the dedup.py:94-100 trap)
    pre = gram_arrays_from_docs(batch_docs).localCheckpoint(eager=False)
    train = pre.select("doc_id", F.explode("grams").alias("gram"))
    bench = spark.table(grams_table).select(F.col("gram").alias("bgram"))
    return (
        train.join(bench, train.gram == bench.bgram, "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count("bgram").alias("n_shared"),
            (F.count("bgram") > 0).alias("is_contaminated"),
        )
    )


_CONTIDX_MEMO = CheckpointMemo()


def _index_name(app_id: str, sf_dir: str) -> str:
    return index_table_name("contidx", app_id, sf_dir)


@query(
    "contamination_incremental_index",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
      WHERE len({_SQL_TOKS}) >= {_NGRAM}
    ), g AS (
      SELECT doc_id,
             list_distinct(list_transform(range(len(toks) - {_NGRAM - 1}),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                    || ' ' || toks[i+4] || ' ' || toks[i+5])) AS grams
      FROM t
    ), bench AS (
      SELECT DISTINCT unnest(grams) AS gram FROM g
      WHERE doc_id % {_BENCH_MOD} = 0
    ), train AS (
      SELECT doc_id, unnest(grams) AS gram FROM g
      WHERE doc_id % {_BENCH_MOD} <> 0
    )
    SELECT t.doc_id,
           COUNT(*) AS n_grams,
           COUNT(b.gram) AS n_shared,
           COUNT(b.gram) > 0 AS is_contaminated
    FROM train t LEFT JOIN bench b ON t.gram = b.gram
    GROUP BY t.doc_id
    """,
)
def contamination_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination through the PERSISTED gram index: benchmark =
    doc_id % 50 == 0 (indexed once per session), training batch = the
    rest (probed). The oracle is the monolithic recompute — the same
    SQL as `contamination_ngram_overlap` — proving the index path is
    result-identical while paying only O(batch) per probe."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _CONTIDX_MEMO.get(key)
    if cached is None:
        docs = load_table(spark, sf_dir, "documents").repartition(
            spark.sparkContext.defaultParallelism
        )
        name = _index_name(spark.sparkContext.applicationId, sf_dir)
        table = build_contamination_index(
            spark,
            docs.filter(F.col("doc_id") % _BENCH_MOD == 0),
            tempfile.mkdtemp(prefix=f"{name}_"),
            name,
        )
        probe = check_batch_contamination(
            spark, docs.filter(F.col("doc_id") % _BENCH_MOD != 0), table
        )
        # the original probe plan is registered as an eviction extra:
        # the eager checkpoint's plan no longer references the batch's
        # lazy pre-explode checkpoint hiding in probe's lineage, and the
        # memo must free those blocks too (the r7 ADVICE extras pattern)
        cached = _CONTIDX_MEMO.put(key, probe.localCheckpoint(eager=True), probe)
    return cached
