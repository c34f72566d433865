"""End-to-end incremental ingest funnel — the persistent indexes
composing into the actual 100 TB admission pipeline (round 9).

Every prior query exercises ONE index; a real training-data pipeline
runs them as a per-batch funnel: near-dup admission against the
accumulated corpus (operators/dedup_index.py), benchmark
decontamination against the held-out gram index
(operators/contamination_index.py), then a cheap quality gate — and
emits one admission decision per incoming document with the evidence
columns downstream audits need. This module is that composition, and
its oracle recomputes the WHOLE funnel monolithically (the dedup
verified-pairs CTE is shared verbatim with the dedup oracles —
operators/dedup_index.verified_pairs_cte — so all three driver rows
prove parity against literally the same SQL).

100 TB posture: the funnel inherits the indexes' cost model — per-batch
work ∝ batch (bucketed index sides never shuffled or rescanned), and
the three stages compose as ONE Spark plan over the batch (two left
joins against batch-sized relations), so admission adds no extra scan
of anything corpus-sized.

Reference parity: the reference's closest analog is the unsynced-flag
loop (transfer_data_script.py:96-133) — "rows not yet copied" decided
per batch; this funnel generalizes the admission predicate from
"not yet copied" to "novel ∧ uncontaminated ∧ above quality floor".
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.bucketing import index_table_name
from ..functions.memo import CheckpointMemo
from .contamination_index import build_contamination_index, check_batch_contamination
from .corpus import _BENCH_MOD, _NGRAM, _SQL_TOKS
from .dedup import JACCARD_THRESHOLD
from .dedup_index import (
    BATCH_MOD,
    build_dedup_index,
    dedup_batch_against_index,
    verified_pairs_cte,
)
from .registry import query

#: quality floor: documents shorter than this many whitespace tokens
#: are rejected regardless of novelty/contamination
MIN_TOKENS = 10

_INGEST_MEMO = CheckpointMemo()


def _contamination_cte() -> str:
    """The contamination half of the funnel CTE chain (ftoks → fcont):
    per-batch-doc benchmark-gram overlap stats. Shared by every funnel
    oracle — the id-ordered ones and the watermarked late-data one,
    whose dup rules differ but whose contamination stage is identical
    (lateness never reaches the gram probe; per-doc stats are
    arrival-independent)."""
    return f"""ftoks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
    fg AS (
      SELECT doc_id,
             list_distinct(list_transform(range(len(t) - {_NGRAM - 1}),
               i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                    || ' ' || t[i+4] || ' ' || t[i+5])) AS grams
      FROM ftoks WHERE len(t) >= {_NGRAM}
    ),
    fbench AS (
      SELECT DISTINCT unnest(grams) AS gram FROM fg
      WHERE doc_id % {_BENCH_MOD} = 0
    ),
    ftrain AS (
      SELECT doc_id, unnest(grams) AS gram FROM fg
      WHERE doc_id % {BATCH_MOD} = 0
    ),
    fcont AS (
      SELECT t.doc_id,
             COUNT(*) AS n_grams,
             COUNT(b.gram) AS n_shared,
             COUNT(b.gram) > 0 AS isc
      FROM ftrain t LEFT JOIN fbench b ON t.gram = b.gram
      GROUP BY t.doc_id
    )"""


def _funnel_cte() -> str:
    """The funnel's f-prefixed CTE chain (text-dup set + contamination
    stats), appended after :func:`verified_pairs_cte`. Shared by the
    plain funnel oracle and the ANN-composed one."""
    return f"""fdups AS (
      SELECT DISTINCT CASE
        WHEN doc_a % {BATCH_MOD} = 0 AND doc_b % {BATCH_MOD} = 0 THEN doc_b
        WHEN doc_a % {BATCH_MOD} = 0 THEN doc_a
        ELSE doc_b END AS doc_id
      FROM verified WHERE jaccard >= {JACCARD_THRESHOLD}
    ),
    {_contamination_cte()}"""


def _funnel_oracle() -> str:
    """Monolithic recompute of the whole funnel. CTE namespace: the
    shared verified-pairs chain claims toks/sh/hashed/hsh/sigs/sigs2/
    bands/cand/counts/inter/verified; the funnel adds f-prefixed ones."""
    return f"""
    WITH {verified_pairs_cte()},
    {_funnel_cte()}
    SELECT d.doc_id,
           (dp.doc_id IS NULL) AS is_novel,
           COALESCE(c.n_grams, 0) AS n_grams,
           COALESCE(c.n_shared, 0) AS n_shared,
           COALESCE(c.isc, FALSE) AS is_contaminated,
           len({_SQL_TOKS}) AS n_tokens,
           ((dp.doc_id IS NULL) AND NOT COALESCE(c.isc, FALSE)
            AND len({_SQL_TOKS}) >= {MIN_TOKENS}) AS admitted
    FROM documents d
    LEFT JOIN fdups dp ON dp.doc_id = d.doc_id
    LEFT JOIN fcont c ON c.doc_id = d.doc_id
    WHERE d.doc_id % {BATCH_MOD} = 0
    """


def funnel_decisions(
    batch: DataFrame, novel_ids: DataFrame, cont: DataFrame
) -> DataFrame:
    """The funnel's per-document admission decision relation:
    (doc_id, is_novel, n_grams, n_shared, is_contaminated, n_tokens,
    admitted) from one batch's docs, its dedup-probe novel ids, and its
    contamination stats. One Spark plan — two left joins against
    batch-sized relations plus per-row expressions; shared verbatim by
    the batch query below and the streaming sink
    (streaming/ingest_funnel.py), so both paths decide admission with
    literally the same code."""
    n_tokens = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    out = (
        batch.select("doc_id", n_tokens.alias("n_tokens"))
        .join(
            novel_ids.withColumn("is_novel", F.lit(True)),
            "doc_id",
            "left",
        )
        .join(cont, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("is_novel", F.lit(False)).alias("is_novel"),
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce("n_shared", F.lit(0).cast("long")).alias("n_shared"),
            F.coalesce("is_contaminated", F.lit(False)).alias(
                "is_contaminated"
            ),
            "n_tokens",
        )
    )
    return out.withColumn(
        "admitted",
        F.col("is_novel")
        & ~F.col("is_contaminated")
        & (F.col("n_tokens") >= MIN_TOKENS),
    )


@query("incremental_ingest_funnel", oracle=_funnel_oracle())
def incremental_ingest_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document admission decision for one incoming batch
    (doc_id % 4 == 0) against the accumulated corpus: novel under the
    persistent near-dup index, clean under the persistent benchmark
    gram index, and above the MIN_TOKENS quality floor — with the
    evidence columns (pair/gram counts) an audit trail needs. The
    oracle recomputes all three stages monolithically; matching it
    proves the composed incremental path end-to-end, not just each
    index in isolation."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _INGEST_MEMO.get(key)
    if cached is None:
        docs = load_table(spark, sf_dir, "documents").repartition(
            spark.sparkContext.defaultParallelism, "doc_id"
        )
        batch = docs.filter(F.col("doc_id") % BATCH_MOD == 0)
        app = spark.sparkContext.applicationId

        dname = index_table_name("ddidxf", app, sf_dir)
        index = build_dedup_index(
            spark,
            docs.filter(F.col("doc_id") % BATCH_MOD != 0),
            tempfile.mkdtemp(prefix=f"{dname}_"),
            dname,
        )
        res = dedup_batch_against_index(spark, batch, index)

        gname = index_table_name("contidxf", app, sf_dir)
        gtable = build_contamination_index(
            spark,
            docs.filter(F.col("doc_id") % _BENCH_MOD == 0),
            tempfile.mkdtemp(prefix=f"{gname}_"),
            gname,
        )
        cont = check_batch_contamination(spark, batch, gtable)

        out = funnel_decisions(batch, res.novel_ids, cont)
        # extras: the probe/contamination plans hide the batch's lazy
        # pre-explode checkpoints (the r7 ADVICE extras pattern)
        cached = _INGEST_MEMO.put(
            key, out.localCheckpoint(eager=True), *res.checkpoints, cont
        )
    return cached


@query("streaming_ingest_funnel", oracle=_funnel_oracle())
def streaming_ingest_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same admission funnel run as a STREAM: the incoming batch cut
    into three nondecreasing doc_id ranges (the monotone-serial HWM
    contract of the reference's incremental loop,
    transfer_data_script.py:96-133) and pushed epoch-by-epoch through
    the composed foreachBatch sink (streaming/ingest_funnel.py —
    per-epoch: dedup-index probe → contamination probe → quality floor →
    decision record → index extension, exactly-once). The union of the
    three epochs' decision records must hash-match the SAME monolithic
    DuckDB oracle as `incremental_ingest_funnel` — proving the streamed
    composition, including the cross-epoch index growth, ≡ the one-shot
    batch computation. The real readStream delivery of the identical
    sink (file source, epoch files, replay after crash/checkpoint wipe)
    is pinned by tests/test_streaming_ingest_funnel.py; this row pins
    the epoch-wise semantics cross-engine."""
    key = (spark.sparkContext.applicationId, sf_dir, "streaming")
    cached = _INGEST_MEMO.get(key)
    if cached is None:
        out = _run_streaming_funnel(spark, sf_dir, with_ann=False)
        cached = _INGEST_MEMO.put(key, out)
    return cached


@query("streaming_ingest_funnel_maintained", oracle=_funnel_oracle())
def streaming_ingest_funnel_maintained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The streamed funnel with SINK-INTEGRATED MAINTENANCE armed
    (round 11 — streaming/maintenance.py): a forced index compaction
    fires BETWEEN epochs (every_epochs=2 with a zero files/bucket
    threshold ⇒ the dedup index is physically rewritten, generation-
    swapped, and re-bucketed mid-stream), and the decision union must
    STILL hash-match the same monolithic DuckDB oracle as
    `incremental_ingest_funnel` — compaction is storage hygiene, not a
    semantic operation, proved cross-engine rather than asserted. The
    long-run (20-epoch) form with file-count/bit-equality/plan
    assertions is tests/test_streaming_maintenance.py; this row pins
    the invariant at the driver gate."""
    from ..streaming.maintenance import MaintenancePolicy

    key = (spark.sparkContext.applicationId, sf_dir, "maintained")
    cached = _INGEST_MEMO.get(key)
    if cached is None:
        out = _run_streaming_funnel(
            spark,
            sf_dir,
            with_ann=False,
            maintenance=MaintenancePolicy(
                every_epochs=2, max_files_per_bucket=0
            ),
            tag="sm",
        )
        cached = _INGEST_MEMO.put(key, out)
    return cached


@query("partitioned_ingest_funnel", oracle=_funnel_oracle())
def partitioned_ingest_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The admission funnel run as TWO CONCURRENT PARTITIONED STREAMS
    over one shared index (round 12 —
    streaming/multi_admission.PartitionedFunnelStreams): each epoch is
    hash-split on doc_id, both streams publish their slices' signatures
    under the contended writer lock, barrier, then decide in parallel
    with the inclusive-index dup rule. The merged per-stream decision
    records must hash-match the SAME monolithic DuckDB oracle as
    `streaming_ingest_funnel` — horizontal admission parallelism with
    zero semantic drift, the throughput-ceiling fix the single-stream
    sink's docstring could previously only prescribe. N∈{2,4}
    equivalence, the per-stream crash matrix, and lock-contention
    starvation checks are pinned by tests/test_multi_admission.py."""
    key = (spark.sparkContext.applicationId, sf_dir, "partitioned")
    cached = _INGEST_MEMO.get(key)
    if cached is None:
        out = _run_streaming_funnel(
            spark, sf_dir, with_ann=False, tag="pf", n_streams=2
        )
        cached = _INGEST_MEMO.put(key, out)
    return cached


@query("streaming_funnel_archived_history", oracle=_funnel_oracle())
def streaming_funnel_archived_history(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Archive-then-prune preserves the COMPLETE decisions relation
    (VERDICT r11 #4): the streamed funnel runs with the most aggressive
    retention the policy allows (keep_records=1, evaluated after every
    epoch) and ``archive_root`` armed, so the first two epochs' decision
    records are archived and physically PRUNED mid-stream; the unified
    read-back (exactly_once.full_epoch_history — union(archive, live),
    live wins on overlap) must still hash-match the same monolithic
    DuckDB oracle as `streaming_ingest_funnel`. This is the row that
    turns the archive from write-only insurance into a verified product
    history: replay state is reclaimed, downstream reads lose
    nothing."""
    import tempfile as _tempfile

    from ..streaming.maintenance import MaintenancePolicy

    key = (spark.sparkContext.applicationId, sf_dir, "archived")
    cached = _INGEST_MEMO.get(key)
    if cached is None:
        out = _run_streaming_funnel(
            spark,
            sf_dir,
            with_ann=False,
            maintenance=MaintenancePolicy(
                every_epochs=1,
                max_files_per_bucket=10**6,  # compaction is not under test
                keep_records=1,
                archive_root=_tempfile.mkdtemp(prefix="funnel_archive_"),
            ),
            tag="sh",
            read_full_history=True,
        )
        cached = _INGEST_MEMO.put(key, out)
    return cached


def _run_streaming_funnel(
    spark: SparkSession,
    sf_dir: str,
    with_ann: bool,
    grow_ann: bool = False,
    maintenance=None,
    tag: str | None = None,
    source_budget: int | None = None,
    read_full_history: bool = False,
    n_streams: int | None = None,
    with_media: bool = False,
) -> DataFrame:
    """Shared driver body for the streaming funnel rows: build the
    probe-only side indexes (+ the IVF index when ``with_ann``), cut the
    batch into three nondecreasing doc_id ranges, push them through one
    IngestFunnelSink — or, when ``n_streams`` is set, through the
    N-way PartitionedFunnelStreams coordinator (round 12) — and return
    the union of decision records. The epoch cut uses two scalar
    percentile boundaries — a partial-aggregatable scan, no global sort
    (NTILE would funnel every row through one task)."""
    from ..streaming.ingest_funnel import IngestFunnelSink
    from ..streaming.multi_admission import PartitionedFunnelStreams

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    batch = docs.filter(F.col("doc_id") % BATCH_MOD == 0)
    app = spark.sparkContext.applicationId
    if tag is None:
        tag = ("sg" if grow_ann else "sa") if with_ann else "s"

    dname = index_table_name(f"ddidx{tag}", app, sf_dir)
    index = build_dedup_index(
        spark,
        docs.filter(F.col("doc_id") % BATCH_MOD != 0),
        tempfile.mkdtemp(prefix=f"{dname}_"),
        dname,
    )
    gname = index_table_name(f"contidx{tag}", app, sf_dir)
    gtable = build_contamination_index(
        spark,
        docs.filter(F.col("doc_id") % _BENCH_MOD == 0),
        tempfile.mkdtemp(prefix=f"{gname}_"),
        gname,
    )
    ann_kwargs = {}
    emb_cols = []
    if with_media:
        from .multimodal import build_media_fp_index

        mname = index_table_name(f"mfpidx{tag}", app, sf_dir)
        ann_kwargs["media_index"] = build_media_fp_index(
            spark,
            docs.filter(F.col("doc_id") % BATCH_MOD != 0),
            tempfile.mkdtemp(prefix=f"{mname}_"),
            mname,
        )
    if with_ann:
        from .ann_index import build_ann_index
        from .similarity import _spark_quantized_materialized, NPROBE

        qv = _spark_quantized_materialized(spark, sf_dir).select(
            "vec_id", "qe", "nq"
        )
        aname = index_table_name(f"annidx{tag}", app, sf_dir)
        ann_kwargs = {
            "ann_index": build_ann_index(
                spark,
                qv.filter(F.col("vec_id") % BATCH_MOD != 0),
                tempfile.mkdtemp(prefix=f"{aname}_"),
                aname,
            ),
            "embeddings": qv,
            "nprobe": NPROBE,
            "grow_ann": grow_ann,
        }
        emb_cols = ["is_emb_novel", "nn_cosine"]
    if n_streams is not None:
        if ann_kwargs or maintenance:
            raise ValueError(
                "partitioned admission composes with the text funnel "
                "(optionally budget-gated) only"
            )
        sink = PartitionedFunnelStreams(
            spark,
            index,
            gtable,
            tempfile.mkdtemp(prefix=f"{dname}_pfunnel_"),
            n_streams=n_streams,
            # the budget gate scales horizontally only under source
            # routing (each stream owns its sources' token state)
            slice_by="source" if source_budget is not None else "doc_id",
            source_budget=source_budget,
        )
    else:
        sink = IngestFunnelSink(
            spark,
            index,
            gtable,
            tempfile.mkdtemp(prefix=f"{dname}_funnel_"),
            maintenance=maintenance,
            source_budget=source_budget,
            **ann_kwargs,
        )
    b1, b2 = batch.select(
        F.percentile("doc_id", 1 / 3), F.percentile("doc_id", 2 / 3)
    ).first()
    for epoch, ep_df in enumerate(
        (
            batch.filter(F.col("doc_id") <= b1),
            batch.filter((F.col("doc_id") > b1) & (F.col("doc_id") <= b2)),
            batch.filter(F.col("doc_id") > b2),
        )
    ):
        sink(ep_df, epoch)
    if source_budget is not None:
        base_cols = ["doc_id", "source", "is_novel", "is_contaminated",
                     "n_tokens", "admitted"]
    else:
        base_cols = (
            ["doc_id", "is_novel"]
            + (emb_cols if with_ann else ["n_grams", "n_shared"])
            + (["is_media_novel"] if with_media else [])
            + ["is_contaminated", "n_tokens", "admitted"]
        )
    decided = (
        sink.decisions_full_history() if read_full_history else sink.decisions()
    )
    return decided.select(*base_cols)


# ---------------------------------------------------------------------------
# ANN-composed funnel (round 10): the index trilogy completed. The plain
# funnel composes the near-dup TEXT index and the contamination gram
# index; real curation pipelines also reject documents whose EMBEDDING
# is a near-duplicate of the accumulated corpus (SemDeDup-style semantic
# dedup — paraphrases and translations share no shingles but sit at high
# cosine). This stage probes the third persistent index — the IVF cells
# table of operators/ann_index.py — for each batch document's nearest
# accumulated neighbor and adds "embedding-novel" to the admission
# predicate. The probe is the production ANN path (nprobe cells under
# the deterministic centroid rule, map-side assignment, bucketed cells
# never reshuffled), NOT the quadratic exact baseline; the oracle
# mirrors the IVF semantics exactly (same CTE chain as ann_ivf_topk,
# restricted to the corpus split), so approximate-but-deterministic
# search is hash-verified cross-engine.
# ---------------------------------------------------------------------------

#: embedding near-dup admission threshold — the same cosine the
#: monolithic semantic-dedup operator uses (operators/dedup.py)
from .dedup import COSINE_NEARDUP_THRESHOLD as TAU_EMB  # noqa: E402


def _funnel_ann_oracle(growing: bool = False) -> str:
    """Monolithic recompute of the trilogy funnel. ``growing`` switches
    the embedding stage's candidate rule from "nearest corpus vector in
    the probed cells" to "nearest corpus OR lower-id batch vector in the
    probed cells" — the epoch-invariant rule the growing-index streaming
    sink implements (batch vectors addressed under the SAME frozen
    corpus centroids, `ebassigned`)."""
    from .similarity import (
        _SQL_DOT,
        _SQL_QUANTIZED,
        DIM,
        MAX_CELL_BITS,
        MIN_CELL_BITS,
        NPROBE,
        TARGET_CELL,
    )

    cell_cos = (
        f"CAST(list_sum(list_transform(range({DIM}),"
        " i -> v.qe[i+1] * c.ce[i+1])) AS DOUBLE)"
        " / (sqrt(CAST(v.nq AS DOUBLE)) * sqrt(CAST(c.ncent AS DOUBLE)))"
    )
    growing_ctes = f"""
    ebassigned AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT v.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY {cell_cos} DESC, c.cid) AS crk
        FROM eb v, ecent c
      ) WHERE crk = 1
    ),""" if growing else ""
    batch_cand = """
      UNION ALL
      SELECT p.query_id, b.vec_id AS neighbor_id
      FROM eprobes p JOIN ebassigned b ON b.cell = p.cell
      WHERE b.vec_id < p.query_id""" if growing else ""
    return f"""
    WITH {verified_pairs_cte()},
    {_funnel_cte()},
    {_SQL_QUANTIZED},
    eq AS (SELECT vec_id, qe, nq FROM q WHERE vec_id % {BATCH_MOD} <> 0),
    eparams AS (
      SELECT nc, GREATEST(1, cnt // nc) AS stride FROM (
        SELECT COUNT(*) AS cnt,
               CAST(POWER(2, LEAST({MAX_CELL_BITS}, GREATEST({MIN_CELL_BITS},
                 length(bin((COUNT(*) - 1) // {TARGET_CELL}))))) AS BIGINT) AS nc
        FROM eq) p0
    ),
    ecent AS (
      SELECT vec_id AS cid, qe AS ce, nq AS ncent FROM eq
      WHERE (CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT)
             % (SELECT stride FROM eparams)) = 0
    ),
    escored AS (
      SELECT v.vec_id, c.cid,
             ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                ORDER BY {cell_cos} DESC, c.cid) AS crk
      FROM eq v, ecent c
    ),
    eassigned AS (SELECT vec_id, cid AS cell FROM escored WHERE crk = 1),
    eb AS (
      SELECT vec_id, qe, nq FROM q
      WHERE vec_id % {BATCH_MOD} = 0
        AND vec_id IN (SELECT doc_id FROM documents)
    ),{growing_ctes}
    eprobes AS (
      SELECT vec_id AS query_id, cid AS cell FROM (
        SELECT v.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY {cell_cos} DESC, c.cid) AS crk
        FROM eb v, ecent c
      ) WHERE crk <= {NPROBE}
    ),
    ecand AS (
      SELECT p.query_id, s.vec_id AS neighbor_id
      FROM eprobes p JOIN eassigned s ON s.cell = p.cell
      WHERE s.vec_id <> p.query_id{batch_cand}
    ),
    enn AS (
      SELECT c.query_id,
             MAX(CAST({_SQL_DOT} AS DOUBLE)
                 / (sqrt(CAST(a.nq AS DOUBLE)) * sqrt(CAST(b.nq AS DOUBLE)))
             ) AS nn_cosine
      FROM ecand c
      JOIN q a ON a.vec_id = c.query_id
      JOIN q b ON b.vec_id = c.neighbor_id
      GROUP BY c.query_id
    )
    SELECT d.doc_id,
           (dp.doc_id IS NULL) AS is_novel,
           (COALESCE(e.nn_cosine, 0.0) < {TAU_EMB}) AS is_emb_novel,
           COALESCE(e.nn_cosine, 0.0) AS nn_cosine,
           COALESCE(c.isc, FALSE) AS is_contaminated,
           len({_SQL_TOKS}) AS n_tokens,
           ((dp.doc_id IS NULL) AND COALESCE(e.nn_cosine, 0.0) < {TAU_EMB}
            AND NOT COALESCE(c.isc, FALSE)
            AND len({_SQL_TOKS}) >= {MIN_TOKENS}) AS admitted
    FROM documents d
    LEFT JOIN fdups dp ON dp.doc_id = d.doc_id
    LEFT JOIN fcont c ON c.doc_id = d.doc_id
    LEFT JOIN enn e ON e.query_id = d.doc_id
    WHERE d.doc_id % {BATCH_MOD} = 0
    """


def apply_embedding_stage(decisions: DataFrame, nn: DataFrame) -> DataFrame:
    """Fold the embedding-novelty stage into a funnel decision relation:
    left-join each doc's nearest accumulated neighbor cosine (``nn``:
    (doc_id, nn_raw), absent rows ⇒ no probed candidate ⇒ novel) and
    re-derive the admission predicate with the extra conjunct. Shared
    by the batch query below and the streaming sink, like
    :func:`funnel_decisions`."""
    nnc = F.coalesce(F.col("nn_raw"), F.lit(0.0))
    emb_novel = nnc < TAU_EMB
    return decisions.join(nn, "doc_id", "left").select(
        "doc_id",
        "is_novel",
        emb_novel.alias("is_emb_novel"),
        nnc.alias("nn_cosine"),
        "is_contaminated",
        "n_tokens",
        (
            F.col("is_novel")
            & emb_novel
            & ~F.col("is_contaminated")
            & (F.col("n_tokens") >= MIN_TOKENS)
        ).alias("admitted"),
    )


def apply_media_stage(decisions: DataFrame, media_novel: DataFrame) -> DataFrame:
    """Fold the cross-modal media stage into a funnel decision relation
    (round-13 VERDICT #3): left-join the media-novel id set from the
    persistent fingerprint index probe
    (operators/multimodal.probe_media_fp — absent row ⇒ a media-dup)
    and re-derive admission with the extra conjunct, making the
    REJECTION rule text-dup OR media-dup. Shared by the streaming sink
    and the batch composition, like :func:`funnel_decisions`."""
    cols = [c for c in decisions.columns if c != "admitted"]
    m_novel = F.coalesce(F.col("_m_novel"), F.lit(False))
    return decisions.join(
        media_novel.select("doc_id").withColumn("_m_novel", F.lit(True)),
        "doc_id",
        "left",
    ).select(
        *cols,
        m_novel.alias("is_media_novel"),
        (F.col("admitted") & m_novel).alias("admitted"),
    )


def embedding_nn_probe(
    spark: SparkSession,
    batch_doc_ids: DataFrame,
    embeddings: DataFrame,
    ann_index,
    nprobe: int,
) -> DataFrame:
    """(doc_id, nn_raw): each batch doc's nearest accumulated neighbor
    cosine through the persisted IVF index — top-1 over ``nprobe``
    probed cells, the production ANN path. Docs without an embedding
    row simply produce no probe (and stay embedding-novel)."""
    from .ann_index import ann_query_index

    batch_v = embeddings.join(
        batch_doc_ids.select(F.col(batch_doc_ids.columns[0]).alias("vec_id")),
        "vec_id",
        "left_semi",
    )
    return ann_query_index(
        spark, batch_v, ann_index, nprobe=nprobe, topk=1
    ).select(
        F.col("query_id").alias("doc_id"), F.col("cosine").alias("nn_raw")
    )


def embedding_nn_probe_growing(
    spark: SparkSession,
    batch_doc_ids: DataFrame,
    embeddings: DataFrame,
    ann_index,
    nprobe: int,
) -> DataFrame:
    """(doc_id, nn_raw) for the GROWING-index admission rule: each batch
    doc's nearest neighbor over the persisted IVF cells ∪ LOWER-ID batch
    vectors assigned to its probed cells — the embedding analog of the
    dedup rule "matches any indexed doc or a lower-id batch doc"
    (operators/dedup_index.dedup_batch_against_index), which is what
    makes the decision epoch-cut-invariant: with id-ordered epochs and a
    seen=probed index extension, every earlier-epoch vector sits in the
    index at a lower id and every same-epoch lower-id vector is covered
    by the batch-local side, so N streamed epochs ≡ the monolithic batch
    rule. Cell addressing is FROZEN (the corpus-built centroid sample)
    for both sides, so assignments never depend on when a vector
    arrived. Cost: the index side is the standard probe (bucketed cells
    never reshuffled); the batch-local side joins two batch-sized
    relations on cell — per-batch work ∝ batch."""
    from .ann_index import ann_query_index, collect_centroids
    from .similarity import top_cells_by_cosine

    batch_v = embeddings.join(
        batch_doc_ids.select(F.col(batch_doc_ids.columns[0]).alias("vec_id")),
        "vec_id",
        "left_semi",
    )
    # one bounded centroid collect per epoch, shared between the index
    # probe and the batch-local side (round-11 review: the hot path
    # previously collected the centroids table twice per epoch)
    cent_rows = collect_centroids(spark, ann_index.centroids_table)
    idx_nn = ann_query_index(
        spark, batch_v, ann_index, nprobe=nprobe, topk=1, cent_rows=cent_rows
    ).select("query_id", "cosine")
    probes = batch_v.select(
        F.col("vec_id").alias("query_id"),
        F.explode(top_cells_by_cosine(cent_rows, nprobe)("qe", "nq")).alias(
            "cell"
        ),
    )
    assigned = batch_v.select(
        F.col("vec_id").alias("neighbor_id"),
        top_cells_by_cosine(cent_rows, 1)("qe", "nq")[0].alias("cell"),
        F.col("qe").alias("qb"),
        F.col("nq").alias("nb"),
    )
    qa = batch_v.select(
        F.col("vec_id").alias("query_id"),
        F.col("qe").alias("qa"),
        F.col("nq").alias("na"),
    )
    from .similarity import _spark_dot

    cosine = _spark_dot("qa", "qb").cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    local_nn = (
        probes.join(assigned, "cell")
        .filter(F.col("neighbor_id") < F.col("query_id"))
        .join(qa, "query_id")
        .select("query_id", cosine.alias("cosine"))
    )
    return (
        idx_nn.unionByName(local_nn)
        .groupBy("query_id")
        .agg(F.max("cosine").alias("nn_raw"))
        .select(F.col("query_id").alias("doc_id"), "nn_raw")
    )


@query("incremental_ingest_funnel_ann", oracle=_funnel_ann_oracle())
def incremental_ingest_funnel_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full-trilogy admission decision: novel under the persistent
    near-dup TEXT index ∧ embedding-novel under the persistent IVF
    index (nearest accumulated neighbor's cosine < {TAU_EMB}) ∧ clean
    under the benchmark gram index ∧ above the quality floor. Builds on
    the memoized plain funnel (the text/contamination stages are
    literally that query's decisions) and adds one IVF probe per batch
    document — topk=1 against corpus cells, the production ANN path.
    The oracle recomputes all four stages monolithically, so the
    composed decision — including the APPROXIMATE-but-deterministic
    nearest-neighbor semantics — is hash-verified against DuckDB."""
    from .ann_index import build_ann_index
    from .similarity import _spark_quantized_materialized, NPROBE

    key = (spark.sparkContext.applicationId, sf_dir, "ann")
    cached = _INGEST_MEMO.get(key)
    if cached is None:
        base = incremental_ingest_funnel(spark, sf_dir)
        qv = _spark_quantized_materialized(spark, sf_dir).select(
            "vec_id", "qe", "nq"
        )
        corpus_v = qv.filter(F.col("vec_id") % BATCH_MOD != 0)
        name = index_table_name(
            "annidxf", spark.sparkContext.applicationId, sf_dir
        )
        index = build_ann_index(
            spark, corpus_v, tempfile.mkdtemp(prefix=f"{name}_"), name
        )
        nn = embedding_nn_probe(
            spark, base.select("doc_id"), qv, index, nprobe=NPROBE
        )
        out = apply_embedding_stage(base, nn)
        cached = _INGEST_MEMO.put(key, out.localCheckpoint(eager=True))
    return cached


@query(
    "incremental_ingest_funnel_ann_growing",
    oracle=_funnel_ann_oracle(growing=True),
)
def incremental_ingest_funnel_ann_growing(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The trilogy funnel under the GROWING-index embedding rule
    (round 11): a batch doc is embedding-novel iff its nearest neighbor
    over the persisted corpus cells ∪ LOWER-ID batch vectors in its
    probed cells scores below the cosine threshold — the exact embedding
    analog of the text rule "duplicate iff it verified-pairs with any
    indexed doc or a lower-id batch doc". Same frozen corpus centroids
    address both sides, so the rule is epoch-cut-invariant and the
    streaming twin (`streaming_ingest_funnel_ann_growing`), whose sink
    EXTENDS the IVF index with every probed epoch's vectors
    (seen=probed), reproduces it bit-for-bit. The oracle recomputes the
    whole rule monolithically, batch-local candidates included."""
    from .ann_index import build_ann_index
    from .similarity import _spark_quantized_materialized, NPROBE

    key = (spark.sparkContext.applicationId, sf_dir, "ann-growing")
    cached = _INGEST_MEMO.get(key)
    if cached is None:
        base = incremental_ingest_funnel(spark, sf_dir)
        qv = _spark_quantized_materialized(spark, sf_dir).select(
            "vec_id", "qe", "nq"
        )
        corpus_v = qv.filter(F.col("vec_id") % BATCH_MOD != 0)
        name = index_table_name(
            "annidxg", spark.sparkContext.applicationId, sf_dir
        )
        index = build_ann_index(
            spark, corpus_v, tempfile.mkdtemp(prefix=f"{name}_"), name
        )
        nn = embedding_nn_probe_growing(
            spark, base.select("doc_id"), qv, index, nprobe=NPROBE
        )
        out = apply_embedding_stage(base, nn)
        cached = _INGEST_MEMO.put(key, out.localCheckpoint(eager=True))
    return cached


@query(
    "streaming_ingest_funnel_ann_growing",
    oracle=_funnel_ann_oracle(growing=True),
)
def streaming_ingest_funnel_ann_growing(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The growing-index trilogy funnel run as a STREAM — VERDICT r10
    #1, closing the trilogy's one semantic asymmetry: the IVF index now
    GROWS with the stream exactly like the dedup index (seen=probed —
    every probed epoch's vectors are appended under the frozen corpus
    centroids after the epoch's decisions are durable), so later epochs'
    embedding stage sees every earlier streamed vector, and same-epoch
    lower-id vectors are covered by the probe's batch-local side. With
    id-ordered epochs the admission rule is epoch-cut-invariant, and the
    union of the epochs' decision records hash-matches the SAME
    monolithic oracle as `incremental_ingest_funnel_ann_growing` —
    streamed growth ≡ the one-shot batch rule, cross-engine."""
    key = (spark.sparkContext.applicationId, sf_dir, "streaming-ann-growing")
    cached = _INGEST_MEMO.get(key)
    if cached is None:
        out = _run_streaming_funnel(spark, sf_dir, with_ann=True, grow_ann=True)
        cached = _INGEST_MEMO.put(key, out)
    return cached


@query("streaming_ingest_funnel_ann", oracle=_funnel_ann_oracle())
def streaming_ingest_funnel_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full-trilogy funnel run as a STREAM: three id-ordered epochs
    through the composed sink with the embedding stage enabled (probe
    the persisted IVF index per epoch, the dedup index growing
    seen=probed, the gram and IVF indexes probe-only). The union of the
    epochs' decision records must hash-match the SAME monolithic oracle
    as `incremental_ingest_funnel_ann` — the streamed composition of
    all four stages ≡ the one-shot batch computation. With the batch
    twin this makes four funnel driver rows proven against two shared
    SQL texts."""
    key = (spark.sparkContext.applicationId, sf_dir, "streaming-ann")
    cached = _INGEST_MEMO.get(key)
    if cached is None:
        out = _run_streaming_funnel(spark, sf_dir, with_ann=True)
        cached = _INGEST_MEMO.put(key, out)
    return cached


# ---------------------------------------------------------------------------
# Funnel observability (round 11): the per-reason admission rollup every
# production curation pipeline reports per ingest cycle — how many docs
# each funnel stage rejected, with volume (token) totals, so an operator
# sees WHERE the stream is being lost without scanning decision rows.
# Reasons are assigned by FIRST failing stage in funnel order
# (duplicate → contaminated → low_quality → admitted), mirroring how the
# stages would short-circuit in a sequential pipeline; the oracle states
# the identical CASE over the monolithic funnel recompute.
# ---------------------------------------------------------------------------


def _funnel_report_oracle() -> str:
    return f"""
    SELECT reason,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM (
      SELECT CASE
               WHEN NOT is_novel THEN 'duplicate'
               WHEN is_contaminated THEN 'contaminated'
               WHEN n_tokens < {MIN_TOKENS} THEN 'low_quality'
               ELSE 'admitted'
             END AS reason,
             n_tokens
      FROM ({_funnel_oracle()}) f
    ) r
    GROUP BY reason
    """


@query("ingest_funnel_report", oracle=_funnel_report_oracle())
def ingest_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Admission-funnel rejection breakdown for one ingest batch:
    (reason, n_docs, total_tokens) with reason = the first funnel stage
    that rejected the document (duplicate → contaminated → low_quality
    → admitted). Composes the memoized funnel decisions — zero extra
    probes — into the cycle report a pipeline operator actually reads;
    the oracle recomputes the whole funnel monolithically and applies
    the identical precedence CASE."""
    d = incremental_ingest_funnel(spark, sf_dir)
    reason = (
        F.when(~F.col("is_novel"), F.lit("duplicate"))
        .when(F.col("is_contaminated"), F.lit("contaminated"))
        .when(F.col("n_tokens") < MIN_TOKENS, F.lit("low_quality"))
        .otherwise(F.lit("admitted"))
    )
    return d.groupBy(reason.alias("reason")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def _funnel_source_report_oracle() -> str:
    return f"""
    SELECT d2.source, r.reason,
           COUNT(*) AS n_docs,
           CAST(SUM(r.n_tokens) AS BIGINT) AS total_tokens
    FROM (
      SELECT doc_id,
             CASE
               WHEN NOT is_novel THEN 'duplicate'
               WHEN is_contaminated THEN 'contaminated'
               WHEN n_tokens < {MIN_TOKENS} THEN 'low_quality'
               ELSE 'admitted'
             END AS reason,
             n_tokens
      FROM ({_funnel_oracle()}) f
    ) r
    JOIN documents d2 ON d2.doc_id = r.doc_id
    GROUP BY d2.source, r.reason
    """


@query("funnel_source_report", oracle=_funnel_source_report_oracle())
def funnel_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-SOURCE slice of the funnel rejection report (round 12):
    which domains are losing documents to which stage — the first
    question an operator asks when an upstream feed degrades (a crawler
    re-emitting old pages shows as a duplicate spike in ONE source; a
    benchmark leak shows as that source's contamination rate). Same
    memoized decisions, same precedence CASE, one extra dimension and a
    broadcast-or-shuffled join to the source column."""
    d = incremental_ingest_funnel(spark, sf_dir)
    reason = (
        F.when(~F.col("is_novel"), F.lit("duplicate"))
        .when(F.col("is_contaminated"), F.lit("contaminated"))
        .when(F.col("n_tokens") < MIN_TOKENS, F.lit("low_quality"))
        .otherwise(F.lit("admitted"))
    )
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        d.join(src, "doc_id")
        .groupBy("source", reason.alias("reason"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Funnel → packing composition (round 11): the end of the curation
# pipeline meets the start of the training pipeline. A real pretraining
# run does exactly this chain: admit documents through the funnel, then
# concatenate the ADMITTED stream into fixed-token training sequences
# (operators/curation.sequence_packing's concat-then-split rule, per
# source shard). Composing them in one oracle row proves the interface
# between the two halves — the admitted set — cross-engine, not just
# each half in isolation.
# ---------------------------------------------------------------------------


def _funnel_packing_oracle() -> str:
    from .curation import PACK_TOKENS
    from .dedup_index import verified_pairs_cte

    return f"""
    WITH {verified_pairs_cte()},
    {_funnel_cte()},
    fadmitted AS (
      SELECT d.doc_id
      FROM documents d
      LEFT JOIN fdups dp ON dp.doc_id = d.doc_id
      LEFT JOIN fcont c ON c.doc_id = d.doc_id
      WHERE d.doc_id % {BATCH_MOD} = 0
        AND dp.doc_id IS NULL
        AND NOT COALESCE(c.isc, FALSE)
        AND len({_SQL_TOKS}) >= {MIN_TOKENS}
    ),
    ptoks AS (
      SELECT d.source, d.doc_id,
             len(string_split_regex(trim(d.text), '\\s+')) AS n_tok
      FROM documents d JOIN fadmitted a ON a.doc_id = d.doc_id
    ),
    packed AS (
      SELECT source, doc_id, n_tok,
             (SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id) - n_tok)
               // {PACK_TOKENS} AS pack_id
      FROM ptoks
    )
    SELECT source, CAST(pack_id AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS pack_tokens,
           MIN(doc_id) AS first_doc
    FROM packed GROUP BY source, pack_id
    """


@query("funnel_admitted_packing", oracle=_funnel_packing_oracle())
def funnel_admitted_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-budget training sequences over the FUNNEL-ADMITTED batch:
    the composed curation output (memoized funnel decisions — zero
    extra probes) flows into the per-shard concat-then-split packing
    rule of `sequence_packing`. Duplicates, contaminated docs, and
    sub-floor docs never reach a pack; pack boundaries are those of
    the admitted token stream, which is exactly what a dataloader
    would see. The per-source cumsum is the keyed two-phase prefix sum
    (functions/cumsum.keyed_running_sum — VERDICT r11 #1): no task ever
    orders more than one range-slice of a source's token stream, so the
    shape survives skewed sources at 100×."""
    from ..functions.cumsum import keyed_running_sum
    from .curation import PACK_TOKENS

    admitted = (
        incremental_ingest_funnel(spark, sf_dir)
        .filter(F.col("admitted"))
        .select("doc_id")
    )
    # no broadcast HINT on the admitted-id side: it is O(batch) and a
    # forced broadcast of a data-proportional relation is exactly what
    # the engine-wide hint sweep forbids (bm25's r4 mistake) — AQE
    # converts the semi join to broadcast at runtime when the admitted
    # set is actually small, which is the engine's documented posture
    toks = (
        load_table(spark, sf_dir, "documents")
        .join(admitted, "doc_id", "left_semi")
        .select(
            "source",
            "doc_id",
            F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok"),
        )
    )
    packed = keyed_running_sum(
        toks,
        ["source"],
        [F.col("doc_id")],
        F.col("n_tok").cast("bigint"),
        "_cum",
    ).withColumn(
        "pack_id", F.floor((F.col("_cum") - F.col("n_tok")) / PACK_TOKENS)
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


#: per-source token budget for budget-aware admission (a curation run
#: rarely takes everything a domain offers — data mixes cap each
#: source's contribution; 4096 tokens keeps several sources partially
#: filled at fixture scale so the boundary rule is actually exercised)
SOURCE_TOKEN_BUDGET = 4096


def _funnel_budget_oracle() -> str:
    from .dedup_index import verified_pairs_cte

    return f"""
    WITH {verified_pairs_cte()},
    {_funnel_cte()},
    fadmitted AS (
      SELECT d.doc_id, d.source,
             len({_SQL_TOKS}) AS n_tok
      FROM documents d
      LEFT JOIN fdups dp ON dp.doc_id = d.doc_id
      LEFT JOIN fcont c ON c.doc_id = d.doc_id
      WHERE d.doc_id % {BATCH_MOD} = 0
        AND dp.doc_id IS NULL
        AND NOT COALESCE(c.isc, FALSE)
        AND len({_SQL_TOKS}) >= {MIN_TOKENS}
    )
    SELECT source, doc_id, CAST(n_tok AS BIGINT) AS n_tok
    FROM (
      SELECT source, doc_id, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id)
               - n_tok AS cum_before
      FROM fadmitted
    ) t
    WHERE cum_before < {SOURCE_TOKEN_BUDGET}
    """


@query("funnel_source_token_budget", oracle=_funnel_budget_oracle())
def funnel_source_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-aware admission: of the funnel-admitted batch, each
    source contributes documents in doc_id order until its token
    budget is exhausted — a document is taken iff its FIRST token fits
    (preceding admitted tokens < budget; the same first-token-lands
    rule as sequence packing, so the boundary document is taken whole
    and may overshoot — exactly how a stream cut behaves). This is the
    per-domain cap every production data mix applies after quality
    filtering; deterministic (id order), composed on the memoized
    funnel decisions — no extra index probes. The per-source cumsum is
    the keyed two-phase prefix sum (functions/cumsum.keyed_running_sum
    — VERDICT r11 #1), so a skewed source's token stream never funnels
    through one WindowExec task."""
    from ..functions.cumsum import keyed_running_sum

    admitted = (
        incremental_ingest_funnel(spark, sf_dir)
        .filter(F.col("admitted"))
        .select("doc_id")
    )
    # runtime-only broadcast, same rationale as funnel_admitted_packing
    toks = (
        load_table(spark, sf_dir, "documents")
        .join(admitted, "doc_id", "left_semi")
        .select(
            "source",
            "doc_id",
            F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n_tok"),
        )
    )
    return (
        keyed_running_sum(
            toks, ["source"], [F.col("doc_id")], F.col("n_tok"), "_cum"
        )
        .filter(F.col("_cum") - F.col("n_tok") < SOURCE_TOKEN_BUDGET)
        .select("source", "doc_id", "n_tok")
    )


#: total token budget distributed across sources by mix weight (round
#: 12). Sized so per-source budgets land around the uniform cap at
#: fixture scale — several sources partially filled, boundaries hit
WEIGHTED_BUDGET_TOTAL = 16384

#: the mix-weight × total → per-source integer budget, shared verbatim
#: between the Spark helper and the oracle CTE. The sqrt/decimal/varchar
#: dance is domain_mix_weights' pinned cross-engine float recipe; the
#: final floor lands on an exact BIGINT, so the budget COMPARISON is
#: pure integer arithmetic on both engines
_WBUD_CTE = f"""
    wbud AS (
      SELECT source,
             CAST(FLOOR(CAST(CAST(s AS VARCHAR) AS DOUBLE)
                        / CAST(CAST(SUM(s) OVER () AS VARCHAR) AS DOUBLE)
                        * {WEIGHTED_BUDGET_TOTAL}) AS BIGINT) AS budget_tokens
      FROM (
        SELECT source,
               CAST(sqrt(CAST(SUM(len({_SQL_TOKS})) AS DOUBLE))
                    AS DECIMAL(24,9)) AS s
        FROM documents GROUP BY source
      )
    )"""


def source_weight_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, budget_tokens): per-source token budgets from the
    temperature-scaled mix weights (curation.domain_mix_weights, α=1/2)
    — ``floor(mix_weight × WEIGHTED_BUDGET_TOTAL)``. The weights come
    from the WHOLE corpus (a production mix is computed upstream of any
    one batch); sqrt is IEEE-correctly-rounded and the normalizer sums
    through DECIMAL, so the doubles — and therefore the floored integer
    budgets — are bit-identical across engines and partitionings.
    Dimension-sized: one row per source."""
    counts = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.sum(F.size(F.split(F.trim("text"), r"\s+")))
            .cast("bigint")
            .alias("n_tokens")
        )
    )
    scaled = counts.withColumn(
        "s", F.sqrt(F.col("n_tokens").cast("double")).cast("decimal(24,9)")
    ).localCheckpoint(eager=False)
    total = scaled.agg(F.sum("s").alias("s_total"))
    return scaled.crossJoin(F.broadcast(total)).select(
        "source",
        F.floor(
            F.col("s").cast("double") / F.col("s_total").cast("double")
            * WEIGHTED_BUDGET_TOTAL
        ).cast("bigint").alias("budget_tokens"),
    )


def _funnel_weighted_budget_oracle() -> str:
    from .dedup_index import verified_pairs_cte

    return f"""
    WITH {verified_pairs_cte()},
    {_funnel_cte()},
    {_WBUD_CTE},
    fadmitted AS (
      SELECT d.doc_id, d.source,
             len({_SQL_TOKS}) AS n_tok
      FROM documents d
      LEFT JOIN fdups dp ON dp.doc_id = d.doc_id
      LEFT JOIN fcont c ON c.doc_id = d.doc_id
      WHERE d.doc_id % {BATCH_MOD} = 0
        AND dp.doc_id IS NULL
        AND NOT COALESCE(c.isc, FALSE)
        AND len({_SQL_TOKS}) >= {MIN_TOKENS}
    )
    SELECT t.source, t.doc_id, CAST(t.n_tok AS BIGINT) AS n_tok,
           w.budget_tokens
    FROM (
      SELECT source, doc_id, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id)
               - n_tok AS cum_before
      FROM fadmitted
    ) t JOIN wbud w ON w.source = t.source
    WHERE t.cum_before < w.budget_tokens
    """


@query("funnel_source_weighted_budget", oracle=_funnel_weighted_budget_oracle())
def funnel_source_weighted_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted budget-aware admission (round 12): the uniform
    per-source cap of `funnel_source_token_budget` composed with the
    temperature-scaled DATA MIX — each source's budget is its mix-weight
    share of one global token budget, so big domains are down-weighted
    and small ones guaranteed room (the production "data mix" step,
    applied at admission instead of after materialization). Same
    first-token-lands boundary rule, same keyed two-phase prefix sum
    for the per-source cumsum, plus one broadcast join against the
    dimension-sized budgets lookup."""
    from ..functions.cumsum import keyed_running_sum

    admitted = (
        incremental_ingest_funnel(spark, sf_dir)
        .filter(F.col("admitted"))
        .select("doc_id")
    )
    toks = (
        load_table(spark, sf_dir, "documents")
        .join(admitted, "doc_id", "left_semi")
        .select(
            "source",
            "doc_id",
            F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n_tok"),
        )
    )
    budgets = source_weight_budgets(spark, sf_dir)
    # no broadcast HINT on the budgets side: its plan bottoms out in the
    # checkpointed per-source relation (a LogicalRDD leaf the hint sweep
    # cannot prove bounded) — AQE broadcasts the dimension-sized lookup
    # at runtime, the engine's documented posture
    return (
        keyed_running_sum(
            toks, ["source"], [F.col("doc_id")], F.col("n_tok"), "_cum"
        )
        .join(budgets, "source")
        .filter(F.col("_cum") - F.col("n_tok") < F.col("budget_tokens"))
        .select("source", "doc_id", "n_tok", "budget_tokens")
    )


def _funnel_budget_decisions_oracle() -> str:
    """Monolithic recompute of the budget-gated funnel DECISIONS: every
    batch doc with its evidence columns, ``admitted`` carrying the
    extra conjunct "my first token fits my source's budget among
    lower-id funnel-admitted docs" — the global statement of the
    streamed per-epoch state machine."""
    from .dedup_index import verified_pairs_cte

    return f"""
    WITH {verified_pairs_cte()},
    {_funnel_cte()},
    fdec AS (
      SELECT d.doc_id, d.source,
             (dp.doc_id IS NULL) AS is_novel,
             COALESCE(c.isc, FALSE) AS isc,
             len({_SQL_TOKS}) AS n_tokens,
             ((dp.doc_id IS NULL) AND NOT COALESCE(c.isc, FALSE)
              AND len({_SQL_TOKS}) >= {MIN_TOKENS}) AS base_admit
      FROM documents d
      LEFT JOIN fdups dp ON dp.doc_id = d.doc_id
      LEFT JOIN fcont c ON c.doc_id = d.doc_id
      WHERE d.doc_id % {BATCH_MOD} = 0
    ),
    badm AS (
      SELECT doc_id,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
               - n_tokens AS cum_before
      FROM fdec WHERE base_admit
    )
    SELECT f.doc_id, f.source, f.is_novel, f.isc AS is_contaminated,
           CAST(f.n_tokens AS BIGINT) AS n_tokens,
           (f.base_admit
            AND COALESCE(b.cum_before, {SOURCE_TOKEN_BUDGET}) <
                {SOURCE_TOKEN_BUDGET}) AS admitted
    FROM fdec f LEFT JOIN badm b ON b.doc_id = f.doc_id
    """


@query(
    "streaming_funnel_source_budget", oracle=_funnel_budget_decisions_oracle()
)
def streaming_funnel_source_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The budget gate as CROSS-EPOCH STREAMING STATE: the funnel sink
    runs with ``source_budget`` set, carrying each source's admitted
    token total across epochs as a tiny persisted state record (one
    row per source, derived from the decision records, crash-rebuildable
    — streaming/ingest_funnel.IngestFunnelSink._budget_state). With
    id-ordered epochs the per-epoch rule "state + lower-id batch
    admitted tokens < budget" equals the monolithic global window, so
    three streamed epochs must hash-match the one-shot oracle — the
    same epoch-cut-invariance argument as every funnel pair, now for a
    STATEFUL gate whose state is not an index but an aggregate."""
    key = (spark.sparkContext.applicationId, sf_dir, "budget")
    cached = _INGEST_MEMO.get(key)
    if cached is None:
        out = _run_streaming_funnel(
            spark,
            sf_dir,
            with_ann=False,
            tag="sb",
            source_budget=SOURCE_TOKEN_BUDGET,
        )
        cached = _INGEST_MEMO.put(key, out)
    return cached


@query(
    "partitioned_funnel_source_budget",
    oracle=_funnel_budget_decisions_oracle(),
)
def partitioned_funnel_source_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STATEFUL budget gate scaled horizontally (round 12 — the
    composition of this round's two streaming features): two
    partitioned admission streams sliced by SOURCE, so each stream is
    authoritative for whole domains and carries its own sources'
    cross-epoch token state with zero cross-stream coordination; the
    text-dedup side still shares one index through publish → barrier →
    decide. Merged decisions must hash-match the SAME monolithic
    budget-window oracle as the single-stream
    `streaming_funnel_source_budget` — per-domain caps are preserved
    exactly while admission throughput scales with N."""
    key = (spark.sparkContext.applicationId, sf_dir, "pbudget")
    cached = _INGEST_MEMO.get(key)
    if cached is None:
        out = _run_streaming_funnel(
            spark,
            sf_dir,
            with_ann=False,
            tag="pb",
            n_streams=2,
            source_budget=SOURCE_TOKEN_BUDGET,
        )
        cached = _INGEST_MEMO.put(key, out)
    return cached


def _funnel_weighted_decisions_oracle() -> str:
    """Monolithic recompute of the WEIGHTED budget-gated funnel
    decisions: `_funnel_budget_decisions_oracle` with the uniform cap
    replaced by each source's mix-weight budget (the wbud CTE shared
    with the batch row)."""
    from .dedup_index import verified_pairs_cte

    return f"""
    WITH {verified_pairs_cte()},
    {_funnel_cte()},
    {_WBUD_CTE},
    fdec AS (
      SELECT d.doc_id, d.source,
             (dp.doc_id IS NULL) AS is_novel,
             COALESCE(c.isc, FALSE) AS isc,
             len({_SQL_TOKS}) AS n_tokens,
             ((dp.doc_id IS NULL) AND NOT COALESCE(c.isc, FALSE)
              AND len({_SQL_TOKS}) >= {MIN_TOKENS}) AS base_admit
      FROM documents d
      LEFT JOIN fdups dp ON dp.doc_id = d.doc_id
      LEFT JOIN fcont c ON c.doc_id = d.doc_id
      WHERE d.doc_id % {BATCH_MOD} = 0
    ),
    badm AS (
      SELECT doc_id,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
               - n_tokens AS cum_before
      FROM fdec WHERE base_admit
    )
    SELECT f.doc_id, f.source, f.is_novel, f.isc AS is_contaminated,
           CAST(f.n_tokens AS BIGINT) AS n_tokens,
           (f.base_admit
            AND COALESCE(b.cum_before < w.budget_tokens, FALSE)) AS admitted
    FROM fdec f
    LEFT JOIN badm b ON b.doc_id = f.doc_id
    LEFT JOIN wbud w ON w.source = f.source
    """


@query(
    "streaming_funnel_weighted_budget", oracle=_funnel_weighted_decisions_oracle()
)
def streaming_funnel_weighted_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WEIGHTED budget gate as cross-epoch streaming state (round
    12): the funnel sink runs with ``source_budget`` set to the
    dimension-sized (source, budget_tokens) mix lookup instead of a
    uniform int. The persisted state is unchanged — one (source,
    cum_tokens) row per source — only the per-source threshold the gate
    compares against differs, so the same epoch-cut-invariance argument
    applies verbatim and three streamed epochs must hash-match the
    monolithic weighted-window oracle. Together with
    `funnel_source_weighted_budget` this is the batch/streaming pair
    for weighted data mixes (VERDICT r11 #5)."""
    key = (spark.sparkContext.applicationId, sf_dir, "wbudget")
    cached = _INGEST_MEMO.get(key)
    if cached is None:
        budgets = source_weight_budgets(spark, sf_dir).localCheckpoint(
            eager=True
        )
        out = _run_streaming_funnel(
            spark,
            sf_dir,
            with_ann=False,
            tag="wb",
            source_budget=budgets,
        )
        cached = _INGEST_MEMO.put(key, out, budgets)
    return cached


# ---------------------------------------------------------------------------
# Watermark-based out-of-order admission (round-13 VERDICT #2). The
# id-ordered-epoch contract relaxed: documents carry an event time
# (`modified` — the reference's own late-data column,
# event-table.sql:8,18) and arrive in an event-time-DISORDERED epoch
# cut; a per-epoch watermark (prior epochs' max event time − delay)
# drops provably-late rows into a durable accounting record and admits
# the rest through the unchanged funnel. streaming/late_data.py holds
# the gate; the oracles below recompute watermark, late set, and the
# (arrival epoch, doc_id)-ordered pairing rule monolithically.
# ---------------------------------------------------------------------------

#: allowed lateness (minutes). With event minutes spread over [0, 101)
#: per epoch, a 90-minute delay leaves the watermark ~10 minutes into
#: the range — a realistic small late fraction, not a decimation.
LATE_DELAY_MIN = 90
#: number of arrival epochs in the deterministic disordered cut
LATE_EPOCHS = 3

#: deterministic synthetic event time: minute offset (doc_id*37)%101
#: from a fixed origin — pseudo-random against the arrival cut below,
#: identical in both engines
_LATE_TS_SPARK = (
    "timestamp'2026-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, "
    "cast((doc_id * 37) % 101 as int), 0)"
)
_LATE_TS_DUCK = (
    "TIMESTAMP '2026-01-01 00:00:00' + to_minutes((doc_id * 37) % 101)"
)


def _late_meta_cte() -> str:
    """fmeta/fwm/flate/facc: arrival epoch, synthetic event time,
    per-epoch watermark, late set, accepted set — the DuckDB mirror of
    the WatermarkedFunnelSink gate over the deterministic cut."""
    return f"""fmeta AS (
      SELECT doc_id,
             (doc_id // {BATCH_MOD}) % {LATE_EPOCHS} AS epoch,
             {_LATE_TS_DUCK} AS modified
      FROM documents WHERE doc_id % {BATCH_MOD} = 0
    ),
    fwm AS (
      SELECT k.epoch,
             (SELECT max(f2.modified) FROM fmeta f2 WHERE f2.epoch < k.epoch)
               - to_minutes({LATE_DELAY_MIN}) AS w
      FROM (SELECT DISTINCT epoch FROM fmeta) k
    ),
    flate AS (
      SELECT f.doc_id, f.epoch, f.modified, m.w
      FROM fmeta f JOIN fwm m ON m.epoch = f.epoch
      WHERE f.modified < m.w
    ),
    facc AS (
      SELECT f.doc_id, f.epoch FROM fmeta f
      WHERE f.doc_id NOT IN (SELECT doc_id FROM flate)
    )"""


def _late_funnel_oracle() -> str:
    """Monolithic recompute of the watermarked funnel: the dup rule is
    (arrival epoch, doc_id)-lexicographic — a doc is a duplicate iff it
    verified-pairs with a corpus doc, or with an ACCEPTED doc of an
    earlier epoch (any id) or the same epoch and a lower id. Late docs
    participate in nothing (never probed, never indexed)."""
    return f"""
    WITH {verified_pairs_cte()},
    {_late_meta_cte()},
    fdirs AS (
      SELECT doc_a AS d, doc_b AS p FROM verified
      WHERE jaccard >= {JACCARD_THRESHOLD}
      UNION ALL
      SELECT doc_b AS d, doc_a AS p FROM verified
      WHERE jaccard >= {JACCARD_THRESHOLD}
    ),
    fdups AS (
      SELECT DISTINCT r.d AS doc_id
      FROM fdirs r
      JOIN facc fd ON fd.doc_id = r.d
      LEFT JOIN facc fp ON fp.doc_id = r.p
      WHERE r.p % {BATCH_MOD} <> 0
         OR (fp.doc_id IS NOT NULL
             AND (fp.epoch < fd.epoch
                  OR (fp.epoch = fd.epoch AND r.p < r.d)))
    ),
    {_contamination_cte()}
    SELECT d.doc_id,
           (dp.doc_id IS NULL) AS is_novel,
           COALESCE(c.n_grams, 0) AS n_grams,
           COALESCE(c.n_shared, 0) AS n_shared,
           COALESCE(c.isc, FALSE) AS is_contaminated,
           len({_SQL_TOKS}) AS n_tokens,
           ((dp.doc_id IS NULL) AND NOT COALESCE(c.isc, FALSE)
            AND len({_SQL_TOKS}) >= {MIN_TOKENS}) AS admitted
    FROM documents d
    JOIN facc a ON a.doc_id = d.doc_id
    LEFT JOIN fdups dp ON dp.doc_id = d.doc_id
    LEFT JOIN fcont c ON c.doc_id = d.doc_id
    """


def _late_accounting_oracle() -> str:
    """The dropped-late rows with the watermark that dropped them."""
    return f"""
    WITH {_late_meta_cte()}
    SELECT doc_id, epoch, modified AS event_time, w AS watermark
    FROM flate
    """


def _late_backfill_oracle() -> str:
    """Monolithic recompute of the watermarked funnel PLUS the batch
    backfill pass (round-13 VERDICT #2): every batch doc is decided at
    its EFFECTIVE epoch — arrival epoch when on-time, the single
    backfill epoch ({LATE_EPOCHS}, after every arrival epoch) when
    late — and the dup rule is (effective epoch, doc_id)-lexicographic
    over that order. This IS the monolithic no-watermark run under the
    effective delivery order: duplicate pairs are delivery-order
    invariant; survivor selection follows (effective epoch, id)."""
    return f"""
    WITH {verified_pairs_cte()},
    {_late_meta_cte()},
    feff AS (
      SELECT doc_id, epoch FROM facc
      UNION ALL
      SELECT doc_id, {LATE_EPOCHS} AS epoch FROM flate
    ),
    fdirs AS (
      SELECT doc_a AS d, doc_b AS p FROM verified
      WHERE jaccard >= {JACCARD_THRESHOLD}
      UNION ALL
      SELECT doc_b AS d, doc_a AS p FROM verified
      WHERE jaccard >= {JACCARD_THRESHOLD}
    ),
    fdups AS (
      SELECT DISTINCT r.d AS doc_id
      FROM fdirs r
      JOIN feff fd ON fd.doc_id = r.d
      LEFT JOIN feff fp ON fp.doc_id = r.p
      WHERE r.p % {BATCH_MOD} <> 0
         OR fp.epoch < fd.epoch
         OR (fp.epoch = fd.epoch AND r.p < r.d)
    ),
    {_contamination_cte()}
    SELECT d.doc_id,
           (dp.doc_id IS NULL) AS is_novel,
           COALESCE(c.n_grams, 0) AS n_grams,
           COALESCE(c.n_shared, 0) AS n_shared,
           COALESCE(c.isc, FALSE) AS is_contaminated,
           len({_SQL_TOKS}) AS n_tokens,
           ((dp.doc_id IS NULL) AND NOT COALESCE(c.isc, FALSE)
            AND len({_SQL_TOKS}) >= {MIN_TOKENS}) AS admitted,
           CAST(fe.epoch AS BIGINT) AS epoch
    FROM documents d
    JOIN feff fe ON fe.doc_id = d.doc_id
    LEFT JOIN fdups dp ON dp.doc_id = d.doc_id
    LEFT JOIN fcont c ON c.doc_id = d.doc_id
    """


def _run_late_funnel(spark: SparkSession, sf_dir: str) -> tuple:
    """Shared runner for the two late-data rows: build the probe-only
    indexes, synthesize `modified`, cut the batch into LATE_EPOCHS
    event-time-disordered arrival epochs, push them through the
    watermarked funnel, and return (decisions, late_accounting) —
    both localCheckpointed."""
    import datetime as _dt

    from ..streaming.ingest_funnel import IngestFunnelSink
    from ..streaming.late_data import WatermarkedFunnelSink

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    batch = docs.filter(F.col("doc_id") % BATCH_MOD == 0).withColumn(
        "modified", F.expr(_LATE_TS_SPARK)
    )
    app = spark.sparkContext.applicationId
    dname = index_table_name("ddidxld", app, sf_dir)
    index = build_dedup_index(
        spark,
        docs.filter(F.col("doc_id") % BATCH_MOD != 0),
        tempfile.mkdtemp(prefix=f"{dname}_"),
        dname,
    )
    gname = index_table_name("contidxld", app, sf_dir)
    gtable = build_contamination_index(
        spark,
        docs.filter(F.col("doc_id") % _BENCH_MOD == 0),
        tempfile.mkdtemp(prefix=f"{gname}_"),
        gname,
    )
    sink = IngestFunnelSink(
        spark, index, gtable, tempfile.mkdtemp(prefix=f"{dname}_funnel_")
    )
    wsink = WatermarkedFunnelSink(
        sink, "modified", _dt.timedelta(minutes=LATE_DELAY_MIN)
    )
    epoch_of = (F.col("doc_id") / BATCH_MOD).cast("bigint") % LATE_EPOCHS
    for epoch in range(LATE_EPOCHS):
        wsink(batch.filter(epoch_of == epoch), epoch)
    late = wsink.late_accounting().select(
        "doc_id", F.col("epoch").cast("bigint").alias("epoch"),
        "event_time", "watermark",
    ).localCheckpoint(eager=True)
    # the backfill pass re-admits the accounted late set as one more
    # epoch (= LATE_EPOCHS); the pre-backfill rows keep their semantics
    # by filtering on the epoch partition column (checkpoint `late`
    # FIRST — it must reflect the pre-backfill accounting even though
    # backfill never mutates it, the read stays plan-stable this way)
    wsink.backfill(batch)
    dec_cols = [
        "doc_id", "is_novel", "n_grams", "n_shared", "is_contaminated",
        "n_tokens", "admitted",
    ]
    all_dec = sink.decisions()
    decisions = all_dec.filter(
        F.col("epoch").cast("bigint") < LATE_EPOCHS
    ).select(*dec_cols)
    backfilled = all_dec.select(
        *dec_cols, F.col("epoch").cast("bigint").alias("epoch")
    )
    return decisions, late, backfilled


def _late_funnel_memoized(spark: SparkSession, sf_dir: str) -> tuple:
    """One watermarked-funnel run (epochs + backfill) feeds all three
    rows; each frame is its own memo entry (independent checkpoints),
    and a partial eviction re-runs the whole thing rather than
    returning a torn triple."""
    app = spark.sparkContext.applicationId
    kd = (app, sf_dir, "late")
    ka = (app, sf_dir, "late-acct")
    kb = (app, sf_dir, "late-backfill")
    dec = _INGEST_MEMO.get(kd)
    acct = _INGEST_MEMO.get(ka)
    bf = _INGEST_MEMO.get(kb)
    if dec is None or acct is None or bf is None:
        decisions, late, backfilled = _run_late_funnel(spark, sf_dir)
        dec = _INGEST_MEMO.put(kd, decisions.localCheckpoint(eager=True))
        acct = _INGEST_MEMO.put(ka, late)  # checkpointed pre-backfill
        bf = _INGEST_MEMO.put(kb, backfilled.localCheckpoint(eager=True))
    return dec, acct, bf


@query("streaming_funnel_late_data", oracle=_late_funnel_oracle())
def streaming_funnel_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The admission funnel under OUT-OF-ORDER delivery with a
    watermark gate (round-13 VERDICT #2): the batch arrives in three
    event-time-disordered epochs ((doc_id div 4) mod 3 — uncorrelated
    with the synthetic `modified` minute), each epoch's watermark is
    the prior epochs' max event time minus {LATE_DELAY_MIN} minutes,
    provably-late rows are dropped into a durable accounting record
    (streaming/late_data.WatermarkedFunnelSink), and the on-time rows
    flow through the unchanged exactly-once funnel. The decision union
    over the ACCEPTED set must hash-match the monolithic oracle, whose
    dup rule is (arrival epoch, doc_id)-lexicographic — the documented
    bounded divergence from the id-ordered contract: duplicate PAIRS
    are identical, survivor selection follows arrival order. Reference
    parity: the reference's event table carries exactly these late-data
    columns (event-table.sql:8,18 — `modified`,
    `last_local_modified_at`); its serial loop re-reads them, the
    engine decides them under a watermark."""
    return _late_funnel_memoized(spark, sf_dir)[0]


@query("streaming_funnel_late_accounting", oracle=_late_accounting_oracle())
def streaming_funnel_late_accounting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The dropped-late rows of `streaming_funnel_late_data`, with the
    event time each row claimed and the watermark that dropped it —
    the auditable accounting that makes the watermark gate a policy,
    not silent data loss. Hash-matched against the same monolithic
    watermark recompute."""
    return _late_funnel_memoized(spark, sf_dir)[1]


@query("streaming_funnel_late_backfill", oracle=_late_backfill_oracle())
def streaming_funnel_late_backfill(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Late-row BACKFILL re-admission (round-13 VERDICT #2): after the
    watermarked epochs of `streaming_funnel_late_data`, one batch pass
    (streaming/late_data.WatermarkedFunnelSink.backfill) re-admits the
    accounted late set through the unchanged funnel as epoch
    {LATE_EPOCHS} — indexes extended, budgets charged, the pending set
    PLANNED durably before the run so a crash anywhere replays the
    identical batch (tests/test_late_data.py crash cuts). Returns the
    full decision relation — accepted ∪ backfilled, each doc decided
    exactly once at its effective epoch — which must hash-match the
    monolithic no-watermark recompute under the effective delivery
    order: pairs are delivery-order invariant, survivors follow
    (effective epoch, doc_id). Reference parity: this is the batch
    re-sync its `synced_with_posthog`/`last_local_modified_at` columns
    imply (event-table.sql:17-18)."""
    return _late_funnel_memoized(spark, sf_dir)[2]


# ---------------------------------------------------------------------------
# Adaptive domain mixes (round-13 VERDICT #5): the per-source budget as
# a PER-EPOCH allotment with carry-over. A source that under-fills
# early epochs (few docs arrived yet) keeps its unmet budget: the cap
# applied at epoch k is the CUMULATIVE allotment (k+1)×B, so the carry
# needs no new state — it is the gap between the rising cap and the
# persisted per-source consumption, riding the same exactly-once
# budget-state machinery as the flat cap (crash/replay pinned by
# tests/test_adaptive_budget.py).
# ---------------------------------------------------------------------------

#: per-source tokens allotted PER EPOCH in the adaptive driver row —
#: low enough that the gate bites in every epoch, high enough that
#: under-filled sources visibly spend their carry later
ADAPTIVE_EPOCH_BUDGET = 300
#: arrival epochs for the adaptive row's deterministic modulus cut
#: (same cut as the late-data rows — uncorrelated with doc_id order,
#: so the carry-over actually moves tokens across epochs)
AB_EPOCHS = 3


def _adaptive_budget_oracle() -> str:
    """Monolithic recompute: (epoch, id)-lexicographic dup rule over
    the modulus cut (the epochs are NOT id-ordered, so the id-ordered
    fdups would be wrong here — same rule as the late-data row, with
    every batch doc accepted), then the per-epoch budget state machine
    unrolled over the AB_EPOCHS epochs: taken iff prior consumption +
    within-epoch pre-budget cumsum < (epoch+1)×B; consumption carries
    only TAKEN tokens forward — exactly the sink's state writes."""
    B = ADAPTIVE_EPOCH_BUDGET
    epoch_expr = f"(doc_id // {BATCH_MOD}) % {AB_EPOCHS}"
    blocks, prev_taken = [], []
    for e in range(AB_EPOCHS):
        prior = (
            f"""(SELECT COALESCE(SUM(n_tok), 0)
                 FROM ({" UNION ALL ".join(f"SELECT * FROM k{j}" for j in prev_taken)}) u
                 WHERE u.source = f.source)"""
            if prev_taken
            else "0"
        )
        blocks.append(f"""t{e} AS (
      SELECT f.doc_id, f.source, f.n_tok, f.epoch,
             {prior} AS prior,
             SUM(f.n_tok) OVER (PARTITION BY f.source ORDER BY f.doc_id)
               - f.n_tok AS cumb
      FROM fadm f WHERE f.epoch = {e}
    ),
    k{e} AS (
      SELECT doc_id, source, n_tok, epoch FROM t{e}
      WHERE prior + cumb < {(e + 1) * B}
    )""")
        prev_taken.append(e)
    taken_union = " UNION ALL ".join(f"SELECT * FROM k{e}" for e in range(AB_EPOCHS))
    return f"""
    WITH {verified_pairs_cte()},
    fepoch AS (
      SELECT doc_id, {epoch_expr} AS epoch
      FROM documents WHERE doc_id % {BATCH_MOD} = 0
    ),
    fdirs AS (
      SELECT doc_a AS d, doc_b AS p FROM verified
      WHERE jaccard >= {JACCARD_THRESHOLD}
      UNION ALL
      SELECT doc_b AS d, doc_a AS p FROM verified
      WHERE jaccard >= {JACCARD_THRESHOLD}
    ),
    fdups AS (
      SELECT DISTINCT r.d AS doc_id
      FROM fdirs r
      JOIN fepoch fd ON fd.doc_id = r.d
      LEFT JOIN fepoch fp ON fp.doc_id = r.p
      WHERE r.p % {BATCH_MOD} <> 0
         OR fp.epoch < fd.epoch
         OR (fp.epoch = fd.epoch AND r.p < r.d)
    ),
    {_contamination_cte()},
    fadm AS (
      SELECT d.doc_id, d.source, fe.epoch,
             CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tok
      FROM documents d
      JOIN fepoch fe ON fe.doc_id = d.doc_id
      LEFT JOIN fdups dp ON dp.doc_id = d.doc_id
      LEFT JOIN fcont c ON c.doc_id = d.doc_id
      WHERE dp.doc_id IS NULL
        AND NOT COALESCE(c.isc, FALSE)
        AND len({_SQL_TOKS}) >= {MIN_TOKENS}
    ),
    {",".join(blocks)}
    SELECT source, doc_id, n_tok, CAST(epoch AS BIGINT) AS epoch
    FROM ({taken_union}) taken
    """


@query("funnel_source_adaptive_budget", oracle=_adaptive_budget_oracle())
def funnel_source_adaptive_budget(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The streamed funnel with the ADAPTIVE per-epoch budget gate
    (round-13 VERDICT #5): three event-order-uncorrelated arrival
    epochs ((doc_id div 4) mod 3), each source allotted
    {ADAPTIVE_EPOCH_BUDGET} tokens PER EPOCH with unmet budget carried
    forward (cap at epoch k = (k+1)×allotment vs persisted
    consumption). Returns the taken documents with their epoch — must
    hash-match the monolithic state-machine unroll. Crash/replay
    exactness rides the unchanged budget-state records
    (tests/test_adaptive_budget.py)."""
    key = (spark.sparkContext.applicationId, sf_dir, "adaptive-budget")
    cached = _INGEST_MEMO.get(key)
    if cached is not None:
        return cached

    from ..streaming.ingest_funnel import IngestFunnelSink

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    batch = docs.filter(F.col("doc_id") % BATCH_MOD == 0)
    app = spark.sparkContext.applicationId
    dname = index_table_name("ddidxab", app, sf_dir)
    index = build_dedup_index(
        spark,
        docs.filter(F.col("doc_id") % BATCH_MOD != 0),
        tempfile.mkdtemp(prefix=f"{dname}_"),
        dname,
    )
    gname = index_table_name("contidxab", app, sf_dir)
    gtable = build_contamination_index(
        spark,
        docs.filter(F.col("doc_id") % _BENCH_MOD == 0),
        tempfile.mkdtemp(prefix=f"{gname}_"),
        gname,
    )
    sink = IngestFunnelSink(
        spark,
        index,
        gtable,
        tempfile.mkdtemp(prefix=f"{dname}_funnel_"),
        source_budget=ADAPTIVE_EPOCH_BUDGET,
        budget_per_epoch=True,
    )
    epoch_of = (F.col("doc_id") / BATCH_MOD).cast("bigint") % AB_EPOCHS
    for epoch in range(AB_EPOCHS):
        sink(batch.filter(epoch_of == epoch), epoch)
    out = (
        sink.decisions()
        .filter(F.col("admitted"))
        .select(
            "source",
            "doc_id",
            F.col("n_tokens").alias("n_tok"),
            F.col("epoch").cast("bigint").alias("epoch"),
        )
    )
    return _INGEST_MEMO.put(key, out.localCheckpoint(eager=True))


@query("streaming_funnel_late_data_partitioned", oracle=_late_funnel_oracle())
def streaming_funnel_late_data_partitioned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The watermark gate COMPOSED with horizontal admission (round 13:
    #2 × #4): the same event-time-disordered epochs and watermark as
    `streaming_funnel_late_data`, but each epoch's on-time set is
    decided by the TWO-WAY PartitionedFunnelStreams coordinator over a
    shared index. The merged decisions must hash-match the SAME
    monolithic watermarked oracle — the gate is orthogonal to slicing
    (it splits the batch BEFORE the id-hash routing), and the
    (arrival epoch, id) dup rule is slicing-agnostic by the
    publish/barrier argument."""
    import datetime as _dt

    from ..streaming.late_data import WatermarkedFunnelSink
    from ..streaming.multi_admission import PartitionedFunnelStreams

    key = (spark.sparkContext.applicationId, sf_dir, "late-partitioned")
    cached = _INGEST_MEMO.get(key)
    if cached is not None:
        return cached

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    batch = docs.filter(F.col("doc_id") % BATCH_MOD == 0).withColumn(
        "modified", F.expr(_LATE_TS_SPARK)
    )
    app = spark.sparkContext.applicationId
    dname = index_table_name("ddidxlp", app, sf_dir)
    index = build_dedup_index(
        spark,
        docs.filter(F.col("doc_id") % BATCH_MOD != 0),
        tempfile.mkdtemp(prefix=f"{dname}_"),
        dname,
    )
    gname = index_table_name("contidxlp", app, sf_dir)
    gtable = build_contamination_index(
        spark,
        docs.filter(F.col("doc_id") % _BENCH_MOD == 0),
        tempfile.mkdtemp(prefix=f"{gname}_"),
        gname,
    )
    coord = PartitionedFunnelStreams(
        spark, index, gtable,
        tempfile.mkdtemp(prefix=f"{dname}_pfunnel_"), n_streams=2,
    )
    wsink = WatermarkedFunnelSink(
        coord, "modified", _dt.timedelta(minutes=LATE_DELAY_MIN)
    )
    epoch_of = (F.col("doc_id") / BATCH_MOD).cast("bigint") % LATE_EPOCHS
    for epoch in range(LATE_EPOCHS):
        wsink(batch.filter(epoch_of == epoch), epoch)
    out = coord.decisions().select(
        "doc_id", "is_novel", "n_grams", "n_shared", "is_contaminated",
        "n_tokens", "admitted",
    )
    return _INGEST_MEMO.put(key, out.localCheckpoint(eager=True))


# ---------------------------------------------------------------------------
# Cross-modal rule in the streaming funnel (round-13 VERDICT #3):
# `dedup_cross_modal_media` proved the OR-shaped pair rule in batch;
# this row streams it — the decoded-media fingerprint evidence persists
# as a FOURTH index table (operators/multimodal.MediaFpIndex,
# equality-bucketed — the exact-dedup scale shape) and the admission
# decision becomes REJECT iff text-dup OR media-dup, epoch-cut
# invariant under the same seen=probed discipline as the text index.
# ---------------------------------------------------------------------------


def _funnel_media_oracle() -> str:
    """Monolithic recompute of the cross-modal funnel: the text stage
    is `_funnel_cte`'s lowest-id-wins rule; the media stage declares a
    batch doc media-dup iff its decoded-media fingerprint — determined
    by (payload length, first-32-byte checksum), the same analytic
    derivation `dedup_cross_modal_media`'s oracle uses — equals a
    corpus doc's or a lower-id batch doc's. Admission requires BOTH
    novelties (reject = text-dup OR media-dup)."""
    return f"""
    WITH {verified_pairs_cte()},
    {_funnel_cte()},
    mfp AS (
      SELECT doc_id,
             octet_length(encode(text)) AS plen,
             list_sum(list_transform(range(32),
               i -> ascii(substr(text, i + 1, 1)))) % 251 AS csum
      FROM documents
    ),
    fmdup AS (
      SELECT DISTINCT a.doc_id
      FROM mfp a JOIN mfp b
        ON a.plen = b.plen AND a.csum = b.csum AND a.doc_id <> b.doc_id
      WHERE a.doc_id % {BATCH_MOD} = 0
        AND (b.doc_id % {BATCH_MOD} <> 0 OR b.doc_id < a.doc_id)
    )
    SELECT d.doc_id,
           (dp.doc_id IS NULL) AS is_novel,
           (md.doc_id IS NULL) AS is_media_novel,
           COALESCE(c.n_grams, 0) AS n_grams,
           COALESCE(c.n_shared, 0) AS n_shared,
           COALESCE(c.isc, FALSE) AS is_contaminated,
           len({_SQL_TOKS}) AS n_tokens,
           ((dp.doc_id IS NULL) AND (md.doc_id IS NULL)
            AND NOT COALESCE(c.isc, FALSE)
            AND len({_SQL_TOKS}) >= {MIN_TOKENS}) AS admitted
    FROM documents d
    LEFT JOIN fdups dp ON dp.doc_id = d.doc_id
    LEFT JOIN fmdup md ON md.doc_id = d.doc_id
    LEFT JOIN fcont c ON c.doc_id = d.doc_id
    WHERE d.doc_id % {BATCH_MOD} = 0
    """


@query("streaming_funnel_cross_modal", oracle=_funnel_media_oracle())
def streaming_funnel_cross_modal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The streamed admission funnel with the CROSS-MODAL rule: three
    id-ordered epochs through the IngestFunnelSink composed with the
    persistent media-fingerprint index — per epoch the batch's decoded
    media fingerprints (REAL Arrow-batched decode path,
    operators/multimodal.media_fingerprints_from_docs) probe the
    equality-bucketed fp table for corpus or earlier-streamed matches,
    decisions gain is_media_novel, admission requires text-novel AND
    media-novel, and every probed doc's fingerprint extends the table
    (seen = probed — the rule is epoch-cut invariant, same argument as
    the text index). Must hash-match the monolithic OR-rule recompute.
    Crash/replay: the fp extension has the same decisions-durable →
    extend repair bracket as the signature append
    (tests/test_streaming_ingest_funnel.py)."""
    key = (spark.sparkContext.applicationId, sf_dir, "cross-modal-stream")
    cached = _INGEST_MEMO.get(key)
    if cached is None:
        out = _run_streaming_funnel(
            spark, sf_dir, with_ann=False, tag="cm", with_media=True
        )
        sel = out.select(
            "doc_id", "is_novel", "is_media_novel", "n_grams", "n_shared",
            "is_contaminated", "n_tokens", "admitted",
        )
        cached = _INGEST_MEMO.put(key, sel.localCheckpoint(eager=True))
    return cached
