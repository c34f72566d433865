"""Semantic & segment-level deduplication — X2 extensions (SURVEY.md §2.8).

Two corpus-dedup operators beyond the exact/MinHash/SimHash family in
``operators/dedup.py``:

- ``dedup_semantic_clusters`` — SemDeDup-style (Abbas et al. 2023,
  arXiv:2303.09540) semantic dedup: partition the embedding space into
  nearest-centroid cells, then search for near-dup pairs ONLY within a
  cell. Candidate generation is linear in the corpus (one broadcast
  assignment pass + one shuffle on the cell id); the quadratic pairing
  is bounded to ~TARGET_CELL rows per cell. This is the scale path that
  replaces the exact all-pairs ``dedup_embedding_cosine`` at 100 TB,
  trading bounded recall (pairs straddling a cell boundary are missed —
  measured in tests/test_semantic.py) for linear cost.
- ``text_segment_dedup`` — CCNet/Dolma-style paragraph dedup adapted to
  the fixture corpus (no newlines): each document is segmented into
  consecutive SEG_WORDS-word chunks, chunks are md5-hashed, and every
  document reports the fraction of its chunks that occur elsewhere in
  the corpus. One shuffle keyed on the 128-bit chunk hash — the exact
  shape production paragraph-dedup pipelines use; nothing quadratic.

Exactness: embeddings go through the quantized-integer cosine recipe
(see operators/similarity.py); segment stats are integer counts with a
single final IEEE division — both bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table_row_count
from ..functions.memo import CheckpointMemo
from .corpus import _spark_tokens_materialized
from .registry import query
from .similarity import (
    DIM,
    _SQL_CENT_WHERE,
    _SQL_DOT,
    _SQL_NCELLS,
    _SQL_QUANTIZED,
    _spark_dot,
    _spark_quantized_materialized,
    argmin_cell_sqdist,
    centroid_sample_filter,
    centroid_stride,
    top_cells_by_cosine,
)

#: same near-dup bar as the exact all-pairs baseline so recall is
#: directly comparable (dedup.COSINE_NEARDUP_THRESHOLD)
SEMANTIC_THRESHOLD = 0.45

#: multi-probe width: every vector joins its top-ASSIGN_PROBES cells, so
#: a near-dup pair is found unless the two vectors share NONE of their
#: probe cells — the standard recall lever for cell-partitioned dedup
#: (cost scales linearly: ~ASSIGN_PROBES² candidate inflation, still
#: O(n·TARGET_CELL), never quadratic in n)
ASSIGN_PROBES = 2

#: words per segment for the paragraph-dedup analogue
SEG_WORDS = 10


#: multi-probe assignment memo, keyed by (applicationId, sf_dir): the
#: SemDeDup query and the cross-modal dedup both consume the same
#: deterministic (vec_id, cluster_id) relation — one centroid collect +
#: Arrow assignment pass + eager checkpoint per session instead of one
#: per call (the _EDGE_CACHE / _TOKS_CACHE pattern, r14; LRU-bounded
#: with unpersist-on-evict).
_ASSIGN_CACHE = CheckpointMemo()


def _assigned_cells(spark: SparkSession, sf_dir: str):
    """(quantized relation, (vec_id, cluster_id) assignment) — the
    centroid multi-probe assignment shared by the SemDeDup query and
    the scale tests (which assert per-cell candidate volume stays
    linear across decades).

    Assignment is a MAP-SIDE vectorized top-``ASSIGN_PROBES`` argmax
    (``similarity.top_cells_by_cosine``): the bounded centroid matrix
    ships inside an Arrow ``pandas_udf`` closure and every batch scores
    its cosines as one exact-int64 BLAS matmul. The pre-r5 shape — broadcast-join the
    centroids and rank with a per-vec_id window — materialized n×nc
    ROWS through a shuffle (3.3 B rows at the 100× sweep's 200k×16.6k
    point; it never finished); the UDF path emits ASSIGN_PROBES rows
    per vector and needs no shuffle at all. Values are bit-identical to
    the window form (int64 dots are exact in both; the double cosine is
    the same correctly-rounded expression; ties break min-cid exactly
    like ROW_NUMBER ... ORDER BY ccos DESC, cid), so the SQL oracle is
    unchanged. Flop cost is n·nc·DIM with nc capped at 2^MAX_CELL_BITS
    — past the cap, per-cell population grows instead; raising
    MAX_CELL_BITS (with a coarse-quantizer level for assignment) is the
    100 TB knob, documented in SCALE.md."""
    # the quantized relation feeds the centroid set and both pair
    # sides — the session-level memoized materialization
    # (similarity._spark_quantized_materialized) serves all of them
    q = _spark_quantized_materialized(spark, sf_dir).select("vec_id", "qe", "nq")
    key = (spark.sparkContext.applicationId, sf_dir)
    assigned = _ASSIGN_CACHE.get(key)
    if assigned is not None:
        return q, assigned
    # stride from the parquet footer count (exact, no scan job) — same
    # statistics source as the ANN family (VERDICT r3 #8); centroids
    # are the id-hash sample (robust to any vec_id layout — the 100×
    # sweep's strided ids broke the old dense-id vec_id < nc rule,
    # see similarity._SQL_CENT_WHERE)
    stride = centroid_stride(table_row_count(sf_dir, "embeddings"))
    cent_rows = (
        q.filter(centroid_sample_filter(stride))
        .select("vec_id", "qe", "nq")
        .collect()
    )

    topcells = top_cells_by_cosine(
        [(r.vec_id, r.qe, r.nq) for r in cent_rows], ASSIGN_PROBES
    )
    # assignment is self-joined for pairing — checkpoint the (vec_id,
    # cluster_id) relation so the assign pass runs once per session
    assigned = _ASSIGN_CACHE.put(
        key,
        q.select(
            "vec_id", F.explode(topcells("qe", "nq")).alias("cluster_id")
        ).localCheckpoint(eager=True),
    )
    return q, assigned


@query(
    "dedup_semantic_clusters",
    oracle=f"""
    WITH {_SQL_QUANTIZED},
    {_SQL_NCELLS},
    cent AS (
      SELECT vec_id AS cid, qe AS ce, nq AS ncent FROM q
      WHERE {_SQL_CENT_WHERE}
    ),
    assigned AS (
      SELECT vec_id, cid AS cluster_id FROM (
        SELECT q.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY CAST(list_sum(list_transform(range({DIM}),
                                i -> q.qe[i+1] * c.ce[i+1])) AS DOUBLE)
                          / (sqrt(CAST(q.nq AS DOUBLE)) * sqrt(CAST(c.ncent AS DOUBLE)))
                          DESC, c.cid) AS crk
        FROM q, cent c
      ) t WHERE crk <= {ASSIGN_PROBES}
    ),
    cand AS (
      SELECT sa.vec_id AS doc_a, sb.vec_id AS doc_b,
             MIN(sa.cluster_id) AS cluster_id
      FROM assigned sa
      JOIN assigned sb ON sa.cluster_id = sb.cluster_id AND sa.vec_id < sb.vec_id
      GROUP BY sa.vec_id, sb.vec_id
    )
    SELECT * FROM (
      SELECT p.cluster_id, p.doc_a, p.doc_b,
             CAST({_SQL_DOT} AS DOUBLE)
               / (sqrt(CAST(a.nq AS DOUBLE)) * sqrt(CAST(b.nq AS DOUBLE))) AS cosine
      FROM cand p
      JOIN q a ON a.vec_id = p.doc_a
      JOIN q b ON b.vec_id = p.doc_b
    ) s WHERE cosine >= {SEMANTIC_THRESHOLD}
    """,
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: nearest-centroid clustering, then within-cluster
    cosine near-dup pairs.

    Centroids are the quantized embeddings of a deterministic id-hash
    sample (~``nc`` vectors, ``similarity.centroid_stride`` — robust to
    any vec_id layout; ``nc`` corpus-adaptive — expected cell
    population stays ~TARGET_CELL regardless of corpus size, so the
    within-cell pairing is O(n·TARGET_CELL·ASSIGN_PROBES²), linear in
    n). Assignment is a broadcast-centroid map pass: every vector joins
    its top-ASSIGN_PROBES cells by cosine (ties to the lowest centroid
    id) — multi-probe assignment recovers pairs that straddle a single
    cell boundary (recall measured against the exact all-pairs baseline
    in tests/test_semantic.py). Candidate pairs dedupe on (doc_a, doc_b)
    BEFORE the exact dot product, so shared-by-both-probes pairs cost
    one verification. Pairing shuffles once on the cell id, the dedupe
    once on the pair key; at 100 TB no stage is quadratic in the corpus
    and nothing lands on the driver. Real deployments would swap the
    deterministic centroid choice for k-means iterations — the dataflow
    (broadcast assign + cell-local pairing) is identical.
    """
    q, assigned = _assigned_cells(spark, sf_dir)
    # Cell-local a<b pairs expanded IN-ARRAY from each cell's sorted
    # member list (r14, guide §2.3/§2.4 — the winnowing idiom): one
    # exchange of the id-only assignment replaces the r13 self-join's
    # two cluster_id shuffles + SMJ. Safe to concentrate per-row: cell
    # population is bounded ~TARGET_CELL by the corpus-adaptive centroid
    # count, so the expanded array is O(TARGET_CELL²) structs, not
    # corpus-quadratic. Members are distinct within a cell (top-probe
    # cells per vector are distinct), so pair multiplicity per shared
    # cell is exactly 1, as in the join form.
    members = assigned.groupBy("cluster_id").agg(
        F.sort_array(F.collect_list("vec_id")).alias("vs")
    )
    pair_expr = F.expr(
        "flatten(transform(vs, (x, i) ->"
        " transform(slice(vs, i + 2, size(vs) - i - 1),"
        " y -> struct(x AS doc_a, y AS doc_b))))"
    )
    cand = (
        members.select("cluster_id", F.explode(pair_expr).alias("p"))
        .select("p.doc_a", "p.doc_b", "cluster_id")
        .groupBy("doc_a", "doc_b")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    cosine = _spark_dot("qa", "qb").cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    return (
        cand.join(
            q.select(
                F.col("vec_id").alias("doc_a"),
                F.col("qe").alias("qa"),
                F.col("nq").alias("na"),
            ),
            "doc_a",
        )
        .join(
            q.select(
                F.col("vec_id").alias("doc_b"),
                F.col("qe").alias("qb"),
                F.col("nq").alias("nb"),
            ),
            "doc_b",
        )
        .select("cluster_id", "doc_a", "doc_b", cosine.alias("cosine"))
        .filter(F.col("cosine") >= SEMANTIC_THRESHOLD)
    )


@query(
    "text_segment_dedup",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
    ), segs AS (
      SELECT doc_id,
             unnest(list_transform(range((len(toks) + {SEG_WORDS - 1}) // {SEG_WORDS}),
                    i -> md5(array_to_string(
                           list_slice(toks, i * {SEG_WORDS} + 1, i * {SEG_WORDS} + {SEG_WORDS}),
                           ' ')))) AS h
      FROM t
    ), occ AS (
      SELECT doc_id, COUNT(*) OVER (PARTITION BY h) AS occ FROM segs
    )
    SELECT doc_id,
           COUNT(*) AS n_segments,
           CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segments,
           CAST(CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS dup_frac
    FROM occ GROUP BY doc_id
    """,
)
def text_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-segment fraction (paragraph-dedup shape).

    Documents are cut into consecutive SEG_WORDS-word chunks; a chunk is
    "duplicated" when its md5 occurs more than once corpus-wide (within-
    document repeats count — they flag boilerplate just as cross-document
    repeats do). One shuffle on the chunk hash (window count), one
    aggregation back to the document: the plan is linear in corpus size
    and skew-free (md5 keys are uniform). Documents are never empty
    (split of "" still yields one element), so the segment sequence is
    always non-degenerate.
    """
    # memoized pre-explode materialization: without the lineage cut,
    # Generate re-evaluates the segment-hash array expression — and the
    # regex split feeding it — per output element, O(segments × doc_len)
    # regex per document (dedup.py's shingle trap, corpus._TOKS_CACHE)
    docs = _spark_tokens_materialized(spark, sf_dir)
    segs = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, int((size(toks) + {SEG_WORDS - 1}) / {SEG_WORDS}) - 1),"
                f" i -> md5(concat_ws(' ', slice(toks, i * {SEG_WORDS} + 1, {SEG_WORDS}))))"
            )
        ).alias("h"),
    )
    occ = segs.select(
        "doc_id", F.count("*").over(Window.partitionBy("h")).alias("occ")
    )
    dup = F.sum(F.when(F.col("occ") > 1, 1).otherwise(0))
    return occ.groupBy("doc_id").agg(
        F.count("*").alias("n_segments"),
        dup.alias("n_dup_segments"),
        (dup.cast("double") / F.count("*").cast("double")).alias("dup_frac"),
    )


_SQL_D2 = f"list_sum(list_transform(range({DIM}), i -> (v[i+1] - ce[i+1]) * (v[i+1] - ce[i+1])))"


@query(
    "ivf_kmeans_refine",
    oracle=f"""
    WITH {_SQL_QUANTIZED},
    {_SQL_NCELLS},
    cent0 AS (
      SELECT vec_id AS cid, qe AS ce FROM q
      WHERE {_SQL_CENT_WHERE}
    ),
    a0 AS (
      SELECT vec_id, cid, qe FROM (
        SELECT q.vec_id, c.cid, q.qe,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                 list_sum(list_transform(range({DIM}),
                   i -> (q.qe[i+1] - c.ce[i+1]) * (q.qe[i+1] - c.ce[i+1]))),
                 c.cid) AS rk
        FROM q CROSS JOIN cent0 c
      ) t WHERE rk = 1
    ),
    cent1 AS (
      SELECT cid,
             list_transform(range({DIM}), d -> CAST(FLOOR(
               CAST(list_sum(list_transform(vecs, v -> v[d+1])) AS DOUBLE)
               / CAST(len(vecs) AS DOUBLE)) AS BIGINT)) AS ce
      FROM (SELECT cid, list(qe ORDER BY vec_id) AS vecs FROM a0 GROUP BY cid) g
    ),
    a1 AS (
      SELECT vec_id, cid, d2 FROM (
        SELECT q.vec_id, c.cid,
               list_sum(list_transform(range({DIM}),
                 i -> (q.qe[i+1] - c.ce[i+1]) * (q.qe[i+1] - c.ce[i+1]))) AS d2,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                 list_sum(list_transform(range({DIM}),
                   i -> (q.qe[i+1] - c.ce[i+1]) * (q.qe[i+1] - c.ce[i+1]))),
                 c.cid) AS rk
        FROM q CROSS JOIN cent1 c
      ) t WHERE rk = 1
    )
    SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(d2) AS BIGINT) AS inertia
    FROM a1 GROUP BY cid
    """,
)
def ivf_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One k-means refinement pass over the IVF cells, oracle-exact.

    The docstring promise of dedup_semantic_clusters ("real deployments
    would swap the deterministic centroid choice for k-means
    iterations") made concrete: init centroids = the deterministic id-hash sample,
    Lloyd assign (exact integer squared distance, ties to lowest cid),
    recompute centroids as the floor of each dimension's member mean
    (floor(Σ/ n) in double — Σ < 2⁵³ so the division is correctly
    rounded and the floor is engine-portable; integer-division
    semantics differ between engines on negatives, FLOOR does not),
    reassign, and report per-cell membership + exact integer inertia.

    Scale shape: the bounded centroid set (≈nc ≤ 2^MAX_CELL_BITS rows)
    ships in the assignment UDF's closure both times; assignment is a
    map-side vectorized exact-int64 argmin (one BLAS matmul per Arrow
    batch — the pre-r5 crossjoin + min(struct) pipeline pushed n×nc
    rows through interpreted HOF lambdas, the 100× sweep's blowup
    class) — the corpus never shuffles for assignment, only the (cid,
    per-dim partial sums) relation moves for the recompute step
    (posexplode → groupBy(cid, dim) is mergeable map-side). Each added
    Lloyd iteration repeats the same two stages — cost is iterations ×
    O(n·nc·DIM) BLAS flops and one small shuffle, the standard
    distributed k-means layout.
    Reference analog: none (clustering family, SURVEY §2.8/X3
    derivative)."""
    q = _spark_quantized_materialized(spark, sf_dir).select("vec_id", "qe")
    stride = centroid_stride(table_row_count(sf_dir, "embeddings"))

    def assign(cent_rows) -> DataFrame:
        """argmin centroid per vector — map-side vectorized exact-int64
        squared distance (similarity.argmin_cell_sqdist); never a
        per-vector sort window nor an n×nc row pipeline."""
        best = argmin_cell_sqdist(cent_rows)
        return q.select("vec_id", "qe", best("qe").alias("b")).select(
            "vec_id", "qe",
            F.col("b.cid").alias("cid"), F.col("b.d2").alias("d2"),
        )

    cent0_rows = [
        (r.vec_id, r.qe)
        for r in q.filter(centroid_sample_filter(stride)).collect()
    ]
    # a0 is consumed by exactly ONE downstream aggregation (the per-dim
    # member sums) — no checkpoint (the r13 eager checkpoint
    # materialized the full (vec_id, qe, cid, d2) relation to the block
    # manager for a single-consumer plan; guide §5: persist only reused
    # intermediates), and only (cid, qe) flow into the posexplode
    # (vec_id/d2 are dead in this pass — project before the opaque
    # explode, guide §2.3).
    a0 = assign(cent0_rows).select("cid", "qe")
    # recompute: per-dim member sums via posexplode (map-side combinable)
    sums = (
        a0.select("cid", F.posexplode("qe").alias("d", "v"))
        .groupBy("cid", "d")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
    )
    mean = F.floor(F.col("s").cast("double") / F.col("n").cast("double")).cast(
        "bigint"
    )
    cent1 = (
        sums.select("cid", "d", mean.alias("m"))
        .groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("d", "m"))).alias("dm"))
        .select("cid", F.col("dm.m").alias("ce"))
    )
    cent1_rows = [(r.cid, r.ce) for r in cent1.collect()]
    a1 = assign(cent1_rows)
    return a1.groupBy("cid").agg(
        F.count("*").alias("n_members"),
        F.sum("d2").alias("inertia"),
    )


# ---------------------------------------------------------------------------
# Cross-modal duplicate rule (round-13 VERDICT #3): one pair-level rule
# joining TEXT near-dup evidence (shingle MinHash-LSH, exact-Jaccard
# verified) with MEDIA near-dup evidence (embedding cosine over the
# SemDeDup cell candidates — the embeddings fixture stands in for the
# decoded-media embedding column that multimodal.py's decode stage
# produces at 100 TB). A pair is a cross-modal duplicate iff
# text-Jaccard ≥ JACCARD_THRESHOLD OR embedding-cosine ≥
# SEMANTIC_THRESHOLD; the output keeps both evidence columns so
# downstream policy can distinguish "same words" from "same meaning /
# same image".
# ---------------------------------------------------------------------------


def _cross_modal_oracle() -> str:
    from .dedup import JACCARD_THRESHOLD, minhash_pairs_cte

    return f"""
    WITH {minhash_pairs_cte()},
    tpairs AS (
      SELECT doc_a, doc_b, jaccard FROM verified
      WHERE jaccard >= {JACCARD_THRESHOLD}
    ),
    {_SQL_QUANTIZED},
    {_SQL_NCELLS},
    cent AS (
      SELECT vec_id AS cid, qe AS ce, nq AS ncent FROM q
      WHERE {_SQL_CENT_WHERE}
    ),
    eassigned AS (
      SELECT vec_id, cid AS cluster_id FROM (
        SELECT q.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY CAST(list_sum(list_transform(range({DIM}),
                                i -> q.qe[i+1] * c.ce[i+1])) AS DOUBLE)
                          / (sqrt(CAST(q.nq AS DOUBLE)) * sqrt(CAST(c.ncent AS DOUBLE)))
                          DESC, c.cid) AS crk
        FROM q, cent c
      ) t WHERE crk <= {ASSIGN_PROBES}
    ),
    ecand AS (
      SELECT sa.vec_id AS doc_a, sb.vec_id AS doc_b
      FROM eassigned sa
      JOIN eassigned sb ON sa.cluster_id = sb.cluster_id
                       AND sa.vec_id < sb.vec_id
      GROUP BY sa.vec_id, sb.vec_id
    ),
    epairs AS (
      SELECT * FROM (
        SELECT p.doc_a, p.doc_b,
               CAST({_SQL_DOT} AS DOUBLE)
                 / (sqrt(CAST(a.nq AS DOUBLE)) * sqrt(CAST(b.nq AS DOUBLE))) AS cosine
        FROM ecand p
        JOIN q a ON a.vec_id = p.doc_a
        JOIN q b ON b.vec_id = p.doc_b
      ) s WHERE cosine >= {SEMANTIC_THRESHOLD}
    )
    SELECT COALESCE(t.doc_a, e.doc_a) AS doc_a,
           COALESCE(t.doc_b, e.doc_b) AS doc_b,
           t.jaccard AS jaccard,
           e.cosine AS cosine,
           (t.doc_a IS NOT NULL) AS matched_text,
           (e.doc_a IS NOT NULL) AS matched_media
    FROM tpairs t
    FULL OUTER JOIN epairs e
      ON t.doc_a = e.doc_a AND t.doc_b = e.doc_b
    """


@query("dedup_cross_modal", oracle=_cross_modal_oracle())
def dedup_cross_modal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal near-dup pairs: duplicate iff text-Jaccard ≥ t OR
    media-embedding cosine ≥ c, with both evidence columns per pair
    (round-13 VERDICT #3).

    Both sides are the engine's SUBQUADRATIC candidate paths — LSH
    banding for text (memoized verified pairs,
    dedup._lsh_verified_pairs) and SemDeDup cell-bounded pairing for
    embeddings (dedup_semantic_clusters) — merged with one FULL OUTER
    join on the pair key. At 100 TB the merge shuffles only the two
    candidate-bounded pair relations (each linear in the corpus by the
    LSH/cell arguments; flatness across decades is pinned by
    tests/test_decade_scale.py's cross-modal row), never the corpora.
    Reference analog: none (X2 multimodal derivative, SURVEY §2.8)."""
    from .dedup import _lsh_verified_pairs, JACCARD_THRESHOLD

    t = (
        _lsh_verified_pairs(spark, sf_dir)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )
    e = dedup_semantic_clusters(spark, sf_dir).select(
        "doc_a", "doc_b", "cosine"
    )
    return (
        t.join(e, ["doc_a", "doc_b"], "full_outer")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            "cosine",
            F.col("jaccard").isNotNull().alias("matched_text"),
            F.col("cosine").isNotNull().alias("matched_media"),
        )
    )
