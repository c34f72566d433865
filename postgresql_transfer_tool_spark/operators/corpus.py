"""Corpus-level training-data operators: global n-gram statistics,
TF-IDF term scoring, and benchmark-contamination detection.

These complement the per-document signals in `operators/text.py` with
the cross-document passes an LLM data pipeline runs before training:
what the corpus's dominant n-grams are (boilerplate detection), which
terms characterize each document (TF-IDF), and whether any training
document shares long n-grams with a held-out benchmark set
(decontamination — the Brown et al. GPT-3 appendix-C style check).

Scale design: all three explode documents into tokens/n-grams and
aggregate — the shuffle key is the n-gram (high cardinality, naturally
balanced), document-frequency tables are computed once per pass, and
the contamination check broadcasts the benchmark n-gram set (the
benchmark is always tiny relative to the corpus) so the corpus side
stays map-side + one per-doc aggregation. No Python in any row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.memo import CheckpointMemo
from .registry import query

#: Tokenization shared by all three passes — identical semantics in
#: Spark `split` (Java regex) and DuckDB `string_split_regex` (RE2).
_SQL_TOKS = r"string_split_regex(trim(text), '\s+')"


def _spark_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # repartition first: the fixture ships one file = one split, and the
    # tokenize/explode stages downstream are CPU-bound (same pattern as
    # dedup.py's shingle pipeline; a real lake scan has natural splits).
    return (
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", F.split(F.trim("text"), r"\s+").alias("toks"))
        .filter(F.size("toks") > 0)
    )


#: materialized token relation memo, keyed by (applicationId, sf_dir) —
#: same pattern (and same reason) as dedup._SHINGLE_CACHE; LRU-bounded
#: with unpersist-on-evict (functions/memo.py).
_TOKS_CACHE = CheckpointMemo()


def _spark_tokens_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, toks) lineage-cut BEFORE any explode consumer.

    Generate's codegen re-evaluates its child array expression per
    OUTPUT element, so ``explode(split(trim(text), '\\s+'))`` re-runs
    the regex split once per token — O(tokens × doc_len) regex work per
    document (the exact trap measured 7.2 s → 0.3 s on the shingle
    pipeline, dedup.py:94-100). The checkpoint makes the explode a
    plain column read; the memo shares the one materialization across
    every corpus query in a session (tf-idf, inverted index, BM25)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _TOKS_CACHE.get(key)
    if cached is None:
        cached = _TOKS_CACHE.put(
            key, _spark_tokens(spark, sf_dir).localCheckpoint(eager=False)
        )
    return cached


@query(
    "corpus_ngram_topk",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
      WHERE len({_SQL_TOKS}) > 0
    ), g AS (
      SELECT unnest(list_transform(range(len(toks) - 2),
                    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))
               AS gram
      FROM t WHERE len(toks) >= 3
    )
    SELECT gram, n_occurrences, rk FROM (
      SELECT gram, COUNT(*) AS n_occurrences,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, gram) AS rk
      FROM g GROUP BY gram
    ) ranked WHERE rk <= 20
    """,
)
def corpus_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 word 3-grams across the corpus — the boilerplate /
    template detector. Explode → count → rank; the count aggregation is
    map-side combined by Spark, and the final top-k is a single-reducer
    rank over the already-aggregated (small) gram table."""
    # checkpoint before exploding: CollapseProject would fold the 3-gram
    # transform into Generate's child, which re-evaluates the array per
    # output element (O(tokens²) per doc — see dedup.py's shingle memo).
    gram_arrays = (
        _spark_tokens_materialized(spark, sf_dir)
        .filter(F.size("toks") >= 3)
        .select(
            F.expr(
                "transform(sequence(0, size(toks)-3),"
                " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
            ).alias("grams")
        )
        .localCheckpoint(eager=False)
    )
    grams = gram_arrays.select(F.explode("grams").alias("gram"))
    # orderBy+limit compiles to TakeOrderedAndProject (distributed
    # per-partition top-k, merged once) — never a global sort or a
    # single-task rank window; row_number then runs on 20 rows only.
    top = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("gram"))
        .limit(20)
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("gram"))
    return top.withColumn("rk", F.row_number().over(w))


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS w FROM documents
      WHERE len({_SQL_TOKS}) > 0
    ),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY doc_id, w),
    df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY w),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, w AS top_term, tf, df, score FROM (
      SELECT tf.doc_id, tf.w, tf.tf, df.df,
             CAST(tf.tf AS DOUBLE)
               * (CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS score,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY CAST(tf.tf AS DOUBLE)
                        * (CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE))
                        DESC, tf.w) AS rk
      FROM tf, df, n WHERE tf.w = df.w
    ) ranked WHERE rk = 1
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most characteristic term per document by TF-IDF with raw-ratio
    IDF (N/df — division-only, so the score is two IEEE ops on
    identical integers and bit-identical across engines; log-scaled IDF
    would rank identically for ties-free data but is not exactly
    portable). df is one extra aggregation over the same token relation;
    n_docs joins in as a broadcast scalar, never a driver collect."""
    toks = _spark_tokens_materialized(spark, sf_dir)
    tok = toks.select("doc_id", F.explode("toks").alias("w"))
    tf = tok.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    # df derived FROM tf: tf holds exactly one row per (doc_id, w), so
    # COUNT(*) per w over tf == COUNT(DISTINCT doc_id) over the raw
    # token stream — but it re-aggregates the already-reduced tf rows
    # (identical subtree, so the planner reuses tf's exchange) instead
    # of re-exploding the token stream and shuffling raw (w, doc_id)
    # pairs a second time (guide §2.3 "aggregate before you shuffle").
    df = tf.groupBy("w").agg(F.count("*").alias("df"))
    n_docs = load_table(spark, sf_dir, "documents").agg(
        F.count("*").alias("n_docs")
    )
    score = F.col("tf").cast("double") * (
        F.col("n_docs").cast("double") / F.col("df").cast("double")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("w"))
    return (
        tf.join(F.broadcast(df), "w")
        .join(F.broadcast(n_docs))
        .select("doc_id", "w", "tf", "df", score.alias("score"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("w").alias("top_term"), "tf", "df", "score")
    )


#: benchmark split: every 50th document is the held-out "eval set"
_BENCH_MOD = 50
#: contamination n-gram length (word 5-grams)
_NGRAM = 5


@query(
    "contamination_ngram_overlap",
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
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per training document, how many of its
    distinct word 5-grams appear anywhere in the held-out set (docs with
    doc_id % 50 == 0). The benchmark gram set broadcasts; the corpus
    side is one map-side explode + per-doc aggregation — at 100 TB the
    only shuffle is the final doc_id groupBy. The fixture's planted
    near-duplicate pairs make real collisions when one twin lands in the
    benchmark split."""
    grams_expr = F.expr(
        f"array_distinct(transform(sequence(0, size(toks)-{_NGRAM}),"
        " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],"
        " toks[i+4])))"
    )
    # localCheckpoint: the gram relation feeds both the bench and train
    # branches — materialize once instead of re-running the CPU-heavy
    # tokenize+5-gram expression per branch (same pattern as dedup.py).
    # The balance repartition runs BEFORE the gram build (r14, guide
    # §2.3): the round-robin exchange then carries the token arrays,
    # not the ~5×-heavier distinct-5-gram arrays, and the CPU-heavy
    # gram expression still evaluates spread across the full core
    # budget (sized from the session, not the r13 hard-coded 32).
    g = (
        _spark_tokens_materialized(spark, sf_dir)
        .repartition(spark.sparkContext.defaultParallelism)
        .filter(F.size("toks") >= _NGRAM)
        .select("doc_id", grams_expr.alias("grams"))
        .localCheckpoint(eager=True)
    )
    bench = (
        g.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select(F.explode("grams").alias("bgram"))
        .distinct()
    )
    train = g.filter(F.col("doc_id") % _BENCH_MOD != 0).select(
        "doc_id", F.explode("grams").alias("gram")
    )
    return (
        train.join(F.broadcast(bench), train.gram == bench.bgram, "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count("bgram").alias("n_shared"),
            (F.count("bgram") > 0).alias("is_contaminated"),
        )
    )


from .relational import dd

#: Unit separator (\x1f) joins bigram halves -- cannot appear inside
#: whitespace-split tokens, unlike a space which could collide with
#: tokens produced from runs of mixed whitespace.
_US = "\x1f"

#: Documents whose mean conditional bigram probability falls below this
#: are "low-fluency" (boilerplate/gibberish under the corpus's own LM).
_LM_LOW = 0.05


@query(
    "text_bigram_lm_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {_SQL_TOKS} AS toks FROM documents
      WHERE len({_SQL_TOKS}) >= 2
    ), bg AS (
      SELECT doc_id, source,
             unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || chr(31) || toks[i+1])) AS bg
      FROM t
    ), c12 AS (
      SELECT bg, COUNT(*) AS c12 FROM bg GROUP BY bg
    ), c1 AS (
      SELECT split_part(bg, chr(31), 1) AS w1, COUNT(*) AS c1
      FROM bg GROUP BY 1
    ), scored AS (
      SELECT b.doc_id, b.source,
             CAST(CAST(CAST(c12.c12 AS DOUBLE) / CAST(c1.c1 AS DOUBLE)
                       AS VARCHAR) AS DECIMAL(11,10)) AS p
      FROM bg b
      JOIN c12 ON b.bg = c12.bg
      JOIN c1 ON split_part(b.bg, chr(31), 1) = c1.w1
    ), per_doc AS (
      SELECT doc_id, source,
             {dd("SUM(p)")} / COUNT(*) AS doc_score
      FROM scored GROUP BY doc_id, source
    )
    SELECT source,
           COUNT(*) AS n_docs,
           {dd("SUM(CAST(CAST(doc_score AS VARCHAR) AS DECIMAL(12,10)))")} / COUNT(*)
             AS avg_score,
           CAST(SUM(CASE WHEN doc_score < {_LM_LOW} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_low_fluency
    FROM per_doc GROUP BY source
    """,
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram LM fluency score (perplexity-filter proxy,
    the CCNet/KenLM-style quality gate): P(w2|w1) = c(w1,w2)/c(w1.)
    estimated from the corpus itself, each document scored by its mean
    conditional probability, aggregated per source with a low-fluency
    count.

    Division-only probabilities (no logs -- libm log() is not
    bit-portable across engines; ranking is preserved) and decimal
    quantization before every reaggregation keep the result
    hash-identical to the oracle. Re-quantizing a *computed* double
    (p and doc_score both) goes double->VARCHAR->decimal: both engines print the
    same shortest-round-trip digits for the same double and round the
    same digit string half-up, whereas direct double->decimal casts can
    disagree by one quantum at rounding boundaries (observed at sf0.001).
    Domain contract (tests/test_quantization_property.py): engines agree
    for x == 0 or x >= 10^-(scale-1); DuckDB 1.0.0 mis-rounds values
    whose digits all fall below the scale. Count-ratio scores sit far
    inside the agreeing domain.

    Scale: the bigram-count join keys on the bigram itself -- high
    cardinality, naturally balanced, AQE splits stragglers; the context
    (unigram) table is vocabulary-sized and broadcasts. Two shuffles of
    the token stream total; no Python in the row path.
    Reference analog: none (driver-mandated extension surface, X4)."""
    # checkpoint the bigram ARRAYS pre-explode (the corpus_ngram_topk /
    # dedup.py shingle discipline): exploding the transform() expression
    # directly re-evaluates the whole array build once per OUTPUT bigram
    # (Generate codegen — O(len²) regex+concat work per document); over
    # a checkpointed array column the explode is a plain read, and the
    # one materialization serves both remaining branches (c1 and the
    # scored window pass).
    bgarr = (
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id", "source", F.split(F.trim("text"), r"\s+").alias("toks")
        )
        .filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            "source",
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> concat(toks[i-1], chr(31), toks[i]))"
            ).alias("bgs"),
        )
        .localCheckpoint(eager=False)
    )
    bg = bgarr.select("doc_id", "source", F.explode("bgs").alias("bg"))
    c1 = bg.groupBy(F.split_part("bg", F.lit(_US), F.lit(1)).alias("w1")).agg(
        F.count("*").alias("c1")
    )
    # VARCHAR round-trip before the decimal quantization — the same
    # discipline as doc_score below: both engines print identical
    # shortest-round-trip digits for identical doubles and round the
    # digit string half-up, where a DIRECT double->decimal cast can
    # disagree by one quantum at rounding boundaries (ADVICE r2).
    p = (
        (F.col("c12").cast("double") / F.col("c1").cast("double"))
        .cast("string")
        .cast("decimal(11,10)")
    )
    # c12 as a whole-partition count window over the bigram key instead
    # of groupBy(bg) + join back (guide §2.4 "share one exchange"): the
    # join form shuffled the RAW bigram stream for the sort-merge probe
    # AND the partial-aggregated count table, and re-ran the explode a
    # third time for the probe branch; the window form shuffles the
    # stream exactly once on hash(bg) and counts within each key group
    # in place — identical c12 values, one fewer exchange and one fewer
    # explode pass over the token stream.
    scored = (
        bg.withColumn("c12", F.count(F.lit(1)).over(Window.partitionBy("bg")))
        .join(
            F.broadcast(c1),
            F.split_part("bg", F.lit(_US), F.lit(1)) == F.col("w1"),
        )
        .select("doc_id", "source", p.alias("p"))
    )
    per_doc = scored.groupBy("doc_id", "source").agg(
        (F.sum("p").cast("double") / F.count("*")).alias("doc_score")
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        (
            F.sum(
                F.col("doc_score").cast("string").cast("decimal(12,10)")
            ).cast("double")
            / F.count("*")
        ).alias("avg_score"),
        F.sum(
            F.when(F.col("doc_score") < _LM_LOW, 1).otherwise(0)
        ).alias("n_low_fluency"),
    )


#: KMV sketch size (k minimum hash values per set).
KMV_K = 64
#: suppliers compared pairwise (8 -> 28 pairs; catalogs are ~30% of the
#: part space each, so pairwise Jaccard is genuinely partial).
KMV_SUPPLIERS = 8


@query(
    "supplier_part_overlap_kmv",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT l_suppkey AS sk,
             CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8) AS BIGINT) AS h
      FROM lineitem WHERE l_suppkey <= {KMV_SUPPLIERS}
    ), sizes AS (
      SELECT sk, COUNT(*) AS n_parts FROM h GROUP BY sk
    ), kmv AS (
      SELECT sk, h FROM (
        SELECT sk, h,
               ROW_NUMBER() OVER (PARTITION BY sk ORDER BY h) AS rk
        FROM h
      ) r WHERE rk <= {KMV_K}
    ), pairs AS (
      SELECT a.sk AS sa, b.sk AS sb
      FROM sizes a JOIN sizes b ON a.sk < b.sk
    ), ux AS (
      SELECT sa, sb, h FROM (
        SELECT p.sa, p.sb, k.h,
               ROW_NUMBER() OVER (PARTITION BY p.sa, p.sb ORDER BY k.h) AS rk
        FROM pairs p
        JOIN kmv k ON k.sk = p.sa OR k.sk = p.sb
        GROUP BY p.sa, p.sb, k.h
      ) u WHERE rk <= {KMV_K}
    ), ux_sz AS (
      SELECT sa, sb, COUNT(*) AS n_ux FROM ux GROUP BY sa, sb
    ), both_cnt AS (
      SELECT x.sa, x.sb, COUNT(*) AS n_both
      FROM ux x
      JOIN kmv ka ON ka.sk = x.sa AND ka.h = x.h
      JOIN kmv kb ON kb.sk = x.sb AND kb.h = x.h
      GROUP BY x.sa, x.sb
    ), inter AS (
      SELECT a.sk AS sa, b.sk AS sb, COUNT(*) AS n_inter
      FROM h a JOIN h b ON a.h = b.h AND a.sk < b.sk
      GROUP BY 1, 2
    )
    SELECT p.sa AS supp_a, p.sb AS supp_b,
           sa_s.n_parts AS n_parts_a, sb_s.n_parts AS n_parts_b,
           COALESCE(i.n_inter, 0) AS n_inter,
           CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
             / (sa_s.n_parts + sb_s.n_parts - COALESCE(i.n_inter, 0))
             AS exact_jaccard,
           CAST(COALESCE(b.n_both, 0) AS DOUBLE) / u.n_ux AS kmv_jaccard
    FROM pairs p
    JOIN sizes sa_s ON sa_s.sk = p.sa
    JOIN sizes sb_s ON sb_s.sk = p.sb
    JOIN ux_sz u ON u.sa = p.sa AND u.sb = p.sb
    LEFT JOIN inter i ON i.sa = p.sa AND i.sb = p.sb
    LEFT JOIN both_cnt b ON b.sa = p.sa AND b.sb = p.sb
    """,
)
def supplier_part_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise catalog overlap between suppliers (distinct-part sets
    from lineitem): exact Jaccard AND the k-minimum-values sketch
    estimate (Beyer et al., SIGMOD 2007) side by side — the
    theta-sketch set-intersection use case re-expressed relationally.
    KMV is the mergeable-sketch answer to distinct-set overlap at
    100 TB: each partition keeps its k smallest member hashes per set,
    merges are constant-size min-merges, and the pairwise estimate
    J ≈ |X ∩ A_k ∩ B_k| / |X| (X = k smallest of the merged sketch;
    exact when the union fits in k) needs only the sketches — never a
    member-level join. The exact path (full hash-set intersection) is
    the calibration baseline, same role as ``ndv_exact`` next to
    ``ndv_approx``; tests/test_approx.py bounds the estimator error.
    Hashes are the shared md5 prefix, so sketch contents are
    bit-identical across engines (deterministic, no RNG).
    Reference analog: none (driver-mandated extension surface, X5)."""
    from pyspark.sql.window import Window

    h = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey") <= KMV_SUPPLIERS)
        .select(
            F.col("l_suppkey").alias("sk"),
            F.conv(
                F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 8), 16, 10
            )
            .cast("bigint")
            .alias("h"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = h.groupBy("sk").agg(F.count("*").alias("n_parts"))
    rk = F.row_number().over(Window.partitionBy("sk").orderBy("h"))
    kmv = (
        h.withColumn("rk", rk).filter(F.col("rk") <= KMV_K).select("sk", "h")
    ).localCheckpoint(eager=False)
    pairs = (
        sizes.alias("a")
        .join(sizes.alias("b"), F.col("a.sk") < F.col("b.sk"))
        .select(
            F.col("a.sk").alias("sa"),
            F.col("b.sk").alias("sb"),
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
        )
    )
    ku = (
        pairs.select("sa", "sb")
        .join(
            F.broadcast(kmv),
            (F.col("sk") == F.col("sa")) | (F.col("sk") == F.col("sb")),
        )
        .select("sa", "sb", "h")
        .distinct()
    )
    urk = F.row_number().over(Window.partitionBy("sa", "sb").orderBy("h"))
    ux = ku.withColumn("rk", urk).filter(F.col("rk") <= KMV_K).drop("rk")
    ux_sz = ux.groupBy("sa", "sb").agg(F.count("*").alias("n_ux"))
    ka, kb = kmv.alias("ka"), kmv.alias("kb")
    both = (
        ux.alias("x")
        .join(
            F.broadcast(ka),
            (F.col("ka.sk") == F.col("x.sa")) & (F.col("ka.h") == F.col("x.h")),
        )
        .join(
            F.broadcast(kb),
            (F.col("kb.sk") == F.col("x.sb")) & (F.col("kb.h") == F.col("x.h")),
        )
        .groupBy(F.col("x.sa").alias("sa"), F.col("x.sb").alias("sb"))
        .agg(F.count("*").alias("n_both"))
    )
    inter = (
        h.alias("x")
        .join(
            h.alias("y"),
            (F.col("x.h") == F.col("y.h")) & (F.col("x.sk") < F.col("y.sk")),
        )
        .groupBy(F.col("x.sk").alias("sa"), F.col("y.sk").alias("sb"))
        .agg(F.count("*").alias("n_inter"))
    )
    n_inter = F.coalesce(F.col("n_inter"), F.lit(0))
    return (
        pairs.join(ux_sz, ["sa", "sb"])
        .join(inter, ["sa", "sb"], "left")
        .join(both, ["sa", "sb"], "left")
        .select(
            F.col("sa").alias("supp_a"),
            F.col("sb").alias("supp_b"),
            "n_parts_a",
            "n_parts_b",
            n_inter.alias("n_inter"),
            (
                n_inter.cast("double")
                / (F.col("n_parts_a") + F.col("n_parts_b") - n_inter)
            ).alias("exact_jaccard"),
            (
                F.coalesce(F.col("n_both"), F.lit(0)).cast("double")
                / F.col("n_ux")
            ).alias("kmv_jaccard"),
        )
    )


@query(
    "inverted_index_conjunctive",
    oracle=f"""
    WITH w AS (
      SELECT DISTINCT doc_id, unnest({_SQL_TOKS}) AS w FROM documents
    ), top2 AS (
      SELECT w, ROW_NUMBER() OVER (ORDER BY COUNT(DISTINCT doc_id) DESC, w) AS rk
      FROM w GROUP BY w
    ), terms AS (
      SELECT MIN(CASE WHEN rk = 1 THEN w END) AS term_a,
             MIN(CASE WHEN rk = 2 THEN w END) AS term_b
      FROM top2 WHERE rk <= 2
    ), postings AS (
      SELECT w.doc_id,
             MAX(CASE WHEN w.w = t.term_a THEN 1 ELSE 0 END) AS has_a,
             MAX(CASE WHEN w.w = t.term_b THEN 1 ELSE 0 END) AS has_b
      FROM w CROSS JOIN terms t
      WHERE w.w = t.term_a OR w.w = t.term_b
      GROUP BY w.doc_id
    )
    SELECT t.term_a, t.term_b,
           CAST(SUM(has_a) AS BIGINT) AS n_docs_a,
           CAST(SUM(has_b) AS BIGINT) AS n_docs_b,
           CAST(SUM(has_a * has_b) AS BIGINT) AS n_docs_both
    FROM postings CROSS JOIN terms t
    GROUP BY t.term_a, t.term_b
    """,
)
def inverted_index_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive term retrieval through postings intersection: pick
    the corpus's two highest-document-frequency terms (deterministic
    tie-break), build their posting lists, and intersect — the
    inverted-index shape a corpus search/decontamination service runs,
    expressed declaratively. One tokenize pass produces the DISTINCT
    (doc, term) relation; document frequencies top-2 via TakeOrdered
    (never a global rank window over the vocabulary); the tiny term
    pair broadcasts back so postings construction is a map-side filter
    of the same relation — at 100 TB the full postings index is the
    (doc, term) relation bucketed by term, and a conjunctive query
    touches only the queried terms' buckets. Reference analog: none
    (corpus retrieval family, SURVEY §2.8/X4 derivative)."""
    dw = (
        _spark_tokens_materialized(spark, sf_dir)
        .select("doc_id", F.explode("toks").alias("w"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # dw is already DISTINCT (doc_id, w), so the document frequency is a
    # plain COUNT — countDistinct would re-plan the distinct as an extra
    # (w, doc_id) aggregation + exchange before the per-w count (r14,
    # guide §2.4: a distinct on data that is already unique).
    top2 = (
        dw.groupBy("w")
        .agg(F.count("doc_id").alias("df"))
        .orderBy(F.col("df").desc(), F.col("w"))
        .limit(2)
    )
    # rank the two terms deterministically (higher df first, tie on
    # word) WITHOUT any window: sort the 2-row result as an array
    t = top2.agg(
        F.sort_array(
            F.collect_list(F.struct((-F.col("df")).alias("negdf"), F.col("w")))
        ).alias("arr")
    ).select(
        F.col("arr")[0]["w"].alias("term_a"),
        F.col("arr")[1]["w"].alias("term_b"),
    )
    hits = (
        dw.crossJoin(F.broadcast(t))
        .filter((F.col("w") == F.col("term_a")) | (F.col("w") == F.col("term_b")))
        .groupBy("doc_id", "term_a", "term_b")
        .agg(
            F.max(F.when(F.col("w") == F.col("term_a"), 1).otherwise(0)).alias("has_a"),
            F.max(F.when(F.col("w") == F.col("term_b"), 1).otherwise(0)).alias("has_b"),
        )
    )
    return hits.groupBy("term_a", "term_b").agg(
        F.sum("has_a").alias("n_docs_a"),
        F.sum("has_b").alias("n_docs_b"),
        F.sum(F.col("has_a") * F.col("has_b")).alias("n_docs_both"),
    )


#: BM25 constants (write 2.2 literally, never 1.2+1.0 — both engines
#: must parse the identical double literal)
_BM25_K1 = "1.2"
_BM25_K1P1 = "2.2"
_BM25_B = "0.75"
_BM25_1MB = "0.25"
#: query terms: document-frequency ranks 5-7 (skipping the saturated
#: top stopword-like terms keeps the ranking discriminative)
_BM25_RANKS = (5, 6, 7)
_BM25_TOPN = 20

#: bm25 query-relation memo, keyed by (applicationId, sf_dir): the
#: 1-row (query terms + dfs + corpus totals) relation costs a full
#: token explode + per-term distinct-doc aggregate + TakeOrdered — the
#: dominant subtree of every bm25 call — while its RESULT is eight
#: scalar constants for a fixed corpus. Memoized per session under the
#: same convention as the shingle/token memos (r14 VERDICT item 7,
#: taken up only now that the central clear_all_memos registry exists:
#: bm25_ranked_retrieval joins bench.MEMO_QUERIES so the memo-cold
#: standalone cost stays on record). Auto-registered for the bench's
#: cold reset via the CheckpointMemo constructor.
_BM25_QUERY_CACHE = CheckpointMemo()


def _bm25_query_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE checkpointed row: (term_a, df_a, term_b, df_b, term_c, df_c,
    n_docs, sum_dl) — the fixed 3-term query (df ranks 5-7), each
    term's document frequency, and the corpus length totals. Both
    consumers broadcast it (postings filter + score attach), so
    materializing it once also stops the plan building the df-ranking
    subtree twice (guide §7.2, duplicated subtrees)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _BM25_QUERY_CACHE.get(key)
    if cached is not None:
        return cached
    toks = _spark_tokens_materialized(spark, sf_dir)
    tok = toks.select("doc_id", F.explode("toks").alias("w"))
    n = toks.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("toks").cast("bigint")).alias("sum_dl"),
    )
    dfr = tok.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    top = dfr.orderBy(F.col("df").desc(), "w").limit(max(_BM25_RANKS))
    # rank rows 5-7 without a window: sort the 7-row result as an array
    t = top.agg(
        F.sort_array(
            F.collect_list(F.struct((-F.col("df")).alias("negdf"), "w", "df"))
        ).alias("arr")
    ).select(
        *[
            c
            for i, name in zip(_BM25_RANKS, ("a", "b", "c"))
            for c in (
                F.col("arr")[i - 1]["w"].alias(f"term_{name}"),
                F.col("arr")[i - 1]["df"].alias(f"df_{name}"),
            )
        ]
    )
    return _BM25_QUERY_CACHE.put(
        key, t.crossJoin(n).localCheckpoint(eager=False)
    )


@query(
    "bm25_ranked_retrieval",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS w FROM documents
      WHERE len({_SQL_TOKS}) > 0
    ),
    dl AS (SELECT doc_id, len({_SQL_TOKS}) AS dl FROM documents
           WHERE len({_SQL_TOKS}) > 0),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(len({_SQL_TOKS})) AS BIGINT) AS sum_dl
          FROM documents WHERE len({_SQL_TOKS}) > 0),
    dfr AS (
      SELECT w, COUNT(DISTINCT doc_id) AS df,
             ROW_NUMBER() OVER (ORDER BY COUNT(DISTINCT doc_id) DESC, w) AS rk
      FROM tok GROUP BY w
    ),
    terms AS (
      SELECT MIN(CASE WHEN rk = {_BM25_RANKS[0]} THEN w END) AS term_a,
             MIN(CASE WHEN rk = {_BM25_RANKS[0]} THEN df END) AS df_a,
             MIN(CASE WHEN rk = {_BM25_RANKS[1]} THEN w END) AS term_b,
             MIN(CASE WHEN rk = {_BM25_RANKS[1]} THEN df END) AS df_b,
             MIN(CASE WHEN rk = {_BM25_RANKS[2]} THEN w END) AS term_c,
             MIN(CASE WHEN rk = {_BM25_RANKS[2]} THEN df END) AS df_c
      FROM dfr WHERE rk IN {_BM25_RANKS}
    ),
    tf AS (
      SELECT tok.doc_id,
             CAST(SUM(CASE WHEN tok.w = t.term_a THEN 1 ELSE 0 END) AS BIGINT) AS tf_a,
             CAST(SUM(CASE WHEN tok.w = t.term_b THEN 1 ELSE 0 END) AS BIGINT) AS tf_b,
             CAST(SUM(CASE WHEN tok.w = t.term_c THEN 1 ELSE 0 END) AS BIGINT) AS tf_c
      FROM tok CROSS JOIN terms t
      WHERE tok.w = t.term_a OR tok.w = t.term_b OR tok.w = t.term_c
      GROUP BY tok.doc_id
    ),
    scored AS (
      SELECT tf.doc_id, t.term_a, t.term_b, t.term_c,
             tf.tf_a, tf.tf_b, tf.tf_c, dl.dl,
             (CASE WHEN tf.tf_a > 0 THEN
               ((CAST(n.n_docs AS DOUBLE) - CAST(t.df_a AS DOUBLE) + 0.5)
                / (CAST(t.df_a AS DOUBLE) + 0.5))
               * ((CAST(tf.tf_a AS DOUBLE) * {_BM25_K1P1})
                  / (CAST(tf.tf_a AS DOUBLE) + {_BM25_K1} * ({_BM25_1MB}
                     + {_BM25_B} * (CAST(dl.dl AS DOUBLE)
                        / (CAST(n.sum_dl AS DOUBLE) / CAST(n.n_docs AS DOUBLE))))))
              ELSE 0.0 END
             +
             CASE WHEN tf.tf_b > 0 THEN
               ((CAST(n.n_docs AS DOUBLE) - CAST(t.df_b AS DOUBLE) + 0.5)
                / (CAST(t.df_b AS DOUBLE) + 0.5))
               * ((CAST(tf.tf_b AS DOUBLE) * {_BM25_K1P1})
                  / (CAST(tf.tf_b AS DOUBLE) + {_BM25_K1} * ({_BM25_1MB}
                     + {_BM25_B} * (CAST(dl.dl AS DOUBLE)
                        / (CAST(n.sum_dl AS DOUBLE) / CAST(n.n_docs AS DOUBLE))))))
              ELSE 0.0 END)
             +
             CASE WHEN tf.tf_c > 0 THEN
               ((CAST(n.n_docs AS DOUBLE) - CAST(t.df_c AS DOUBLE) + 0.5)
                / (CAST(t.df_c AS DOUBLE) + 0.5))
               * ((CAST(tf.tf_c AS DOUBLE) * {_BM25_K1P1})
                  / (CAST(tf.tf_c AS DOUBLE) + {_BM25_K1} * ({_BM25_1MB}
                     + {_BM25_B} * (CAST(dl.dl AS DOUBLE)
                        / (CAST(n.sum_dl AS DOUBLE) / CAST(n.n_docs AS DOUBLE))))))
              ELSE 0.0 END AS score
      FROM tf JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN n CROSS JOIN terms t
    )
    SELECT doc_id, term_a, term_b, term_c, tf_a, tf_b, tf_c, dl, score
    FROM scored ORDER BY score DESC, doc_id LIMIT {_BM25_TOPN}
    """,
)
def bm25_ranked_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{_BM25_TOPN} ranked retrieval for a fixed 3-term query
    (the corpus's document-frequency ranks 5-7 — deterministic, and
    mid-frequency terms keep the ranking discriminative).

    The score is the textbook Okapi form with a RATIONAL idf
    ((N - df + 0.5)/(df + 0.5), no log): libm-vs-JVM log differs by
    1 ulp (the engine's documented cross-engine FP trap), while this
    form is a fixed sequence of correctly-rounded IEEE ops — the same
    division-only portability trick as tfidf_top_terms, so even the
    SCORE is bit-identical to the oracle. Per-doc scores add in fixed
    (a, b, c) term order; zero-tf terms contribute an exact 0.0.

    Scale shape: one tokenize pass; df ranks via TakeOrdered over the
    term aggregate (no vocabulary-wide rank window); the 1-row query
    relation broadcasts into a map-side postings filter (only rows for
    the 3 queried terms survive the scan — at 100 TB with the postings
    relation bucketed by term this touches 3 buckets); scoring is one
    groupBy(doc_id) over those postings plus a plain equi-join with
    the per-doc length relation on doc_id — NO broadcast hint: the
    length relation is O(N_docs) (one row per corpus document), so a
    forced broadcast would overflow driver/executor memory at 10^8+
    docs; the hits side is the bounded one (docs containing the 3
    query terms), and AQE converts the join to a broadcast at runtime
    whenever either side is genuinely small. The final top-{_BM25_TOPN} is
    TakeOrderedAndProject, never a global sort. Reference analog: none
    (corpus retrieval family, SURVEY §2.8/X4 derivative alongside
    inverted_index_conjunctive)."""
    toks = _spark_tokens_materialized(spark, sf_dir)
    tok = toks.select("doc_id", F.explode("toks").alias("w"))
    dl = toks.select("doc_id", F.size("toks").alias("dl"))
    t = _bm25_query_relation(spark, sf_dir)
    hits = (
        tok.crossJoin(F.broadcast(t))
        .filter(
            (F.col("w") == F.col("term_a"))
            | (F.col("w") == F.col("term_b"))
            | (F.col("w") == F.col("term_c"))
        )
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(
                    F.when(F.col("w") == F.col(f"term_{x}"), 1).otherwise(0)
                ).alias(f"tf_{x}")
                for x in ("a", "b", "c")
            ]
        )
    )
    k1, k1p1 = float(_BM25_K1), float(_BM25_K1P1)
    b, onemb = float(_BM25_B), float(_BM25_1MB)
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")

    def term_score(x: str):
        tf = F.col(f"tf_{x}").cast("double")
        dfx = F.col(f"df_{x}").cast("double")
        idf = (F.col("n_docs").cast("double") - dfx + 0.5) / (dfx + 0.5)
        denom = tf + F.lit(k1) * (
            F.lit(onemb) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
        )
        return F.when(
            F.col(f"tf_{x}") > 0, idf * ((tf * k1p1) / denom)
        ).otherwise(F.lit(0.0))

    score = (term_score("a") + term_score("b")) + term_score("c")
    return (
        hits.join(dl, "doc_id")
        .crossJoin(F.broadcast(t))
        .select(
            "doc_id", "term_a", "term_b", "term_c",
            "tf_a", "tf_b", "tf_c", "dl",
            score.alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_BM25_TOPN)
    )


def _ngram_novelty_oracle() -> str:
    return f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
      WHERE len({_SQL_TOKS}) >= {_NGRAM}
    ), g AS (
      SELECT doc_id,
             list_distinct(list_transform(range(len(toks) - {_NGRAM - 1}),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                    || ' ' || toks[i+4] || ' ' || toks[i+5])) AS grams
      FROM t
    ), e AS (
      SELECT doc_id, unnest(grams) AS gram FROM g
    ), gdf AS (
      SELECT gram, COUNT(*) AS df FROM e GROUP BY gram
    ), per AS (
      SELECT e.doc_id,
             COUNT(*) AS n_grams,
             SUM(CASE WHEN gdf.df = 1 THEN 1 ELSE 0 END) AS n_unique
      FROM e JOIN gdf USING (gram) GROUP BY e.doc_id
    ), scored AS (
      SELECT doc_id,
             CAST(CAST(n_unique AS DOUBLE) / n_grams AS DECIMAL(14,9))
               AS novelty
      FROM per
    )
    SELECT d.source, COUNT(*) AS n_docs,
           {dd("SUM(novelty)")} / COUNT(*) AS avg_novelty,
           {dd("MIN(novelty)")} AS min_novelty,
           {dd("MAX(novelty)")} AS max_novelty
    FROM scored s JOIN documents d USING (doc_id)
    GROUP BY d.source
    """


@query("text_ngram_novelty", oracle=_ngram_novelty_oracle())
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n-gram novelty: the fraction of each document's
    distinct word 5-grams that occur in NO other document — high
    novelty marks original content, low novelty marks boilerplate and
    near-duplication pressure (the corpus-level complement of the
    pairwise dedup operators, and a memorization-risk proxy: a gram
    seen once is what a model can only have learned from that one
    document). Inverted-index shape: one shuffle keyed on gram to count
    document frequency, one keyed on doc_id to roll up — both
    partial-aggregable, nothing quadratic; the per-doc ratio is
    quantized to decimal so the per-source rollup is order-independent
    and engine-exact."""
    grams_expr = F.expr(
        f"array_distinct(transform(sequence(0, size(toks)-{_NGRAM}),"
        " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],"
        " toks[i+4])))"
    )
    e = (
        _spark_tokens_materialized(spark, sf_dir)
        .filter(F.size("toks") >= _NGRAM)
        .select("doc_id", F.explode(grams_expr).alias("gram"))
        .localCheckpoint(eager=False)
    )
    # r14 (guide §2.3): the old shape shuffled the RAW gram-string
    # stream a second time as the probe side of an e⨝gdf SMJ (the
    # df-agg's partial-aggregated exchange can't be reused for raw
    # rows). A df==1 gram has exactly ONE member doc, so MIN(doc_id)
    # inside the df aggregate identifies it — per-doc unique counts
    # then roll up from an int-only projection (no gram strings, no
    # join), and n_grams comes straight off e with a map-side partial
    # count. Both rollups hash-partition on doc_id with the same width,
    # so their join needs no further exchange. All aggregates stay
    # streaming (no collect_list) — a boilerplate gram shared by
    # millions of docs still reduces map-side, skew-safe.
    gdf = e.groupBy("gram").agg(
        F.count("*").alias("df"), F.min("doc_id").alias("d0")
    )
    n1 = (
        gdf.filter(F.col("df") == 1)
        .select(F.col("d0").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_unique_nn"))
    )
    ng = (
        e.select("doc_id")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_grams"))
    )
    per = ng.join(n1, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce(F.col("n_unique_nn"), F.lit(0).cast("bigint")).alias(
            "n_unique"
        ),
    )
    novelty = (
        F.col("n_unique").cast("double") / F.col("n_grams")
    ).cast("decimal(14,9)")
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        per.select("doc_id", novelty.alias("novelty"))
        .join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            (F.sum("novelty").cast("double") / F.count("*")).alias(
                "avg_novelty"
            ),
            F.min("novelty").cast("double").alias("min_novelty"),
            F.max("novelty").cast("double").alias("max_novelty"),
        )
    )
