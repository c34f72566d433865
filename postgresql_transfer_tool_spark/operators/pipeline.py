"""The composed LLM-data curation pipeline — every stage in one pass.

Individual operators (dedup, quality scoring, decontamination, domain
sampling, token budgeting) are each oracle-checked on their own; this
module chains them the way a production corpus build actually runs them
and reports the funnel — documents and tokens surviving each stage:

    raw → exact-dedup → quality-filter → decontaminate → domain-sample
        → token-budget

Why a composed operator and not five queries: the expensive part of
every stage is the same tokenize/hash scan of the corpus. Run as five
independent jobs at 100 TB, the corpus is read five times; composed,
the per-document features (token count, content hash, quality score,
5-gram set, sampling bucket) are computed in ONE map-side pass,
materialized once, and every stage afterwards is a cheap filter or a
broadcast anti-join over that feature relation. The funnel output is
the shape a curation run actually publishes (data cards / run reports).

Stage semantics (each cumulative on the previous):
- dedup: keep the lowest doc_id per exact content hash (md5).
- quality: Gopher-style heuristic (stopword ratio + lexical diversity
  + length bonus) must clear a threshold.
- decontaminate: drop any document sharing a distinct word-5-gram with
  the held-out benchmark split (doc_id % 50 == 0); bench docs
  themselves leave the training pool here too.
- sample: deterministic md5-bucket domain mix (reproducible corpus —
  same rows selected at any parallelism, any engine).
- budget: rank by quality (desc, doc_id tiebreak), take documents until
  the global token budget fills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import balance_scan, load_table
from ..functions.cumsum import running_sum
from .corpus import _NGRAM, _SQL_TOKS
from .curation import _SQL_BUCKET, _spark_bucket
from .registry import query
from .text import EN_STOP, _sql_list

#: quality threshold a document must clear (stage 3); the fixture's
#: quality distribution spans ~[0.8, 2.2], so 1.2 is a real cut
_QUALITY_MIN = "1.2"
#: global token budget for the final selection stage
_PIPE_BUDGET = 15_000
#: held-out benchmark split (same convention as corpus.py)
_BENCH_MOD = 50

_SQL_QUALITY = f"""CAST(
  CAST(len(list_filter(toks, w -> list_contains([{_sql_list(EN_STOP)}], w)))
       AS DOUBLE) / ntoks
  + CAST(len(list_distinct(toks)) AS DOUBLE) / ntoks
  + CAST(CASE WHEN ntoks >= 20 AND ntoks <= 200 THEN 1 ELSE 0 END AS DOUBLE)
  AS DECIMAL(14,6))"""

_SQL_GRAMS = f"""CASE WHEN ntoks >= {_NGRAM} THEN
  list_distinct(list_transform(range(ntoks - {_NGRAM - 1}),
    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
         || ' ' || toks[i+4] || ' ' || toks[i+5]))
  ELSE CAST([] AS VARCHAR[]) END"""


@query(
    "curation_pipeline_funnel",
    oracle=f"""
    WITH t0 AS (
      SELECT doc_id, source, text, {_SQL_TOKS} AS toks,
             len({_SQL_TOKS}) AS ntoks,
             {_SQL_BUCKET} AS bucket,
             (CAST(substr(source, 4) AS BIGINT) % 4 + 1) * 25 AS rate_pct
      FROM documents WHERE len(trim(text)) > 0
    ),
    feat AS (
      SELECT doc_id, source, ntoks, bucket, rate_pct,
             md5(text) AS h,
             {_SQL_QUALITY} AS quality,
             {_SQL_GRAMS} AS grams
      FROM t0
    ),
    dedup AS (
      SELECT * FROM (
        SELECT f.*, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn
        FROM feat f
      ) WHERE rn = 1
    ),
    qual AS (
      SELECT * FROM dedup WHERE quality >= {_QUALITY_MIN}
    ),
    bench AS (
      SELECT DISTINCT unnest(grams) AS gram FROM feat
      WHERE doc_id % {_BENCH_MOD} = 0
    ),
    contaminated AS (
      SELECT DISTINCT tg.doc_id
      FROM (SELECT doc_id, unnest(grams) AS gram FROM qual) tg
      JOIN bench b ON tg.gram = b.gram
    ),
    clean AS (
      SELECT q.* FROM qual q LEFT JOIN contaminated c USING (doc_id)
      WHERE q.doc_id % {_BENCH_MOD} <> 0 AND c.doc_id IS NULL
    ),
    sampled AS (
      SELECT * FROM clean WHERE bucket < rate_pct
    ),
    budgeted AS (
      SELECT * FROM (
        SELECT s.*,
               CAST(SUM(ntoks) OVER (ORDER BY quality DESC, doc_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS cum_tokens
        FROM sampled s
      ) WHERE cum_tokens <= {_PIPE_BUDGET}
    )
    SELECT stage, n_docs, n_tokens FROM (
      SELECT 'a_raw' AS stage, COUNT(*) AS n_docs,
             CAST(SUM(ntoks) AS BIGINT) AS n_tokens FROM feat
      UNION ALL
      SELECT 'b_dedup', COUNT(*), CAST(SUM(ntoks) AS BIGINT) FROM dedup
      UNION ALL
      SELECT 'c_quality', COUNT(*), CAST(SUM(ntoks) AS BIGINT) FROM qual
      UNION ALL
      SELECT 'd_decontaminated', COUNT(*), CAST(SUM(ntoks) AS BIGINT) FROM clean
      UNION ALL
      SELECT 'e_sampled', COUNT(*), CAST(SUM(ntoks) AS BIGINT) FROM sampled
      UNION ALL
      SELECT 'f_budgeted', COUNT(*), CAST(SUM(ntoks) AS BIGINT) FROM budgeted
    )
    """,
)
def curation_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One corpus scan computes every per-document feature; stage
    membership becomes per-doc boolean FLAGS (windows + one broadcast
    join — stages never re-aggregate the relation separately); ONE
    aggregation emits all six funnel stages via stack().

    Stage-flag algebra notes:
    - contamination is doc-intrinsic (shares a 5-gram with the bench
      split), so the flag can be computed once for every doc;
    - the budget cumsum runs over ALL docs ordered (quality desc,
      doc_id) with non-sampled docs contributing 0 tokens — at every
      sampled row it equals the oracle's cumsum over sampled rows only,
      so the <= budget cut selects identical documents.
    """
    # r14 (guide §2.3/§2.5, the contamination_ngram_overlap fix): balance
    # BEFORE the feature build, so (a) the exchange carries raw text, not
    # the ~5× heavier gram arrays, and (b) tokenize/md5/gram compute runs
    # at full width instead of fused into the single-row-group scan task.
    # balance_scan is a no-op once the layout itself is parallel.
    docs = balance_scan(
        spark,
        load_table(spark, sf_dir, "documents").filter(
            F.length(F.trim("text")) > 0
        ),
        sf_dir,
        "documents",
    )
    toks = F.split(F.trim("text"), r"\s+")
    ntoks = F.size("toks")
    stop_arr = F.array(*[F.lit(w) for w in EN_STOP])
    quality = (
        F.size(F.filter("toks", lambda w: F.array_contains(stop_arr, w))).cast(
            "double"
        )
        / ntoks
        + F.size(F.array_distinct("toks")).cast("double") / ntoks
        + F.when((ntoks >= 20) & (ntoks <= 200), 1).otherwise(0).cast("double")
    ).cast("decimal(14,6)")
    grams = F.when(
        ntoks >= _NGRAM,
        F.expr(
            f"array_distinct(transform(sequence(0, size(toks)-{_NGRAM}),"
            " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],"
            " toks[i+4])))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    rate = (F.substring("source", 4, 10).cast("bigint") % 4 + 1) * 25

    # ONE pass: every stage's feature, then materialize (the relation is
    # tiny relative to the corpus text it summarizes); the balancing
    # exchange sits BELOW this projection (see balance_scan above).
    feat = (
        docs.withColumn("toks", toks)
        .select(
            "doc_id",
            "source",
            ntoks.alias("ntoks"),
            _spark_bucket().alias("bucket"),
            rate.alias("rate_pct"),
            F.md5("text").alias("h"),
            quality.alias("quality"),
            grams.alias("grams"),
        )
        .localCheckpoint(eager=True)
    )

    bench = (
        feat.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select(F.explode("grams").alias("bgram"))
        .distinct()
    )
    contaminated = (
        feat.select("doc_id", F.explode("grams").alias("gram"))
        .join(F.broadcast(bench), F.col("gram") == F.col("bgram"))
        .select("doc_id")
        .distinct()
        .withColumn("is_contam", F.lit(True))
    )

    wdedup = Window.partitionBy("h").orderBy("doc_id")
    staged = (
        feat.join(F.broadcast(contaminated), "doc_id", "left")
        .withColumn("is_dedup", F.row_number().over(wdedup) == 1)
        .withColumn(
            "is_qual", F.col("is_dedup") & (F.col("quality") >= _QUALITY_MIN)
        )
        .withColumn(
            "is_clean",
            F.col("is_qual")
            & (F.col("doc_id") % _BENCH_MOD != 0)
            & ~F.coalesce("is_contam", F.lit(False)),
        )
        .withColumn(
            "is_sampled", F.col("is_clean") & (F.col("bucket") < F.col("rate_pct"))
        )
    )
    # Budget stage: two-phase parallel prefix sum (functions/cumsum.py)
    # over (quality desc, doc_id) — non-sampled docs contribute 0 tokens,
    # so at every sampled row the running sum equals the oracle's cumsum
    # over sampled rows only; no serial WindowExec task at any scale.
    # The order is expressed as (-quality ASC, doc_id): quality is a
    # non-null exact decimal, so negation is order-reversing and the
    # total order is identical to (quality DESC, doc_id) — but the
    # ascending-numeric form is eligible for the cumsum's content-
    # derived fast path (guide §2.4), which replaces the
    # repartitionByRange fallback's full-data range exchange with a
    # deterministic slice expression: one fewer corpus-sized shuffle.
    flagged = running_sum(
        staged.withColumn("_negq", -F.col("quality")),
        [F.col("_negq"), F.col("doc_id")],
        F.when(F.col("is_sampled"), F.col("ntoks")).otherwise(0).cast("bigint"),
        "cum_tokens",
    ).drop("_negq").withColumn(
        "is_budgeted",
        F.col("is_sampled") & (F.col("cum_tokens") <= _PIPE_BUDGET),
    )

    def n_and_toks(flag: str) -> list[F.Column]:
        c = F.col(flag).cast("long")
        return [
            F.sum(c).alias(f"n_{flag}"),
            F.sum(c * F.col("ntoks")).alias(f"t_{flag}"),
        ]

    one = flagged.agg(
        F.count("*").alias("n_raw"),
        F.sum("ntoks").alias("t_raw"),
        *n_and_toks("is_dedup"),
        *n_and_toks("is_qual"),
        *n_and_toks("is_clean"),
        *n_and_toks("is_sampled"),
        *n_and_toks("is_budgeted"),
    )
    return one.select(
        F.expr(
            """stack(6,
              'a_raw', n_raw, t_raw,
              'b_dedup', n_is_dedup, t_is_dedup,
              'c_quality', n_is_qual, t_is_qual,
              'd_decontaminated', n_is_clean, t_is_clean,
              'e_sampled', n_is_sampled, t_is_sampled,
              'f_budgeted', n_is_budgeted, t_is_budgeted
            ) AS (stage, n_docs, n_tokens)"""
        )
    )
