"""Plan audit: physical-plan shape stats for the headline queries.

Prints a table of (parquet scans, exchanges, broadcast joins, nested
loops, codegen spans) per headline query and writes PLANS.md. The
numbers are the 100 TB survival story in concrete form — run after any
operator change to catch plan regressions the correctness gate can't
see (a query can stay bit-exact while silently gaining a rescan or
losing a broadcast).

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: queries whose plan shape is load-bearing (one per family + the
#: shapes plan tests assert)
AUDIT = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "broadcast_join_orders_by_region",
    "fk_orphan_check",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_incremental_index",
    "dedup_index_post_delete",
    "dedup_index_post_ttl",
    "dedup_semantic_clusters",
    "text_segment_dedup",
    "ann_bruteforce_topk",
    "ann_lsh_bucketed",
    "ann_ivf_topk",
    "ann_ivf_index_topk",
    "ann_ivf_retrain_topk",
    "ann_pq_topk",
    "contamination_ngram_overlap",
    "contamination_incremental_index",
    "contamination_index_post_delete",
    "incremental_ingest_funnel",
    "streaming_ingest_funnel",
    "incremental_ingest_funnel_ann",
    "streaming_ingest_funnel_ann",
    "incremental_ingest_funnel_ann_growing",
    "streaming_ingest_funnel_ann_growing",
    "streaming_ingest_funnel_maintained",
    "funnel_admitted_packing",
    "streaming_funnel_source_budget",
    "funnel_source_token_budget",
    "funnel_source_weighted_budget",
    "streaming_funnel_weighted_budget",
    "partitioned_ingest_funnel",
    "partitioned_funnel_source_budget",
    "streaming_funnel_archived_history",
    "funnel_source_report",
    "curation_pipeline_funnel",
    "sequence_packing",
    "pack_curriculum_order",
    "dedup_survivors_by_quality",
    "embedding_energy_retention",
    "text_ngram_novelty",
    "dedup_cross_modal",
    "streaming_funnel_late_data",
    "streaming_funnel_late_backfill",
    "funnel_source_adaptive_budget",
    "dedup_index_merge",
    "contamination_index_merge",
    "global_shuffle_shards",
    "training_mix_schedule",
    "corpus_split_decontaminated",
    "heavy_hitters_cms",
    "cohort_retention",
    "active_users_rolling",
    "funnel_user_conversion",
    "rolling_hour_peak_value",
    "merge_upsert_orders",
    "mv_incremental_refresh",
    "text_winnowing_fingerprint",
    "dedup_winnowing_overlap",
    "text_bigram_lm_score",
    "event_time_hopping_window",
    "stratified_sample_hash",
    "corr_quantity_price",
    "histogram_equi_depth",
    "ndv_hll_deterministic",
    "active_users_rolling_hll_det",
    "quantiles_hash_sample",
    "media_resize_thumbnails",
    "media_frame_sample",
    "exif_metadata_extract",
    "timeseries_gap_fill",
    "fuzzy_entity_match",
    "correlation_matrix_lineitem",
    "inverted_index_conjunctive",
    "timeseries_anomaly_zscore",
    "bm25_ranked_retrieval",
    "tfidf_top_terms",
    "pagerank_copurchase",
    "bfs_reachability_hops",
    "copurchase_pairs_topk",
    "trigram_similarity_names",
    "interval_concurrency_peak",
    "ewma_daily_value",
    "merge_cdc_with_deletes",
    "percentile_cont_quartiles",
    "event_transition_matrix",
    "funnel_time_to_convert",
    "session_window_native",
]


def audit(sf_dir: str) -> list[dict]:
    from postgresql_transfer_tool_spark.operators import registry
    from postgresql_transfer_tool_spark.plans import physical_plan
    from postgresql_transfer_tool_spark.session import get_spark

    registry.load_all()
    spark = get_spark("plan_audit")
    rows = []
    for name in AUDIT:
        fn = registry.QUERIES.get(name)
        if fn is None:
            continue
        plan = physical_plan(fn(spark, sf_dir))
        rows.append(
            {
                "query": name,
                "scans": len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)),
                "exchanges": plan.count("Exchange"),
                "broadcasts": plan.count("BroadcastHashJoin")
                + plan.count("BroadcastExchange"),
                "nested_loops": plan.count("BroadcastNestedLoop"),
            }
        )
    return rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rows = audit(sf_dir)
    header = "| query | scans | exchanges | broadcasts | nested loops |"
    sep = "|---|---|---|---|---|"
    lines = [header, sep]
    for r in rows:
        lines.append(
            f"| {r['query']} | {r['scans']} | {r['exchanges']} |"
            f" {r['broadcasts']} | {r['nested_loops']} |"
        )
    table = "\n".join(lines)
    print(table)
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write(
            "# PLANS — physical-plan shape audit (headline queries)\n\n"
            f"Generated by `tools/plan_audit.py` at `{sf_dir}`. Scans = parquet\n"
            "scans in the final plan (0 means the query reads memoized\n"
            "checkpoints built once per session). Nested loops appear only\n"
            "where a tiny broadcast side makes them intentional: non-equi\n"
            "joins against fixed query sets (ANN), the two-phase cumsum's\n"
            "parallelism-bounded offsets table, and cross joins against\n"
            "broadcast scalar/dimension relations (the gap-fill day spine,\n"
            "fuzzy-match probe x reference, one-row term/total tables) —\n"
            "never a data-x-data pairing; broadcasts\n"
            "mark dimension joins kept off the shuffle path. Since r5,\n"
            "broadcast decisions are RUNTIME-ONLY (static\n"
            "autoBroadcastJoinThreshold=-1, see session.tuning_conf), so\n"
            "the broadcast column counts only EXPLICIT hints — joins whose\n"
            "small side AQE broadcasts at runtime appear here as exchanges,\n"
            "which is why exchange counts read higher than r4. The only\n"
            "unpartitioned windows left in the engine run over inputs\n"
            "bounded BEFORE the window (rank_dense_rank_ntile: 200-row\n"
            "filtered dim; corpus_ngram_topk: the 20-row TakeOrdered\n"
            "result) — every unbounded relation ranks via\n"
            "TakeOrderedAndProject or a key-partitioned window\n"
            "(asserted in tests/test_plans.py). The keyed-cumsum\n"
            "rows (sequence_packing, funnel_*_packing/budget) read\n"
            "14-20 exchanges, but only ONE is data-sized (the\n"
            "(slice, key) window clustering) — the rest shuffle\n"
            "map-side-aggregated totals and the parallelism-bounded\n"
            "offsets branch (rows <= n_partitions + #keys); the range\n"
            "shuffle lives in the memoized checkpoint build. That\n"
            "trade removes the one-task-per-source WindowExec\n"
            "(SCALE.md round-12 skew table). See SCALE.md\n"
            "for the per-family analysis these numbers witness. (Whole-stage\n"
            "codegen only materializes in the POST-execution adaptive plan;\n"
            "it is asserted separately in tests/test_plans.py.)\n\n" + table + "\n"
        )


if __name__ == "__main__":
    main()
