"""Query registry — the single source of truth for the driver contract.

Every implemented operator registers (name → Spark callable) and, when the
semantics are ANSI-SQL-expressible, (name → DuckDB oracle SQL). The
``__spark_entry__`` module re-exports the registry as ``queries()`` /
``oracle_sql()``; the verification driver runs both sides at sf=0.01 and
compares row count + schema + order-insensitive value hash.

Rules enforced by convention here (SURVEY.md §5):
- every computed column is aliased identically in Spark and SQL;
- float results go through exact decimal aggregation (functions/exact.py)
  so hashes are engine- and order-independent;
- queries take (spark, sf_dir) and must not mutate session state other
  than temp views.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query, optionally with its DuckDB oracle SQL.

    ``oracle=None`` marks a genuinely non-SQL-expressible operator (the
    driver then records a weaker rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


#: Static tie-break ordering. Since round 4 the *primary* registry order
#: is computed automatically by :func:`driver_rounds` — queries are
#: sorted by "rounds since last driver CORRECTNESS row" (never-checked
#: first, then oldest-checked), so every newly added operator lands in
#: the driver's ~50-query verification prefix in the round it ships and
#: older rows get refreshed round-robin (VERDICT.md r3 "Next round" #2).
#: `_PRIORITY` only breaks ties between queries whose last driver row is
#: from the same round. The four round-3 gate-overflow queries
#: (fuzzy_entity_match, correlation_matrix_lineitem,
#: inverted_index_conjunctive, timeseries_anomaly_zscore) head the list
#: per VERDICT r3 #1 — with no CORRECTNESS row yet, the rotation also
#: sorts them into positions 1-4 on its own.
_PRIORITY = [
    # --- round-3 gate overflow: never driver-checked, go first ---
    "fuzzy_entity_match", "correlation_matrix_lineitem",
    "inverted_index_conjunctive", "timeseries_anomaly_zscore",
    # --- previously never-driver-checked (round-2 additions) ---
    "text_winnowing_fingerprint", "dedup_winnowing_overlap",
    "text_segment_dedup", "text_bigram_lm_score",
    "text_repetition_ratio", "text_pii_scrub",
    "dedup_semantic_clusters", "ann_pq_topk",
    # sampling — deterministic hash-rank sampler is the driver-facing one
    "stratified_sample_hash",
    # sketches + moment statistics (ANALYZE family)
    "supplier_part_overlap_kmv", "ndv_kmv_customers", "heavy_hitters_cms",
    "corr_quantity_price", "ols_quantity_price", "moments_value_by_type",
    "mcv_orders_columns", "histogram_equi_depth", "analyze_table_stats",
    # product analytics + windows
    "cohort_retention", "active_users_rolling", "funnel_user_conversion",
    "active_users_rolling_hll", "rolling_hour_peak_value",
    "window_value_functions", "event_time_hopping_window",
    # curation/corpus stragglers
    "sequence_packing", "domain_mix_weights", "region_nation_listagg",
    # transfer verification: checksum + keyed snapshot diff
    "table_content_checksums", "snapshot_diff_orders",
    # custom pandas + analytic stragglers
    "pandas_group_outliers", "unpivot_priority_counts", "grouping_sets_sql",
    "not_in_null_semantics",
    # tpch_full tail (never checked)
    "q2_min_cost_supplier", "q7_volume_shipping", "q8_market_share",
    "q9_product_type_profit", "q11_important_stock",
    "q13_customer_order_distribution", "q15_top_supplier",
    "q17_small_quantity_revenue", "q20_excess_availability_suppliers",
    # --- newly oracle-backed this round (was rows-only) ---
    "media_decode_features",
    # deterministic relational HLL — oracle-exact siblings of the
    # engine-native (rows-only) ndv_approx / active_users_rolling_hll
    "ndv_hll_deterministic", "active_users_rolling_hll_det",
    # multimodal resize + frame-sample (mapInPandas stages, content-
    # hash-checked oracles) — completes the X6 verb set
    "media_resize_thumbnails", "media_frame_sample",
    # bounded-state deterministic quantiles (sibling of quantiles_approx)
    "quantiles_hash_sample",
    # time-series repair (entity resolution / correlation / inverted
    # index / z-score anomaly moved to the head of this list)
    "timeseries_gap_fill",
    # --- previously green (r1/r2 rows); keep ordering for stability ---
    "dedup_exact", "dedup_exact_summary", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_clusters",
    "dedup_embedding_cosine", "dedup_survivors",
    "ann_bruteforce_topk", "ann_lsh_bucketed", "knn_label_vote",
    "text_token_stats", "text_quality_score", "text_language_id",
    "text_fingerprint", "text_bpe_token_count", "text_char_classes",
    "ndv_exact", "ndv_approx", "median_exact",
    "quantiles_approx", "stratified_sample", "histogram_fixed_buckets",
    "binary_column_plumbing", "embedding_column_stats",
    "json_schema_promotion", "sessionization_gap_30m",
    "q10_returned_items", "q12_priority_by_linestatus", "q14_promo_revenue_ratio",
    "q18_large_volume_customers", "q19_disjunctive_predicates",
    "q16_supplier_count_by_part_attrs", "q21_multi_supplier_orders",
    "q22_dormant_rich_customers",
    "curation_pipeline_funnel", "mv_incremental_refresh",
    "source_csv_roundtrip_orders", "source_json_roundtrip_embeddings",
    "source_orc_roundtrip_lineitem",
    "domain_mix_sample", "token_budget_selection", "embedding_label_centroids",
    "merge_upsert_orders", "merge_scd2_customer_balance",
    "corpus_ngram_topk", "tfidf_top_terms", "contamination_ngram_overlap",
    "ann_ivf_topk",
]


def driver_rounds() -> dict[str, int]:
    """Last round in which each query received a driver CORRECTNESS row.

    Scans the committed ``CORRECTNESS_r*.json`` files at the repo root
    (three directories up from this module). Presence of a row counts as
    "checked" regardless of outcome — rows-only sketches rotate on the
    same schedule as hash-verified queries. Queries absent from every
    file are simply missing from the returned dict.
    """
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        stem = os.path.basename(path)
        try:
            rnd = int(stem.split("_r")[1].split(".")[0])
            with open(path) as f:
                rows = json.load(f)
        except (ValueError, IndexError, OSError, json.JSONDecodeError):
            continue  # malformed file name/content — ignore, never crash import
        if not isinstance(rows, dict):
            continue
        for name in rows:
            last[name] = max(last.get(name, 0), rnd)
    return last


def gate_order(names: list[str]) -> list[str]:
    """Order queries for the driver's bounded verification prefix.

    Primary key: last driver-checked round ascending, with never-checked
    queries first (they MUST land inside the ~50-query prefix the round
    they ship). Secondary key: oracle-backed before rows-only — a hash
    row is the stronger signal, so when slots are scarce it wins.
    Tie-break: `_PRIORITY` position, then registration order — fully
    deterministic for a given set of CORRECTNESS files.
    """
    last = driver_rounds()
    prio = {n: i for i, n in enumerate(_PRIORITY)}
    base = {n: i for i, n in enumerate(names)}

    def key(n: str) -> tuple[int, int, int, int]:
        eff = last.get(n, -1)
        if eff < _RESHAPED.get(n, 0):
            eff = -1  # prior rows proved the OLD plan — re-prove now
        return (
            eff,
            0 if n in ORACLES else 1,
            prio.get(n, len(_PRIORITY)),
            base[n],
        )

    return sorted(names, key=key)


#: queries whose PHYSICAL PLAN was materially reshaped in a given round
#: (VERDICT r11 #7: a reshaped query MUST re-prove its oracle at the
#: next driver gate, but its old CORRECTNESS rows would rotate it to
#: the back). A driver row from BEFORE the recorded round verified the
#: old plan and does not count; once a row at/after that round lands,
#: normal rotation resumes. Append (name, round) on every reshape.
_RESHAPED = {
    # round 12: per-source windows rerouted through the keyed two-phase
    # prefix sum (functions/cumsum.keyed_running_sum)
    "sequence_packing": 12,
    "funnel_admitted_packing": 12,
    "funnel_source_token_budget": 12,
    "streaming_funnel_source_budget": 12,  # _apply_budget generalized
}


def load_all() -> None:
    """Import every operator module so registration side-effects run,
    then reorder the registry by driver-gate priority (never-checked
    first, then stalest CORRECTNESS row) — see :func:`gate_order`."""
    from . import (  # noqa: F401
        relational,
        joins,
        windows,
        setops,
        scalarfuncs,
        constraints,
        incremental,
        analytic,
        tpch_extra,
        tpch_full,
        dedup,
        dedup_index,
        contamination_index,
        ingest,
        similarity,
        ann_index,
        text,
        approx,
        multimodal,
        png_codec,
        custom_pandas,
        merge,
        corpus,
        curation,
        pipeline,
        matview,
        stats,
        semantic,
        product_analytics,
        diff,
        graph,
    )
    from ..sources import files  # noqa: F401  (CSV/JSON round-trip queries)

    ordered = gate_order(list(QUERIES))
    for reg in (QUERIES, ORACLES):
        snapshot = dict(reg)
        reg.clear()
        reg.update({n: snapshot[n] for n in ordered if n in snapshot})
