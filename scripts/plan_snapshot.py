"""Snapshot the physical-plan shape of the flagship queries into
PLANS.md - the per-query evidence behind SCALE.md's shuffle inventory.

For each query: Exchange / ReusedExchange / broadcast / join-strategy /
WholeStageCodegen / Python-eval node counts from the AQE initial plan,
plus scan pushdown info (PushedFilters / ReadSchema width) where a
parquet scan exists. Run after operator changes; diff PLANS.md to see
plan drift the pin tests don't cover.

Usage: python scripts/plan_snapshot.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from txf_continuous_data_pipeline_spark.queries import REGISTRY, queries
from txf_continuous_data_pipeline_spark.session import get_spark

FLAGSHIPS = [
    "bar_pipeline_5m",
    "session_ohlcv",
    "backadjust_rangejoin",
    "asof_join_config",
    "q5_region_revenue",
    "q15_top_supplier",
    "q18_large_orders",
    "user_sessions",
    "funnel_counts",
    "cohort_retention",
    "dedup_exact_groups",
    "minhash_neardup",
    "minhash_delta_dedup",
    "simhash_neardup",
    "ngram_jaccard_pairs",
    "neardup_groups",
    "semantic_dedup_keep",
    "repetition_stats",
    "gopher_filter",
    "text_stats",
    "tfidf_top_terms",
    "lsh_ann_pairs",
    "ivf_topk",
    "kmeans_assign",
    "multimodal_features",
    # r5 window entrants + new capabilities
    "q4_order_priority",
    "q22_idle_customers",
    "dup_span_stats",
    "quality_classifier",
    "distinct_users",
    "embedding_neardup_pairs",
    "pii_stats",
    "chunk_documents",
    "doc_bigram_logprob",
    # late-r5 optimizer shapes
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q11_important_stock",
    "q13_customer_distribution",
    "q16_parts_supplier_counts",
    "q19_disjunctive_revenue",
    "q20_heavy_shippers",
    "q21_waiting_supplier",
    # r5 linkage / profiling / text additions
    "fuzzy_part_name_pairs",
    "session_overlap_stats",
    "user_type_scd2",
    "orders_profile",
    "value_outliers",
    "orders_snapshot_diff",
    "orders_expectations",
    "bpe_pair_counts",
    "embedding_int8_quantize",
    "q9_product_profit_shape",
    "winsorized_price_stats",
    "event_type_pagerank",
    "overlap_triangle_count",
    "image_phash_neardup",
    "q2_min_supplier_shape",
    "asof_next_config",
    "conversion_pairs",
    "user_count_min_sketch",
    "customer_bloom_bits",
    "user_hll_registers",
    "frequent_part_pairs",
    "ewma_close_daily",
    "bar_max_drawdown",
    "daily_click_buy_corr",
    "part_association_rules",
    # r7 additions
    "dup_span_removal",
    "pq_adc_topk_qtable",
    "ivfpq_topk",
    "bpe_token_counts",
    "text_hash_embeddings",
    "curation_pipeline",
    "dup_span_removal_delta",
    "ivfpq_index_topk",
    "ivfpq_residual_topk",
    "audio_fingerprint_neardup",
    # r8 additions
    "hard_negative_mining",
    "triplet_mining",
    "temperature_mixture",
    "matryoshka_recall",
    "embedding_outliers",
    "embedding_curation_pipeline",
    "zorder_layout",
    "late_interaction_topk",
    "retrieve_rerank_topk",
    "pii_redact",
    "skew_salted_heavy_users",
    "funnel_step_times",
    "cms_user_estimates",
    "kn_bigram_logprob",
    # r9 additions
    "video_phash_neardup",
    "line_dedup",
    "line_dedup_delta",
    "bm25_topk",
    "hybrid_rrf_topk",
    "decontamination_report",
    "phrase_search",
    "quality_logreg_score",
    "fuzzy_decontamination",
    "adaptive_quality_cutoff",
    "tfidf_hash_embeddings",
    "jl_projection",
    "snapshot_diff",
    "perplexity_buckets",
    "entropy_stats",
    "source_datasheet",
    # late-r9: curation planners + governance
    "semantic_decontamination",
    "soft_dedup_weights",
    "mixture_plan",
    "length_curriculum_shards",
    "k_anonymity_audit",
    "bottomk_sample",
    "es_weighted_sample",
    "kmv_distinct_users",
    "source_overlap_matrix",
    "zipf_fit",
    "jsonl_roundtrip",
    "url_canonical",
    "domain_blocklist_stats",
    "knn_label_propagation",
    "score_calibration_bins",
    "neardup_threshold_sweep",
    "quality_ensemble_deciles",
    "classifier_pr_curve",
    "web_pipeline_funnel",
    "embedding_drift_report",
    "training_mix_pack",
    "pca_variance_explained",
    "kmeans_clusters",
    "event_type_pagerank",
    # r10/r11 reference-domain flagships
    "missing_bars_report",
    "session_gap_stats",
    "intraday_volume_profile",
    "continuous_returns",
    "session_realized_vol",
    "restate_impact_report",
    "bpe_merge_rules",
    "wordpiece_merge_rules",
    "session_vwap",
    "forward_adjusted_series",
    "roll_calendar",
    "ratio_adjusted_series",
    # late-r11 session-risk family + corpus datasheets
    "session_atr",
    "overnight_gap_returns",
    "volume_anomaly_sessions",
    "price_limit_days",
    "expiry_effect_report",
    "volume_clock_bars",
    "order_flow_imbalance",
    "tick_imbalance_bars",
    "session_liquidity_metrics",
    "dollar_clock_bars",
    "tokenizer_fertility_by_source",
    "dup_cluster_size_histogram",
    "dedup_rate_by_source",
    # r12: suffix grain + calendar gate + checkable quantile sketch
    "exact_substr_stats",
    "longest_dup_substrings",
    "expected_session_counts",
    "price_quantile_sketch",
    # r13: shared-frame decontamination arm + ORC source
    "exact_decontamination",
    "orc_roundtrip",
]


def describe(plan: str) -> dict:
    counts = {
        # \bExchange\b does not match inside ReusedExchange (no word
        # boundary after 'd'), so no subtraction needed
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "reused": plan.count("ReusedExchange"),
        "bcast_joins": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        "smj": plan.count("SortMergeJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "python": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
    }
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    counts["pushed_filters"] = (
        "yes" if pushed and pushed.group(1).strip() else "-"
    )
    schema = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    counts["scan_cols"] = (
        len([c for c in schema.group(1).split(",") if c]) if schema else 0
    )
    return counts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan_snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    lines = [
        "# PLANS — flagship physical-plan shapes",
        "",
        f"Generated by `scripts/plan_snapshot.py` at {sf_dir} (AQE initial",
        "plans). Exchange = fact-bearing shuffles (ReusedExchange listed",
        "separately); `python` counts Arrow-stage OCCURRENCES in the",
        "printed plan (a cached/checkpointed stage can appear per join",
        "side pre-execution but computes once); `scan_cols` shows column",
        "pruning reaching the parquet scan (0 = the input is a cached or",
        "checkpointed frame, no parquet scan in-plan). CartesianProduct",
        "must stay 0 everywhere except the documented exact-oracle cross",
        "joins.",
        "",
        "| query | exchanges | reused | bcast | smj | cartesian |"
        " python | pushed | scan cols |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name in FLAGSHIPS:
        if name not in REGISTRY:
            continue
        plan = (
            qs[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        d = describe(plan)
        lines.append(
            f"| `{name}` | {d['exchanges']} | {d['reused']} |"
            f" {d['bcast_joins']} | {d['smj']} | {d['cartesian']} |"
            f" {d['python']} | {d['pushed_filters']} |"
            f" {d['scan_cols']} |"
        )
    out = "\n".join(lines) + "\n"
    with open("/root/repo/PLANS.md", "w") as f:
        f.write(out)
    print(out)


if __name__ == "__main__":
    main()
