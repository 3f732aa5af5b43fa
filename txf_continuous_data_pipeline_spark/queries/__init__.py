"""Driver-contract query registry.

Each registered entry: name -> (spark_fn, oracle_sql | None).
spark_fn(spark, sf_dir) returns a DataFrame built with the engine's
operators; oracle_sql is the equivalent ANSI SQL DuckDB runs on the same
parquet views. Column names (and rounded float values) must match - the
driver sorts columns by name and hashes values.

Submodules register themselves on import:
  timeseries   the reference pipeline's operators (SURVEY.md section 2)
  relational   star-schema joins/aggs/windows/set-ops (section 2.9 ext)
  text         documents-table dedup + text analysis extensions
  similarity   embeddings-table similarity search extensions
"""

from __future__ import annotations

from .registry import REGISTRY, q


# The external driver verifies the FIRST 50 entries of queries() against
# the DuckDB oracle; anything later gets no correctness row at all
# (round-1 lesson: the whole similarity suite fell outside the window).
# _PRIORITY pins the window deliberately: the reference pipeline first,
# then the LLM-data-pipeline flagships (text/dedup/similarity/curation),
# then the strongest relational queries. The tail (after 50) is
# exclusively round-1-green near-twins of in-window queries
# (set-ops, pivot/cube variants, scalar TPC-H singles) whose operators
# remain covered by an in-window or pytest sibling.
_PRIORITY = [
    # reference pipeline core (SURVEY §2) — 10
    "ohlcv_5m",
    "session_labels",
    "session_counts",
    "completeness_gate",
    "settle_config_file",
    "backadjust_rangejoin",
    "bar_pipeline_5m",
    "bar_pipeline_60m",
    "predict_next_contract",
    "settlement_schedule",
    # text / dedup / curation flagships — 12
    "text_stats",
    # r5 late swap: pii_stats (built this round, never driver-green)
    # takes mixture_sample's slot per the rotation rule; the
    # md5-threshold sampling family stays in-window via split_assign
    # and training_data_curation.
    "pii_stats",
    "ngram_jaccard_pairs",
    "training_data_curation",
    "dedup_exact_groups",
    "minhash_neardup",
    "simhash_neardup",
    "neardup_groups",
    "neardup_keep",
    "tfidf_top_terms",
    "multimodal_features",
    # r5 late swap #2: chunk_documents (built this round, never
    # driver-green) takes contamination_pairs' slot; the shared
    # shingle-inverted-index family stays in-window via
    # ngram_jaccard_pairs (and the containment pytest).
    "chunk_documents",
    # similarity search suite — 3
    "knn_join_bruteforce",
    "lsh_ann_pairs",
    "ivf_topk",
    # relational/window/JSON core — fills to 50. Dropped to the tail to
    # make room for the four extension flagships above (neardup_keep,
    # tfidf_top_terms, multimodal_features, contamination_pairs):
    # r01-green near-twins whose operator family stays represented
    # in-window (running_total -> the cum-sum windows in
    # user_sessions/curation; grouping_sets -> rollup_acctbal;
    # rolling_7d -> the window family via order_price_lag_quartile;
    # argmax_nation -> min_by/max_by via the OHLCV queries).
    "q1_pricing_summary",
    "q3_shipping_priority",
    "rollup_acctbal",
    "json_props_agg",
    "asof_join_config",
    "user_sessions",
    "config_with_prediction",
    # round-3 rotation (VERDICT r02 #1): the six queries that never had
    # a green driver row, swapped in for six multi-round-stable greens
    # (session_split_day/night, watermark_filter, settle_config_derived,
    # q5_region_revenue, label_centroids) whose operator families remain
    # covered in-window (F3/F4 via session_labels + bar pipelines, F5
    # via the streaming pytests, A7 via backadjust_rangejoin, joins via
    # q3/q12, centroids via kmeans_clusters).
    # r4 (VERDICT r03 #4): kmeans_clusters' slot can never go green (its
    # iterative fixpoint has sql=None -> permanent no_oracle). Its
    # assignment step as a fully oracle-checked query takes the slot;
    # the trainer stays in the tail with its pytest differential.
    "kmeans_assign",
    "sliding_window_stats",
    # r5 late swap #3: doc_bigram_logprob (built this round, never
    # driver-green) takes doc_fingerprint's slot; the h60 rolling-hash
    # family stays exercised by every minhash/simhash/jaccard query
    # in-window plus the fingerprint pytests.
    "doc_bigram_logprob",
    # r4 rotation: the three new never-checked extension queries take
    # the slots of three single-round-green near-twins whose operator
    # families stay covered in-window (token_counts -> text_stats +
    # gopher_filter's n_tokens; json_struct_agg -> json_props_agg;
    # embedding_norms -> the cosine/centroid family).
    "repetition_stats",
    "gopher_filter",
    "semantic_dedup_keep",
    # r4 second rotation: the six operators built later in the round,
    # never driver-checked, in place of six multi-round-stable greens
    # whose families keep an in-window or pytest sibling:
    #   token_histogram_top20 -> explode+count via tfidf_top_terms
    #   stratified_sample_docs -> md5-threshold sampling via
    #     mixture_sample (and split_assign itself)
    #   embedding_neardup_pairs -> blocked cosine pairs via
    #     semantic_dedup_keep + lsh_ann_pairs
    #   q12_late_shipments -> join+conditional agg via q3 + asof
    #   topk_orders_per_priority -> rank windows via knn_join's rn
    #   group_having -> agg+filter via q1 + session_counts
    "funnel_counts",
    "cohort_retention",
    "event_transitions",
    "split_assign",
    "minhash_delta_dedup",
    # r5 rotation (VERDICT r04 #1): the six finished-but-never-driver-
    # checked queries plus the new exact distinct_users twin (VERDICT
    # r04 #4) take the slots of seven multi-round-stable greens whose
    # operator families keep an in-window or pytest sibling:
    #   ohlcv_60m_offset45 -> A2 phase-offset resample via
    #     bar_pipeline_60m (same operator, end-to-end)
    #   bar_pipeline_5m_cfgfile -> S3 config scan via settle_config_file
    #     + pipeline via bar_pipeline_5m
    #   session_ohlcv -> O2 union D+N via bar_pipeline_60m
    #   pack_sequences -> per-shard running windows via
    #     training_data_curation + tests/test_packing.py
    #   regex_top_words -> regex tokenize/explode via tfidf_top_terms
    #   cosine_topk_bruteforce -> brute-force cosine via
    #     knn_join_bruteforce
    #   ivf_topk_probe2 -> ivf_topk + the recall-monotonicity pytest
    "q4_order_priority",
    "q15_top_supplier",
    "q18_large_orders",
    "q22_idle_customers",
    "dup_span_stats",
    "quality_classifier",
    "distinct_users",
]
# Displaced to the tail: q6_forecast_revenue (scalar filtered-sum
# single; family in-window via q12_late_shipments) plus the
# rotated-out stable greens listed above.
# NEXT ROTATION (rule: never-green queries enter ahead of multi-round
# stable greens): the six late-r5 optimizer shapes q7_volume_shipping,
# q10_returned_items, q13_customer_distribution,
# q16_parts_supplier_counts, q19_disjunctive_revenue,
# q21_waiting_supplier, plus q8_market_share, q11_important_stock,
# q20_heavy_shippers, unpivot_supplier_metrics, heavy_hitter_users,
# text_hash_embeddings
# (all oracle-ready, sf0.01-green locally) have no driver row yet -
# swap them in next round for multi-round-stable greens with
# in-window siblings.


def _ordered():
    ordered = {}
    for name in _PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, entry in REGISTRY.items():
        if name not in ordered:
            ordered[name] = entry
    return ordered


def queries():
    return {name: fn for name, (fn, _) in _ordered().items()}


def oracle_sql():
    return {
        name: sql for name, (_, sql) in _ordered().items() if sql is not None
    }


from . import timeseries  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import linkage  # noqa: E402,F401
