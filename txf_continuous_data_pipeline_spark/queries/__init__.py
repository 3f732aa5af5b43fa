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
    # --- reference pipeline core (SURVEY §2) — 10. Always in-window:
    # these are the operators the reference itself ships.
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
    # --- r5 full-debt rotation (VERDICT r04 #1 generalized): EVERY
    # oracle-paired query without a green driver row in r1-r4 enters
    # the window this round — 29 entries — so no correctness debt
    # carries into r6. The 19 stable greens they displace each keep an
    # in-window or pytest sibling (mapping at the end of this list).
    # (a) carried from the r4-tail rotation, still unchecked — 10
    "pii_stats",
    "chunk_documents",
    "doc_bigram_logprob",
    "q4_order_priority",
    "q15_top_supplier",
    "q18_large_orders",
    "q22_idle_customers",
    "dup_span_stats",
    "quality_classifier",
    "distinct_users",
    # (b) late-r4 optimizer shapes + layout/skew queries — 12
    "q7_volume_shipping",
    "q10_returned_items",
    "q13_customer_distribution",
    "q16_parts_supplier_counts",
    "q19_disjunctive_revenue",
    "q21_waiting_supplier",
    "q8_market_share",
    "q11_important_stock",
    "q20_heavy_shippers",
    "unpivot_supplier_metrics",
    "heavy_hitter_users",
    "text_hash_embeddings",
    # (c) built this round — 7
    "fuzzy_part_name_pairs",
    "session_overlap_stats",
    "user_type_scd2",
    "orders_profile",
    "value_outliers",
    "orders_snapshot_diff",
    "bpe_pair_counts",
    # --- strongest multi-round-green flagships, one per operator
    # family — 11 (notably neardup_groups: the CC stage was REWRITTEN
    # this round and must re-earn a driver row)
    "text_stats",
    # overlap_triangle_count: built late in r5, never checked - takes
    # ngram_jaccard_pairs' slot (green r1-r4; the shared shingle
    # inverted-index family stays in-window via dup_span_stats, which
    # consumes the same persisted index).
    "overlap_triangle_count",
    "minhash_neardup",
    "neardup_groups",
    "semantic_dedup_keep",
    # q9 shape: built late in r5, never checked - takes
    # multimodal_features' slot (green r1-r4; the Arrow multimodal
    # plumbing stays in-window via image_phash_neardup, which drives
    # the REAL codec path end to end).
    "q9_product_profit_shape",
    "training_data_curation",
    # winsorized stats: built late in r5, never checked - takes
    # lsh_ann_pairs' slot (green r1-r4; the ANN family stays in-window
    # via ivf_topk + embedding_int8_quantize + the recall pytests).
    "winsorized_price_stats",
    "ivf_topk",
    # image_phash_neardup: built late in r5, never checked - takes
    # user_sessions' slot (green r1-r4; the gap-sessionization family
    # stays in-window via session_overlap_stats, which is built on the
    # same session_stats operator).
    "image_phash_neardup",
    # int8 quantization: built late in r5, never checked - takes
    # asof_join_config's slot (green r1-r4; the point-in-interval
    # family stays in-window via backadjust_rangejoin, and the DuckDB
    # native-ASOF oracle re-enters with the r6 rotation).
    "embedding_int8_quantize",
]
# Displaced stable greens -> their in-window/pytest siblings:
#   dedup_exact_groups -> exact-dup family via training_data_curation;
#   simhash_neardup/neardup_keep/minhash_delta_dedup -> banded dedup via
#     minhash_neardup + neardup_groups (+ delta pytest);
#   tfidf_top_terms -> explode+agg via bpe_pair_counts + text_stats;
#   knn_join_bruteforce -> exact cosine via lsh_ann_pairs/ivf_topk
#     (+ recall pytests);
#   q1/q3/rollup_acctbal/json_props_agg -> scan-agg/join/rollup/JSON via
#     the in-window TPC-H shapes (q7-q22) + heavy_hitter/unpivot;
#   config_with_prediction -> calendar ops via predict_next_contract +
#     settlement_schedule;
#   kmeans_assign -> fixed-centroid assignment via semantic_dedup_keep;
#   sliding_window_stats -> window family via session_overlap_stats +
#     user_sessions;
#   repetition_stats/gopher_filter -> textstats family via text_stats +
#     quality_classifier (+ differential pytests);
#   funnel_counts/cohort_retention/event_transitions -> event analytics
#     via user_sessions + user_type_scd2 + event_type_pagerank's
#     transition build (+ stateful-funnel pytest);
#   split_assign -> md5-threshold family via training_data_curation.
# After this round every oracle-paired query in the registry has had a
# driver row EXCEPT q2_min_supplier_shape, asof_next_config,
# conversion_pairs, user_count_min_sketch, customer_bloom_bits,
# user_hll_registers, frequent_part_pairs, ewma_close_daily,
# bar_max_drawdown, daily_click_buy_corr, part_association_rules,
# value_drift_psi, and documents_profile_by_source (added after the r5
# window filled; first r6 rotation candidates, rule: never-green
# enters ahead of multi-round-stable greens). The r6 rotation should also return
# displaced operator-family flagships to the window as slots allow. event_type_pagerank and the other rows-only entries
# (approx_distinct_users, kmeans_clusters) stay in the tail: their
# correctness lives in pytest differentials, and a window slot spent on
# a rows-only check verifies nothing the tail doesn't.


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
