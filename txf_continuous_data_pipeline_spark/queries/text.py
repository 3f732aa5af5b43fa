"""Documents-table extension queries: dedup + text analysis.

Split by family in r12 (verdict #7: the module had passed 5k lines):
text_common (shared helpers), text_dedup, text_tokenizers,
text_retrieval, text_curation. This module is the FACADE - it imports
every family module (which registers its queries on import), re-exports
every name so existing `from ...queries.text import X` call sites keep
working (tests, probes), and then REORDERS the registry's text-family
slice back to the exact pre-split registration order so the driver
rotation (queries/__init__.rotation_order ties break on registration
order) is byte-for-byte unchanged by the split -
tests/test_rotation.py pins the slice against _TEXT_ORDER.

Oracle SQL is generated from the same constants as the Spark operators
(marker lists, shingle width, MinHash lane constants) so the two sides
cannot drift. MinHash / SimHash / fingerprint queries are fully
value-checked: every hash-derived operator uses the engine-wide h60
family (first 15 hex chars of md5 as a bigint, operators/dedup.h60),
which DuckDB reproduces exactly - so signatures, band buckets, SimHash
fingerprints and rolling fingerprints all carry hash-level oracles
instead of rows-only checks."""

from __future__ import annotations

from . import text_common as _c
from . import text_dedup as _d
from . import text_tokenizers as _t
from . import text_retrieval as _r
from . import text_curation as _u
from .registry import REGISTRY

#: The pre-split registration order of every query this module owns.
#: The family modules register in module order on import; the loop
#: below restores THIS order inside the registry, so the rotation's
#: registration-order tie-break is invariant under the split.
_TEXT_ORDER = [
    "dedup_exact_groups",
    "dedup_exact_keep",
    "text_stats",
    "ngram_jaccard_pairs",
    "token_histogram_top20",
    "regex_top_words",
    "stratified_sample_docs",
    "training_data_curation",
    "minhash_neardup",
    "simhash_neardup",
    "doc_fingerprint",
    "neardup_groups",
    "neardup_keep",
    "tfidf_top_terms",
    "contamination_pairs",
    "token_counts",
    "pack_sequences",
    "mixture_sample",
    "training_mix_pack",
    "repetition_stats",
    "gopher_filter",
    "split_assign",
    "minhash_delta_dedup",
    "dup_span_stats",
    "exact_substr_stats",
    "dup_span_removal",
    "dup_span_removal_delta",
    "curation_pipeline",
    "quality_classifier",
    "pii_stats",
    "chunk_documents",
    "doc_bigram_logprob",
    "dsir_resample",
    "text_hash_embeddings",
    "bpe_pair_counts",
    "bpe_merge_rules",
    "bpe_token_counts",
    "byte_bpe_merge_rules",
    "byte_bpe_token_counts",
    "decontamination_report",
    "leakage_safe_split",
    "shard_manifest",
    "temperature_mixture",
    "late_interaction_topk",
    "pii_redact",
    "retrieve_rerank_topk",
    "kn_bigram_logprob",
    "line_dedup",
    "line_dedup_delta",
    "unigram_lm_vocab",
    "unigram_piece_counts",
    "bm25_topk",
    "hybrid_rrf_topk",
    "bm25_index_topk",
    "phrase_search",
    "quality_logreg_score",
    "langid_logreg_train",
    "wordpiece_merge_rules",
    "wordpiece_token_counts",
    "fuzzy_decontamination",
    "adaptive_quality_cutoff",
    "tfidf_hash_embeddings",
    "snapshot_diff",
    "perplexity_buckets",
    "entropy_stats",
    "source_datasheet",
    "soft_dedup_weights",
    "mixture_plan",
    "length_curriculum_shards",
    "bottomk_sample",
    "es_weighted_sample",
    "source_overlap_matrix",
    "zipf_fit",
    "jsonl_roundtrip",
    "url_canonical",
    "domain_blocklist_stats",
    "score_calibration_bins",
    "neardup_threshold_sweep",
    "quality_ensemble_deciles",
    "classifier_pr_curve",
    "web_pipeline_funnel",
    "tokenizer_fertility_by_source",
    "dup_cluster_size_histogram",
    "dedup_rate_by_source",
    # r12 additions append AFTER the pre-split slice (the analogue of
    # appending at module end before the split)
    "longest_dup_substrings",
    "dup_span_removal_keepfirst",
    "exact_decontamination",
]

for _n in _TEXT_ORDER:
    REGISTRY[_n] = REGISTRY.pop(_n)

# facade re-export: underscore helpers are part of the historical
# import surface (tests/probes import them from here), and `import *`
# would skip them - merge the family module dicts instead.
for _m in (_c, _d, _t, _r, _u):
    globals().update(
        {
            _k: _v
            for _k, _v in vars(_m).items()
            if not _k.startswith("__")
        }
    )
del _c, _d, _t, _r, _u, _m, _n
