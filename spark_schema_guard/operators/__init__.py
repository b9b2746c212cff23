from .stats import (column_profile, domain_skew, heavy_hitters,
                    null_fractions, numeric_outliers, partition_verdicts)
from .uniqueness import duplicate_keys, uniqueness_report
from .referential import orphan_rows, referential_report
from .drift import (chi_square_by_unit, chi_square_drift, ks_by_unit,
                    ks_drift, psi_by_unit)
from .sampling import (assign_splits, cap_per_stratum, downsample,
                       importance_weights, nb_classifier_scores,
                       stratified_sample,
                       take_token_budget, temperature_mix)
from .urlfilter import blocked_urls, filter_blocked, url_features
from .urlnorm import duplicate_urls_normalized, normalize_url, url_host
from .bpe import (bpe_encode_counts, bpe_merges_frame, bpe_word_counts,
                  train_bpe)
from .decontam import embedding_decontaminate, ngram_decontaminate
from .extraction import (extracted_text, extraction_check,
                         extraction_report, html_is_utf8)
from .lmscore import (cross_entropy, perplexity_bucket, perplexity_cutoffs,
                      perplexity_score, train_ngram_lm)
from .semdedup import (semantic_cells, semantic_dedup, semantic_keep_best,
                       semantic_near_dups)
from .suggest import (constraint_drift, json_constraint_drift,
                      suggest_by_unit, suggest_constraints,
                      suggest_json_constraints, suggested_json_schema,
                      suggested_schema)

__all__ = [
    "column_profile",
    "domain_skew",
    "heavy_hitters",
    "null_fractions",
    "numeric_outliers",
    "partition_verdicts",
    "duplicate_keys",
    "uniqueness_report",
    "orphan_rows",
    "referential_report",
    "chi_square_by_unit",
    "chi_square_drift",
    "ks_by_unit",
    "ks_drift",
    "psi_by_unit",
    "assign_splits",
    "cap_per_stratum",
    "downsample",
    "importance_weights",
    "nb_classifier_scores",
    "stratified_sample",
    "take_token_budget",
    "temperature_mix",
    "duplicate_urls_normalized",
    "normalize_url",
    "url_host",
    "blocked_urls",
    "filter_blocked",
    "url_features",
    "ngram_decontaminate",
    "embedding_decontaminate",
    "bpe_word_counts",
    "train_bpe",
    "bpe_merges_frame",
    "bpe_encode_counts",
    "extracted_text",
    "extraction_check",
    "extraction_report",
    "html_is_utf8",
    "suggest_constraints",
    "suggested_schema",
    "constraint_drift",
    "suggest_json_constraints",
    "suggested_json_schema",
    "json_constraint_drift",
    "suggest_by_unit",
    "train_ngram_lm",
    "cross_entropy",
    "perplexity_bucket",
    "perplexity_cutoffs",
    "perplexity_score",
    "semantic_cells",
    "semantic_near_dups",
    "semantic_dedup",
    "semantic_keep_best",
]
