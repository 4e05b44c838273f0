from .dedup import (
    connected_components,
    connected_components_star,
    dedup_keep_first,
    drop_exact_duplicates,
    duplicate_clusters,
    minhash_dedup,
    minhash_near_dup_pairs,
    minhash_signatures,
    near_dedup,
    near_dup_clusters,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
    simhash_signatures,
)
from .evaluator import referenced_names, safe_eval
from .executor import ScanExecutor, run_scan
from .joins import (
    asof_join,
    salted_join,
    session_stats,
    session_stats_window,
    sessionize,
)
from .sampling import deterministic_sample, stratified_sample, train_val_test_split
from .similarity import (
    brute_force_topk,
    brute_force_topk_numpy,
    embedding_near_dup_pairs,
    exact_near_dup_pairs,
    ivf_topk,
    ivf_topk_deterministic,
    knn_join_lsh,
    lsh_topk,
)
from .text import (
    contamination_overlap,
    domain_stats,
    fingerprint,
    language_id,
    pii_counts,
    quality_score,
    repetition_stats,
    text_stats,
    url_domains,
    winnowing_fingerprints,
)

__all__ = [
    "safe_eval",
    "referenced_names",
    "ScanExecutor",
    "run_scan",
    # dedup
    "drop_exact_duplicates",
    "dedup_keep_first",
    "duplicate_clusters",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_near_dup_pairs",
    "minhash_dedup",
    "simhash_signatures",
    "simhash_near_dup_pairs",
    "connected_components",
    "connected_components_star",
    "near_dedup",
    "near_dup_clusters",
    # joins
    "asof_join",
    "salted_join",
    "sessionize",
    "session_stats",
    "session_stats_window",
    # sampling
    "deterministic_sample",
    "stratified_sample",
    "train_val_test_split",
    # similarity
    "brute_force_topk",
    "brute_force_topk_numpy",
    "exact_near_dup_pairs",
    "embedding_near_dup_pairs",
    "knn_join_lsh",
    "lsh_topk",
    "ivf_topk",
    "ivf_topk_deterministic",
    # text
    "text_stats",
    "quality_score",
    "language_id",
    "fingerprint",
    "winnowing_fingerprints",
    "repetition_stats",
    "pii_counts",
    "url_domains",
    "domain_stats",
    "contamination_overlap",
]
