from mapreduce_rust_spark.operators.dedup import (
    exact_duplicate_groups,
    jaccard_pairs,
    lsh_candidate_pairs,
    lsh_verified_pairs,
    minhash_signatures,
    simhash_fingerprints,
    simhash_pairs,
    simhash_pairs_banded,
)
from mapreduce_rust_spark.operators.cleaning import (
    ngram_overlap_report,
    prefix_duplicate_groups,
    redact_pii,
    repetition_scores,
)
from mapreduce_rust_spark.operators.corpus import pack_shards, stratified_hash_sample
from mapreduce_rust_spark.operators.dedup import duplicated_spans
from mapreduce_rust_spark.operators.graph import connected_components, pagerank_fixed
from mapreduce_rust_spark.operators.profiling import (
    correlation_matrix,
    profile_numeric,
    quantile_bin_counts,
    value_histogram,
    zscore_outliers,
)
from mapreduce_rust_spark.operators.text_analysis import token_diversity
from mapreduce_rust_spark.operators.mapreduce import (
    MapReduceJob,
    cogroup_merge,
    flat_map,
    group_by_key,
    reduce_by_key,
    reduce_groups,
    union_merge,
)
from mapreduce_rust_spark.operators.similarity import (
    ivf_assign,
    ivf_centroids,
    kmeans_centroids,
    topk_bruteforce,
    topk_bucketed,
    topk_ivf,
)
from mapreduce_rust_spark.operators.skew import (
    salted_aggregate,
    salted_join,
    top_hot_keys,
)

__all__ = [
    "correlation_matrix",
    "duplicated_spans",
    "ngram_overlap_report",
    "pack_shards",
    "pagerank_fixed",
    "prefix_duplicate_groups",
    "profile_numeric",
    "quantile_bin_counts",
    "redact_pii",
    "repetition_scores",
    "stratified_hash_sample",
    "token_diversity",
    "value_histogram",
    "zscore_outliers",

    "MapReduceJob",
    "cogroup_merge",
    "connected_components",
    "exact_duplicate_groups",
    "flat_map",
    "group_by_key",
    "ivf_assign",
    "ivf_centroids",
    "jaccard_pairs",
    "kmeans_centroids",
    "lsh_candidate_pairs",
    "lsh_verified_pairs",
    "minhash_signatures",
    "reduce_by_key",
    "reduce_groups",
    "salted_aggregate",
    "salted_join",
    "simhash_fingerprints",
    "simhash_pairs",
    "simhash_pairs_banded",
    "top_hot_keys",
    "topk_bruteforce",
    "topk_bucketed",
    "topk_ivf",
    "union_merge",
]
