from mapreduce_rust_spark.functions.numeric import fround, fround_sql
from mapreduce_rust_spark.functions.text import (
    bpe_ish_tokens,
    hash64,
    normalize_text,
    tokenize_whitespace,
    word_shingles,
)
from mapreduce_rust_spark.functions.vectors import (
    cosine_from_norms,
    cosine_similarity,
    dot,
    l2_norm,
)

__all__ = [
    "bpe_ish_tokens",
    "cosine_from_norms",
    "cosine_similarity",
    "dot",
    "fround",
    "fround_sql",
    "hash64",
    "l2_norm",
    "normalize_text",
    "tokenize_whitespace",
    "word_shingles",
]
