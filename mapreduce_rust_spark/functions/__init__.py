from mapreduce_rust_spark.functions.text import (
    hash64,
    normalize_text,
    tokenize_whitespace,
    word_shingles,
)
from mapreduce_rust_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "hash64",
    "normalize_text",
    "tokenize_whitespace",
    "word_shingles",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
