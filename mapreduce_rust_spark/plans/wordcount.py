"""wordcount_e2e — the reference's one end-to-end query, as a pure
DataFrame plan (SURVEY.md §7 Phase 0).

Reference composition (``mr_app/src/client.rs:3-31`` +
``mr_app/src/server.rs:3-15``): read files → whitespace-split map
emitting (word, "1") → shuffle → per-key int-sum reduce → JSON out.

Spark plan: ``explode(tokenize) → groupBy(word).count()``. One scan,
one shuffle keyed on word, with map-side partial aggregation (the
combiner the reference never implemented, README.md:70) — shuffle
volume is O(distinct words) per partition, which is what makes this
hold at 100 TB. Tokenizer semantics are byte-exact with the reference:
case-sensitive, punctuation kept, empty tokens dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_rust_spark.functions.text import tokenize_whitespace


def wordcount(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Word frequencies over a text column → (word, cnt bigint)."""
    return (
        df.select(F.explode(tokenize_whitespace(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def wordcount_files(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Wordcount over raw text files — line-splitting scan, so huge
    files byte-range split across tasks (unlike the reference's
    file-granular ``slice()``, ``coordinator.rs:38-50``)."""
    lines = spark.read.text(paths)
    return wordcount(lines, "value")
