"""Corpus cleaning operators: PII redaction, repetition scoring, and
prefix (boilerplate) dedup — the scrub-before-training passes of an
LLM data pipeline.

The reference has no text processing beyond whitespace word count
(``mr_app/src/client.rs:3-21``); this whole family is engine
extension surface (SURVEY.md §2c). Every operator is pure
``pyspark.sql.functions`` — regex/array work stays JVM-side inside
whole-stage codegen, nothing drops to Python.

Scale notes:

* ``text_pii_redact`` — embarrassingly parallel map over documents:
  NO shuffle at all; the regex scan fuses with the parquet read, so
  at 100 TB the cost is exactly one pass over the text bytes.
* ``text_repetition`` — token/bigram statistics via array expressions
  per row (zip_with over the token array — no per-token explode row
  blowup for the n-gram construction), one explode + aggregation for
  the bigram frequency profile keyed by (doc_id, bigram): high
  cardinality, even spread.
* ``dedup_prefix`` — near-boilerplate detection by shared 64-char
  prefix: one hash aggregation on the prefix hash. The 64-byte
  prefix (not the full text) is what shuffles, so the shuffle volume
  is ~64 B/doc regardless of document size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_rust_spark.functions.numeric import fround, fround_sql
from mapreduce_rust_spark.functions.text import tokenize_whitespace
from mapreduce_rust_spark.sources.tables import fan_out, load_table

ORACLE: dict[str, str] = {}

# Patterns restricted to syntax Java regex (Spark) and RE2 (DuckDB)
# interpret identically: character classes, bounded repeats, literals.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1-555-[0-9]{4}"


def redact_pii(df: DataFrame, text_col: str) -> DataFrame:
    """Append ``{text_col}_redacted``, ``n_emails``, ``n_phones``:
    regex-scrubbed text plus per-doc match counts. Single map pass."""
    c = F.col(text_col)
    return (
        df.withColumn("n_emails", F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), 0)))
        .withColumn("n_phones", F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), 0)))
        .withColumn(
            f"{text_col}_redacted",
            F.regexp_replace(
                F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
            ),
        )
    )


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over documents. The synthetic corpus carries no real
    PII, so a deterministic email+phone per doc is injected first
    (same expression in the oracle) — the check then proves the
    detection counts AND the redacted bytes (via md5) agree."""
    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id"),
            F.lit("@mail.example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    red = redact_pii(docs, "text")
    return red.select(
        "doc_id", "n_emails", "n_phones", F.md5("text_redacted").alias("redacted_hash")
    )


ORACLE["text_pii_redact"] = rf"""
WITH synth AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@mail.example.com or +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phones,
       md5(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_hash
FROM synth
"""


def repetition_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc repetition profile: (id, n_tokens, n_distinct,
    distinct_ratio, rep_ratio) where rep_ratio = frequency share of
    the single most repeated bigram — the cheap "is this document
    degenerate/boilerplate" training-data quality signal (high
    rep_ratio ⇒ lists, templates, generation loops)."""
    toks = tokenize_whitespace(text_col)
    base = df.select(F.col(id_col), toks.alias("t"))
    bigrams = F.when(
        F.size("t") >= 2,
        F.zip_with(
            F.slice("t", 1, F.size("t") - 1),
            F.slice("t", 2, F.size("t") - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg_counts = (
        base.select(id_col, F.explode(bigrams).alias("bigram"))
        .groupBy(id_col, "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bg_stats = bg_counts.groupBy(id_col).agg(
        F.max("c").alias("max_bg"), F.sum("c").alias("n_bg")
    )
    tok_stats = base.select(
        id_col,
        F.size("t").alias("n_tokens"),
        F.size(F.array_distinct("t")).alias("n_distinct"),
    )
    return tok_stats.join(bg_stats, id_col, "left").select(
        id_col,
        "n_tokens",
        "n_distinct",
        fround(
            F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double"), 6
        ).alias("distinct_ratio"),
        fround(
            F.col("max_bg").cast("double") / F.col("n_bg").cast("double"), 6
        ).alias("rep_ratio"),
    )


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return repetition_scores(docs, "doc_id", "text")


ORACLE["text_repetition"] = rf"""
WITH lists AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS l
  FROM documents
),
toks AS (
  SELECT doc_id, unnest(l) AS tok,
         unnest(generate_series(1, len(l))) AS ord
  FROM lists
),
bg AS (
  SELECT doc_id,
         tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS bigram
  FROM toks
),
bgc AS (
  SELECT doc_id, bigram, count(*) AS c
  FROM bg WHERE bigram IS NOT NULL GROUP BY 1, 2
),
bstat AS (
  SELECT doc_id, max(c) AS max_bg, sum(c) AS n_bg FROM bgc GROUP BY doc_id
),
stats AS (
  SELECT doc_id, len(l) AS n_tokens, len(list_distinct(l)) AS n_distinct
  FROM lists
)
SELECT s.doc_id, s.n_tokens, s.n_distinct,
       {fround_sql("CAST(s.n_distinct AS DOUBLE) / CAST(s.n_tokens AS DOUBLE)", 6)} AS distinct_ratio,
       {fround_sql("CAST(b.max_bg AS DOUBLE) / CAST(b.n_bg AS DOUBLE)", 6)} AS rep_ratio
FROM stats s LEFT JOIN bstat b ON s.doc_id = b.doc_id
"""


def prefix_duplicate_groups(
    df: DataFrame, id_col: str, text_col: str, prefix_len: int = 64
) -> DataFrame:
    """Boilerplate clusters: docs sharing the same ``prefix_len``-char
    prefix. Returns (prefix_hash, n_docs, keeper_id) for groups of
    ≥ 2 — ``keeper_id`` (min id) survives, the rest are drop
    candidates. Shuffles only the prefix hash, never the body."""
    pref = F.md5(F.substring(F.col(text_col), 1, prefix_len))
    return (
        df.groupBy(pref.alias("prefix_hash"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keeper_id"))
        .filter(F.col("n_docs") >= 2)
    )


def dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return prefix_duplicate_groups(docs, "doc_id", "text", 64)


ORACLE["dedup_prefix"] = """
SELECT md5(substr(text, 1, 64)) AS prefix_hash,
       count(*) AS n_docs, min(doc_id) AS keeper_id
FROM documents
GROUP BY 1 HAVING count(*) >= 2
"""


QUERIES = {
    "text_pii_redact": text_pii_redact,
    "text_repetition": text_repetition,
    "dedup_prefix": dedup_prefix,
}
