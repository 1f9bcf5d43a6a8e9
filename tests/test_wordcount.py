"""Golden-parity tests for the reference's one application: wordcount
with case-sensitive, punctuation-preserving whitespace tokenization
(FIXTURES.md §1 golden output over the reference's own fixture files).
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import REFERENCE_FIXTURES

GOLDEN = {"hello": 8, "world": 3, "rust": 3, "Goodbye": 3, "123": 1}

needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_FIXTURES), reason="reference fixtures not present"
)


@needs_fixtures
def test_wordcount_files_golden(spark):
    from mapreduce_rust_spark.plans.wordcount import wordcount_files

    got = {r["word"]: r["cnt"] for r in wordcount_files(spark, REFERENCE_FIXTURES).collect()}
    assert got == GOLDEN


@needs_fixtures
def test_mapreduce_job_golden(spark):
    """The reference's exact API shape: MapFn/ReduceFn pair over whole
    files, string-typed counts at the edge (mr_app/src/client.rs)."""
    from mapreduce_rust_spark.operators.mapreduce import MapReduceJob, wordcount_fns

    job = MapReduceJob(*wordcount_fns())
    got = {r["key"]: r["value"] for r in job.run(spark, REFERENCE_FIXTURES).collect()}
    assert got == {k: str(v) for k, v in GOLDEN.items()}


def test_tokenizer_semantics(spark):
    """hello vs hello, are distinct; case preserved; empties dropped —
    pinned divergence-free with the reference tokenizer."""
    from pyspark.sql import functions as F

    from mapreduce_rust_spark.functions.text import tokenize_whitespace

    df = spark.createDataFrame(
        [("  hello, World hello\tHELLO  \n x ",)], "text string"
    )
    [row] = df.select(tokenize_whitespace("text").alias("t")).collect()
    assert row["t"] == ["hello,", "World", "hello", "HELLO", "x"]


GUTENBERG_GLOB = "/root/reference/resource/pg-*.txt"


@pytest.mark.skipif(
    not __import__("glob").glob(GUTENBERG_GLOB),
    reason="gutenberg corpus not present",
)
def test_wordcount_gutenberg_corpus(spark):
    """The reference ships the classic ~3.3 MB Gutenberg wordcount
    corpus (resource/pg-*.txt, unused by its own code). Full-corpus
    parity against a pure-Python oracle: total tokens, vocabulary
    size, and the head of the frequency distribution."""
    import glob
    from collections import Counter

    from mapreduce_rust_spark.plans.wordcount import wordcount_files

    expect: Counter[str] = Counter()
    for p in sorted(glob.glob(GUTENBERG_GLOB)):
        with open(p, encoding="utf-8") as fh:
            expect.update(fh.read().split())

    got = {r["word"]: r["cnt"] for r in wordcount_files(spark, GUTENBERG_GLOB).collect()}
    assert sum(got.values()) == sum(expect.values())
    assert len(got) == len(expect)
    for w, n in expect.most_common(25):
        assert got[w] == n, w


def test_wordcount_dataframe_counts(spark):
    from mapreduce_rust_spark.plans.wordcount import wordcount

    df = spark.createDataFrame([("a b a",), ("b a",)], "text string")
    got = {r["word"]: r["cnt"] for r in wordcount(df, "text").collect()}
    assert got == {"a": 3, "b": 2}
