"""Unit tests for the corpus-cleaning family (PII redaction,
repetition scoring, prefix dedup, shard packing) and the round-2
time-series additions, on small controlled frames."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_redact_pii_counts_and_scrubs(spark):
    from mapreduce_rust_spark.operators.cleaning import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d+x@e.org, call +1-555-0199"),
            (2, "no pii here"),
        ],
        "id long, t string",
    )
    rows = {r["id"]: r for r in redact_pii(df, "t").collect()}
    assert rows[1]["n_emails"] == 2
    assert rows[1]["n_phones"] == 1
    assert rows[1]["t_redacted"] == "mail <EMAIL> and <EMAIL>, call <PHONE>"
    assert rows[2]["n_emails"] == 0 and rows[2]["t_redacted"] == "no pii here"


def test_repetition_scores_degenerate_vs_diverse(spark):
    from mapreduce_rust_spark.operators.cleaning import repetition_scores

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),  # one bigram repeated 4×
            (2, "all words here are unique"),
            (3, "x"),  # single token: no bigrams
        ],
        "id long, t string",
    )
    rows = {r["id"]: r for r in repetition_scores(df, "id", "t").collect()}
    assert rows[1]["n_tokens"] == 5 and rows[1]["n_distinct"] == 1
    assert rows[1]["rep_ratio"] == 1.0  # "spam spam" is every bigram
    assert rows[2]["distinct_ratio"] == 1.0
    assert rows[2]["rep_ratio"] == 0.25  # 4 distinct bigrams, max count 1
    assert rows[3]["rep_ratio"] is None  # no bigrams → NULL, not crash


def test_prefix_duplicate_groups(spark):
    from mapreduce_rust_spark.operators.cleaning import prefix_duplicate_groups

    boiler = "TERMS AND CONDITIONS apply to everything below here!!"
    df = spark.createDataFrame(
        [
            (10, boiler + " doc one body"),
            (11, boiler + " doc two body"),
            (12, "organic document with its own opening line"),
        ],
        "id long, t string",
    )
    rows = prefix_duplicate_groups(df, "id", "t", prefix_len=40).collect()
    assert len(rows) == 1
    assert rows[0]["n_docs"] == 2 and rows[0]["keeper_id"] == 10


def test_pack_shards_respects_budget_boundaries(spark):
    from mapreduce_rust_spark.operators.corpus import pack_shards

    df = spark.createDataFrame(
        [("s", i, 40) for i in range(6)], "src string, id long, sz long"
    )
    got = {
        r["id"]: r["shard_id"]
        for r in pack_shards(df, "src", "id", "sz", budget=100).collect()
    }
    # preceding totals: 0,40,80,120,160,200 → shards 0,0,0,1,1,2
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2}


def test_pack_shards_oversize_row_gets_own_shard(spark):
    from mapreduce_rust_spark.operators.corpus import pack_shards

    df = spark.createDataFrame(
        [("s", 1, 500), ("s", 2, 10), ("s", 3, 10)], "src string, id long, sz long"
    )
    got = {
        r["id"]: r["shard_id"]
        for r in pack_shards(df, "src", "id", "sz", budget=100).collect()
    }
    # the 500-byte row lands in shard 0; the next row starts at 500 → shard 5
    assert got == {1: 0, 2: 5, 3: 5}


def test_window_range_24h_time_bounded_not_row_bounded(spark):
    """Events 25 h apart must NOT see each other; events 1 h apart must."""
    from pyspark.sql import Window as W

    import datetime as dt

    base = dt.datetime(2025, 1, 1, 0, 0, 0)
    df = spark.createDataFrame(
        [
            (1, 1, base, 10.0),
            (1, 2, base + dt.timedelta(hours=1), 20.0),
            (1, 3, base + dt.timedelta(hours=26), 40.0),
        ],
        "user_id long, event_id long, ts timestamp, value double",
    )
    day_us = 24 * 3600 * 1_000_000
    w = W.partitionBy("user_id").orderBy(F.unix_micros("ts")).rangeBetween(-day_us, 0)
    got = {
        r["event_id"]: r["n"]
        for r in df.select("event_id", F.count(F.lit(1)).over(w).alias("n")).collect()
    }
    assert got == {1: 1, 2: 2, 3: 1}


def test_correlation_matrix_perfect_and_inverse(spark):
    from mapreduce_rust_spark.operators.profiling import correlation_matrix

    df = spark.createDataFrame(
        [(1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0), (4.0, 8.0, -4.0)],
        "a double, b double, c double",
    )
    got = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in correlation_matrix(df, ["a", "b", "c"]).collect()
    }
    assert got[("a", "b")] == 1.0
    assert got[("a", "c")] == -1.0
    assert got[("b", "c")] == -1.0
