"""Unit tests for the corpus-cleaning family (PII redaction,
repetition scoring, prefix dedup, shard packing) and the round-2
time-series additions, on small controlled frames."""

from __future__ import annotations

import pytest
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


def test_duplicated_spans_finds_cross_doc_template(spark):
    from mapreduce_rust_spark.operators.dedup import duplicated_spans

    tmpl = "all rights reserved by the example corp entity"  # 8 tokens
    df = spark.createDataFrame(
        [
            (1, "alpha " + tmpl),
            (2, tmpl + " omega"),
            (3, "entirely unrelated words that never repeat anywhere else ok"),
        ],
        "id long, t string",
    )
    rows = duplicated_spans(df, "id", "t", k=8, top=10).collect()
    assert any(r["span"] == tmpl and r["n_docs"] == 2 for r in rows)
    # no span from doc 3 (unique) may appear
    assert all("unrelated" not in r["span"] for r in rows)


def test_ewma_closed_form_matches_recursion(spark):
    import pandas as pd

    from mapreduce_rust_spark.plans.timeseries import ts_ewma  # noqa: F401 — import check

    # replicate the closed form on a tiny frame and compare to the
    # sequential recursion (pandas ewm, adjust=False)
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    vals = [10.0, 20.0, 5.0, 40.0, 15.0]
    df = spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate(vals)], "u long, i long, value double"
    )
    alpha, r = 0.2, 0.8
    w = W.partitionBy("u").orderBy("i").rowsBetween(W.unboundedPreceding, 0)
    rn = F.row_number().over(W.partitionBy("u").orderBy("i"))
    base = df.select("u", "i", "value", rn.alias("rn"))
    scaled = F.when(F.col("rn") >= 2, F.col("value") * F.pow(F.lit(r), -F.col("rn"))).otherwise(0.0)
    wsum = W.partitionBy("u").orderBy("rn").rowsBetween(W.unboundedPreceding, 0)
    ewma = F.first("value").over(wsum) * F.pow(F.lit(r), F.col("rn") - 1) + F.lit(
        alpha
    ) * F.pow(F.lit(r), F.col("rn")) * F.sum(scaled).over(wsum)
    got = [r_["e"] for r_ in base.select(ewma.alias("e")).orderBy("rn").collect()]
    want = pd.Series(vals).ewm(alpha=alpha, adjust=False).mean().tolist()
    assert got == pytest.approx(want, rel=1e-12)


def test_quantile_bin_counts_equal_frequency(spark):
    from mapreduce_rust_spark.operators.profiling import quantile_bin_counts

    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double")
    rows = quantile_bin_counts(df, "x", n_bins=4).collect()
    assert [r["bin"] for r in rows] == [0, 1, 2, 3]
    assert [r["n"] for r in rows] == [25, 25, 25, 25]


def test_stratified_hash_sample_rates(spark):
    from mapreduce_rust_spark.operators.corpus import stratified_hash_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(2000)], "id long, lang string"
    )
    kept = stratified_hash_sample(df, "id", "lang", {"en": 0.25}, 0.5)
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # md5 hex first char uniform: en ~25% of 1000, de ~50% of 1000
    assert 180 < counts["en"] < 320
    assert 420 < counts["de"] < 580


def test_token_diversity_bounds(spark):
    from mapreduce_rust_spark.operators.text_analysis import token_diversity

    df = spark.createDataFrame(
        [(1, "x x x x"), (2, "a b c d"), (3, "solo")], "id long, t string"
    )
    got = {r["id"]: r["diversity"] for r in token_diversity(df, "id", "t").collect()}
    assert got[1] == 0.0       # degenerate loop
    assert got[2] == 1.0       # all distinct
    assert 3 not in got        # <2 tokens: excluded, not a div-by-zero


def test_zscore_outliers_flags_spike(spark):
    from mapreduce_rust_spark.operators.profiling import zscore_outliers

    rows = [("a", float(v)) for v in [10, 11, 9, 10, 10, 11, 9, 10, 1000]]
    df = spark.createDataFrame(rows, "g string, v double")
    out = zscore_outliers(df, "g", "v", z=2.0).collect()[0]
    assert out["n"] == 9
    assert out["n_outliers"] == 1
