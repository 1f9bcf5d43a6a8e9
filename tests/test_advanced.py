"""Unit tests for the advanced operators (as-of join, sketches) on
controlled frames — semantics pinned independently of the oracles."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def ts(s: str):
    return datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    from mapreduce_rust_spark.plans.advanced import asof_join

    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), "p1"),
            (1, ts("2024-01-01 12:00:00"), "p2"),
            (2, ts("2024-01-01 10:00:00"), "p3"),  # user with no clicks
        ],
        "user_id long, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 09:00:00")),
            (1, ts("2024-01-01 11:30:00")),
            (1, ts("2024-01-01 13:00:00")),  # after both -> never matches
        ],
        "user_id long, ts timestamp",
    )
    got = {
        r["name"]: r["asof_ts"]
        for r in asof_join(left, right, on="user_id", ts_col="ts").collect()
    }
    assert got == {
        "p1": ts("2024-01-01 09:00:00"),
        "p2": ts("2024-01-01 11:30:00"),
        "p3": None,
    }


def test_asof_join_tie_matches_equal_ts(spark):
    from mapreduce_rust_spark.plans.advanced import asof_join

    t = ts("2024-01-01 10:00:00")
    left = spark.createDataFrame([(1, t, "p")], "user_id long, ts timestamp, name string")
    right = spark.createDataFrame([(1, t)], "user_id long, ts timestamp")
    [row] = asof_join(left, right, on="user_id", ts_col="ts").collect()
    assert row["asof_ts"] == t  # >= semantics: equal ts matches


def test_approx_distinct_error_bound(spark, sf_dir):
    from mapreduce_rust_spark.plans.advanced import approx_distinct_q

    for r in approx_distinct_q(spark, sf_dir).collect():
        rel_err = abs(r["approx_parts"] - r["exact_parts"]) / max(r["exact_parts"], 1)
        assert rel_err < 0.05, (r, rel_err)


def test_connected_components_hand_graph(spark):
    """Two components + an isolated self-pair; labels = min member."""
    from mapreduce_rust_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "d1 long, d2 long",
    )
    got = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_profile_numeric_counts_nulls(spark):
    from mapreduce_rust_spark.operators.profiling import profile_numeric

    df = spark.createDataFrame(
        [(1.0, None), (2.0, 5.0), (None, 5.0), (2.0, None)],
        "a double, b double",
    )
    got = {r["column"]: r for r in profile_numeric(df, ["a", "b"]).collect()}
    assert got["a"]["n"] == 3 and got["a"]["n_null"] == 1
    assert got["a"]["n_distinct"] == 2 and got["a"]["max_v"] == 2.0
    assert got["b"]["n"] == 2 and got["b"]["n_null"] == 2
    assert got["b"]["min_v"] == 5.0 and got["b"]["avg_v"] == 5.0
