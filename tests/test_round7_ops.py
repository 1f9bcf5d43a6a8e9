"""Round-7 operators: leakage-safe scaling, fixed-width one-hot,
Kalman local level, Croston intermittent demand, segment migration,
bipartite projection, vector range search, MMR re-ranking, SQL
lateral column aliases, compaction planning, orphan-file audit, and
missingness patterns. Each test pins the SEMANTICS (analytic
invariants / hand-checkable properties); the registry oracle sweep
pins exact values on real data."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F


def test_scaler_val_stats_are_finite_and_bounded(spark, sf_dir):
    from mapreduce_rust_spark.operators.cleaning import features_scaler_fit_apply

    rows = features_scaler_fit_apply(spark, sf_dir).collect()
    assert rows, "val split must be non-empty"
    for r in rows:
        assert r["n_val"] > 0
        assert math.isfinite(r["z_mean"])
        # min-max params fit on train: val values may leak outside
        # [0,1] but the share must be a valid probability-ish rate
        assert 0.0 <= r["oob_share"] <= 2.0


def test_one_hot_vocab_is_fixed_width_and_lossless(spark, sf_dir):
    from mapreduce_rust_spark.operators.cleaning import OHE_TOP_K, features_one_hot_topk
    from mapreduce_rust_spark.sources.tables import load_table

    rows = features_one_hot_topk(spark, sf_dir).collect()
    n_parts = load_table(spark, sf_dir, "part").count()
    assert len(rows) <= OHE_TOP_K + 1
    other = [r for r in rows if r["idx"] == 0]
    assert len(other) == 1 and other[0]["cat"] == "OTHER"
    # no category lost: vocab + OTHER cover every row
    assert sum(r["n"] for r in rows) == n_parts
    vocab = sorted((r for r in rows if r["idx"] > 0), key=lambda r: r["idx"])
    counts = [r["n"] for r in vocab]
    assert counts == sorted(counts, reverse=True), "vocab ranked by support"


def test_kalman_gain_converges_to_steady_state(spark, sf_dir):
    """For the local-level model the steady-state P* solves
    P² + QP − QR = 0; with Q=0.1, R=1 the gain must converge to
    (P*+Q)/(P*+Q+R) ≈ 0.270156 after a month of dailies."""
    from mapreduce_rust_spark.plans.timeseries import (
        KALMAN_Q,
        KALMAN_R,
        ts_kalman_local_level,
    )

    p_star = (-KALMAN_Q + math.sqrt(KALMAN_Q**2 + 4 * KALMAN_Q * KALMAN_R)) / 2
    k_star = (p_star + KALMAN_Q) / (p_star + KALMAN_Q + KALMAN_R)
    for r in ts_kalman_local_level(spark, sf_dir).collect():
        assert 0.0 < r["gain"] < 1.0
        if r["n_days"] >= 15:
            assert r["gain"] == pytest.approx(k_star, abs=1e-3)
        assert r["innov_mae"] >= 0.0


def test_croston_closed_form_equals_recursion():
    """The weighted-sum closed form the Spark plan uses must equal the
    textbook recursion z_t = αd_t + (1−α)z_{t−1} exactly."""
    from mapreduce_rust_spark.plans.timeseries import CROSTON_ALPHA as a

    d = [5.0, 3.0, 8.0, 2.0, 9.0, 4.0]
    z = d[0]
    for x in d[1:]:
        z = a * x + (1 - a) * z
    n = len(d)
    closed = (1 - a) ** (n - 1) * d[0] + sum(
        a * (1 - a) ** (n - 1 - i) * d[i] for i in range(1, n)
    )
    assert closed == pytest.approx(z, rel=1e-12)


def test_croston_outputs_are_consistent(spark, sf_dir):
    from mapreduce_rust_spark.plans.timeseries import forecast_croston

    for r in forecast_croston(spark, sf_dir).collect():
        assert r["n_demands"] >= 2
        assert r["smoothed_interval"] >= 1.0, "daily grain: gaps are ≥ 1 day"
        assert r["smoothed_size"] > 0
        assert r["demand_per_day"] == pytest.approx(
            r["smoothed_size"] / r["smoothed_interval"], rel=1e-3
        )


def test_segment_migration_conserves_customers(spark, sf_dir):
    from mapreduce_rust_spark.plans.analytics import customer_segment_migration
    from mapreduce_rust_spark.sources.tables import load_table

    rows = customer_segment_migration(spark, sf_dir).collect()
    active = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == active
    segs = {"high", "low", "none"}
    assert all(r["seg_from"] in segs and r["seg_to"] in segs for r in rows)
    # a customer with orders cannot be none->none (they ordered in
    # at least one half)
    assert not any(
        r["seg_from"] == "none" and r["seg_to"] == "none" for r in rows
    )


def test_bipartite_projection_bounds(spark, sf_dir):
    from mapreduce_rust_spark.plans.behavior import graph_bipartite_projection
    from mapreduce_rust_spark.sources.tables import load_table

    rows = graph_bipartite_projection(spark, sf_dir).collect()
    n_types = (
        load_table(spark, sf_dir, "events").select("event_type").distinct().count()
    )
    assert len(rows) <= n_types * (n_types - 1) // 2
    for r in rows:
        assert 0 < r["cosine"] <= 1.0
        assert 0 < r["jaccard"] <= r["cosine"] + 1e-9, "jaccard ≤ cosine (AM-GM)"


def test_range_search_respects_threshold(spark, sf_dir):
    from mapreduce_rust_spark.operators.similarity import RANGE_TAU, ann_range_search

    for r in ann_range_search(spark, sf_dir).collect():
        assert r["sim"] >= RANGE_TAU - 1e-9
        assert r["query_id"] != r["neighbor_id"]


def test_mmr_first_pick_is_top_relevance_and_scores_decrease(spark, sf_dir):
    from mapreduce_rust_spark.operators.similarity import MMR_K, ann_mmr_rerank

    rows = ann_mmr_rerank(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, sel in by_q.items():
        sel.sort(key=lambda r: r["mmr_rank"])
        assert len(sel) == MMR_K
        ids = [r["doc_id"] for r in sel]
        assert len(set(ids)) == MMR_K, "selections must be distinct"
        # greedy argmax: rank-1 has max relevance; marginal scores
        # are non-increasing (each round maxes over a smaller set
        # with a ≥ penalty)
        assert sel[0]["rel"] == max(r["rel"] for r in sel)
        scores = [r["mmr_score"] for r in sel]
        assert all(a >= b - 1e-9 for a, b in zip(scores, scores[1:]))


def test_lateral_alias_chain_is_consistent(spark, sf_dir):
    from mapreduce_rust_spark.plans.sqlface import sql_lateral_column_alias

    for r in sql_lateral_column_alias(spark, sf_dir).collect():
        assert r["est_tax"] == pytest.approx(r["net"] * 0.07, rel=1e-3)
        assert r["margin"] == pytest.approx(r["net"] - r["est_tax"], abs=0.02)


def test_compaction_plan_conserves_bytes_and_files(spark, sf_dir):
    from mapreduce_rust_spark.sources.formats import sink_compaction_plan
    from mapreduce_rust_spark.sources.tables import load_table

    rows = sink_compaction_plan(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    manifest = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.sum(F.length("props") + F.lit(64)).alias("b"))
    total_files = manifest.count()
    total_bytes = manifest.agg(F.sum("b")).collect()[0][0]
    assert sum(r["n_files"] for r in rows) == total_files
    assert sum(r["bytes"] for r in rows) == total_bytes
    bins = [r["bin"] for r in rows]
    assert bins == sorted(bins)
    assert bins[0] == 0, "first bin starts at zero offset"


def test_orphan_audit_matches_manifest_predicate(spark, sf_dir):
    from mapreduce_rust_spark.sources.formats import table_orphan_files
    from mapreduce_rust_spark.sources.tables import load_table

    rows = {r["event_type"]: r["n_rows"] for r in table_orphan_files(spark, sf_dir).collect()}
    truth = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    def orphan(t: str) -> bool:
        return int(hashlib.md5(f"man:{t}".encode()).hexdigest()[:15], 16) % 2 != 0

    expected = {t: n for t, n in truth.items() if orphan(t)}
    assert rows == expected


def test_missingness_patterns_partition_the_table(spark, sf_dir):
    from mapreduce_rust_spark.operators.profiling import table_missingness_patterns
    from mapreduce_rust_spark.sources.tables import load_table

    rows = table_missingness_patterns(spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_rows"] for r in rows) == n_events
    assert sum(r["share"] for r in rows) == pytest.approx(1.0, abs=1e-3)
    for r in rows:
        assert r["n_missing_cols"] == r["pattern"].count("1")
