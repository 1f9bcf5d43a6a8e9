"""Unit tests for the incremental-maintenance plans, the behavioral
additions (Markov transitions, time-bounded funnel), the dedup
threshold curve, and the count-min sketch — semantics pinned on
controlled frames and invariants, independent of the DuckDB oracles."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def ts(s: str):
    return datetime.fromisoformat(s)


import pytest


@pytest.mark.parametrize(
    "cutoff",
    ["2024-01-02 00:00:00", "2024-01-15 12:00:00", "2024-01-24 00:00:00",
     "2024-02-01 00:00:00"],
)
def test_incremental_merge_equals_full_recompute(spark, sf_dir, cutoff, monkeypatch):
    """The whole point of the operator: merged partial state must be
    row-identical to the one-shot aggregation over all data — for ANY
    cutoff, including one where the delta is empty."""
    import mapreduce_rust_spark.plans.incremental as inc
    from mapreduce_rust_spark.sources.tables import load_table
    from mapreduce_rust_spark.functions.numeric import fround

    monkeypatch.setattr(inc, "_CUTOFF", cutoff)
    merged = {
        (r["event_type"], r["day"]): (r["cnt"], r["sum_value"], r["avg_value"])
        for r in inc.incremental_agg_merge(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    full = {
        (r["event_type"], r["day"]): (r["cnt"], r["sum_value"], r["avg_value"])
        for r in ev.groupBy(
            "event_type",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            fround(F.sum("value"), 2).alias("sum_value"),
            fround(F.sum("value") / F.count(F.lit(1)), 4).alias("avg_value"),
        )
        .collect()
    }
    assert merged == full


def test_snapshot_diff_classification(spark, sf_dir):
    """insert/delete/update counts follow from the modular snapshot
    definitions; recompute them arithmetically from the key set."""
    from mapreduce_rust_spark.plans.incremental import snapshot_diff
    from mapreduce_rust_spark.sources.tables import load_table

    got = {r["change_type"]: r["n_keys"] for r in snapshot_diff(spark, sf_dir).collect()}
    keys = [
        r["o_orderkey"]
        for r in load_table(spark, sf_dir, "orders").select("o_orderkey").collect()
    ]
    inserts = sum(1 for k in keys if k % 10 == 0 and k % 7 != 0)
    deletes = sum(1 for k in keys if k % 7 == 0 and k % 10 != 0)
    # updates: in both snapshots AND repriced — the +10% reprice of a
    # positive price always changes the value
    updates = sum(1 for k in keys if k % 10 != 0 and k % 7 != 0 and k % 3 == 0)
    assert got == {"insert": inserts, "delete": deletes, "update": updates}


def test_scd2_point_in_time_crafted_timeline(spark):
    """One user: click-run then view-run; purchases before the first
    state, inside each run, and after the last run's start."""
    import mapreduce_rust_spark.plans.incremental as inc

    rows = [
        # state events (non-purchase)
        (1, ts("2024-01-01 10:00:00"), 7, "click", 0.0, "{}"),
        (2, ts("2024-01-01 11:00:00"), 7, "click", 0.0, "{}"),
        (3, ts("2024-01-01 12:00:00"), 7, "view", 0.0, "{}"),
        # purchases: before any state / in click run / in view run (open end)
        (4, ts("2024-01-01 09:00:00"), 7, "purchase", 0.0, "{}"),
        (5, ts("2024-01-01 10:30:00"), 7, "purchase", 0.0, "{}"),
        (6, ts("2024-01-01 23:00:00"), 7, "purchase", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    real_load = inc.load_table
    try:
        inc.load_table = lambda s, d, name: df
        got = {
            r["state"]: r["n_purchases"]
            for r in inc.scd2_point_in_time(spark, "ignored").collect()
        }
    finally:
        inc.load_table = real_load
    assert got == {"none": 1, "click": 1, "view": 1}


def test_markov_transition_rows_probability_normalized(spark, sf_dir):
    from mapreduce_rust_spark.plans.behavior import markov_transitions

    rows = markov_transitions(spark, sf_dir).collect()
    assert rows, "transition matrix must be non-empty"
    by_from: dict[str, float] = {}
    for r in rows:
        assert 0.0 <= r["p"] <= 1.0
        by_from[r["from_type"]] = by_from.get(r["from_type"], 0.0) + r["p"]
    # truncation rounding loses at most 1e-6 per row (≤5 rows per source)
    for total in by_from.values():
        assert abs(total - 1.0) < 1e-4


def test_funnel_time_bounded_crafted_windows(spark):
    """click outside 30 min of the first view must NOT count; purchase
    within 30 min of the qualifying click must count."""
    import mapreduce_rust_spark.plans.behavior as beh

    rows = [
        # user 1: view -> click +10min -> purchase +20min  (full funnel)
        (1, ts("2024-01-01 10:00:00"), 1, "view", 0.0, "{}"),
        (2, ts("2024-01-01 10:10:00"), 1, "click", 0.0, "{}"),
        (3, ts("2024-01-01 10:30:00"), 1, "purchase", 0.0, "{}"),
        # user 2: view -> click +31min (outside window)
        (4, ts("2024-01-01 10:00:00"), 2, "view", 0.0, "{}"),
        (5, ts("2024-01-01 10:31:00"), 2, "click", 0.0, "{}"),
        # user 3: click with no view at all
        (6, ts("2024-01-01 10:00:00"), 3, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    real_load = beh.load_table
    try:
        beh.load_table = lambda s, d, name: df
        got = {
            r["step"]: r["n"]
            for r in beh.funnel_time_bounded(spark, "ignored").collect()
        }
    finally:
        beh.load_table = real_load
    assert got == {"1_view": 2, "2_click_30m": 1, "3_purchase_30m": 1}


def test_dedup_threshold_curve_invariants(spark, sf_dir):
    """Cumulative column must be monotone (descending thresholds) and
    end at the total pair count of the underlying index."""
    from mapreduce_rust_spark.operators.dedup import (
        dedup_threshold_curve,
        pair_stats_index,
    )

    rows = dedup_threshold_curve(spark, sf_dir).orderBy(F.col("j_bucket").desc()).collect()
    assert rows
    total = pair_stats_index(spark, sf_dir, k=3).count()
    cum = 0
    for r in rows:
        cum += r["n_pairs"]
        assert r["n_pairs_ge"] == cum
    assert cum == total


def test_dedup_lsh_eval_confusion_consistency(spark, sf_dir):
    """tp+fn must equal the exact-truth pair count; rates in [0,1]."""
    from mapreduce_rust_spark.operators.dedup import (
        dedup_lsh_eval,
        pair_stats_index,
    )

    [r] = dedup_lsh_eval(spark, sf_dir).collect()
    assert r["tp"] >= 0 and r["fp"] >= 0 and r["fn"] >= 0
    stats = pair_stats_index(spark, sf_dir, k=3)
    n_truth = stats.filter(
        F.col("i") / (F.col("n1") + F.col("n2") - F.col("i")) >= 0.5
    ).count()
    assert r["tp"] + r["fn"] == n_truth
    if r["precision"] is not None:
        assert 0.0 <= r["precision"] <= 1.0
    if r["recall"] is not None:
        assert 0.0 <= r["recall"] <= 1.0


def test_corpus_length_histogram_totals(spark, sf_dir):
    """Doc counts must sum to the corpus size and the cumulative token
    share must reach 1.0 at the smallest bin."""
    from mapreduce_rust_spark.operators.corpus import corpus_length_histogram
    from mapreduce_rust_spark.sources.tables import load_table

    rows = corpus_length_histogram(spark, sf_dir).collect()
    assert rows
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    by_bin = sorted(rows, key=lambda r: r["bin_lo"])
    assert abs(by_bin[0]["cum_token_share_ge"] - 1.0) < 1e-5
    shares = [r["cum_token_share_ge"] for r in by_bin]
    assert shares == sorted(shares, reverse=True)


def test_graph_degree_distribution_counts_nodes(spark, sf_dir):
    """Σ n_nodes must equal the number of distinct nodes in the pair
    graph, and Σ degree·n_nodes = 2·|edges| (handshake lemma)."""
    from mapreduce_rust_spark.operators.dedup import candidate_pairs_index
    from mapreduce_rust_spark.operators.graph import graph_degree_distribution

    rows = graph_degree_distribution(spark, sf_dir).collect()
    pairs = candidate_pairs_index(spark, sf_dir, threshold=0.5, k=3)
    n_edges = pairs.count()
    n_nodes = (
        pairs.select(F.col("d1").alias("n"))
        .unionAll(pairs.select(F.col("d2").alias("n")))
        .distinct()
        .count()
    )
    assert sum(r["n_nodes"] for r in rows) == n_nodes
    assert sum(r["degree"] * r["n_nodes"] for r in rows) == 2 * n_edges


def test_quality_weighted_sampling_rate_tracks_quality(spark, sf_dir):
    """Keep rate should track mean quality: with the hash fraction
    uniform on [0,1), E[kept | q] = clamp(q, 0, 1). Assert the
    realized per-source ratio is within a generous tolerance of the
    mean quality (25 docs/source at sf0.001 → wide binomial CI)."""
    from mapreduce_rust_spark.operators.corpus import sample_quality_weighted

    rows = sample_quality_weighted(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert abs(r["kept_ratio"] - min(max(r["avg_quality"], 0.0), 1.0)) < 0.35


def test_seasonal_profile_shape_and_normalization(spark, sf_dir):
    """24 hours per type; volume-weighted mean of hourly ratios = 1."""
    from mapreduce_rust_spark.plans.timeseries import ts_seasonal_profile

    rows = ts_seasonal_profile(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        assert len(rs) == 24, t
        n_total = sum(r["n"] for r in rs)
        wmean = sum(r["ratio_to_mean"] * r["n"] for r in rs) / n_total
        assert abs(wmean - 1.0) < 1e-3


def test_late_data_audit_matches_naive_global_window(spark, sf_dir):
    """The two-phase distributed prefix-max must reproduce the naive
    single-partition global window exactly."""
    from pyspark.sql import Window as W

    from mapreduce_rust_spark.functions.text import hash64
    from mapreduce_rust_spark.plans.timeseries import late_data_audit
    from mapreduce_rust_spark.sources.tables import load_table

    got = {r["late_min"]: r["n_events"] for r in late_data_audit(spark, sf_dir).collect()}

    ev = load_table(spark, sf_dir, "events")
    tus = F.unix_micros("ts")
    arrival = tus + hash64(F.col("event_id").cast("string")) % 600000000
    w = W.orderBy(arrival, "event_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    naive = (
        ev.select(
            F.least(
                ((F.max(tus).over(w) - tus) / F.lit(60000000)).cast("bigint"),
                F.lit(120),
            ).alias("late_min")
        )
        .groupBy("late_min")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    expected = {r["late_min"]: r["n_events"] for r in naive.collect()}
    assert got == expected

    rows = late_data_audit(spark, sf_dir).orderBy("late_min").collect()
    assert abs(rows[-1]["captured_share"] - 1.0) < 1e-5


def test_delete_propagation_census_consistency(spark, sf_dir):
    """n_deleted + n_after == n_before per table, and the events leg
    must equal the direct %97 predicate count (every event subject is
    in the forget domain by construction)."""
    from mapreduce_rust_spark.plans.pipeline import delete_propagation
    from mapreduce_rust_spark.sources.tables import load_table

    rows = {r["table_name"]: r for r in delete_propagation(spark, sf_dir).collect()}
    assert set(rows) == {"events", "orders", "customer"}
    for r in rows.values():
        assert r["n_deleted"] + r["n_after"] == r["n_before"]
    ev = load_table(spark, sf_dir, "events")
    assert rows["events"]["n_deleted"] == ev.filter("user_id % 97 = 0").count()


def test_ann_recall_eval_bounds_and_exact_self_recall(spark, sf_dir):
    """Recall in [0,1] with n_hits ≤ 3; evaluating brute force against
    itself must give recall 1.0 for every query."""
    from mapreduce_rust_spark.operators.similarity import (
        _QUERY_PRED,
        ann_recall_eval,
        topk_bruteforce,
    )
    from mapreduce_rust_spark.sources.tables import load_table

    rows = ann_recall_eval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_hits"] <= 3
        assert 0.0 <= r["recall"] <= 1.0

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.expr(_QUERY_PRED))
    exact = topk_bruteforce(qs, emb, "vec_id", "embedding", k=3).select(
        "query_id", "neighbor_id"
    )
    self_hits = exact.join(exact, ["query_id", "neighbor_id"]).groupBy(
        "query_id"
    ).count()
    assert all(r["count"] == 3 for r in self_hits.collect())


def test_cms_overestimates_and_bounded_error(spark, sf_dir):
    """CMS law: est >= true always; with depth 4 / width 256 the
    expected overestimate per row is n_words/256 — assert the min-row
    estimate stays within 5 * n_words / width of truth."""
    from mapreduce_rust_spark.plans.advanced import sketch_cms_counts_q
    from mapreduce_rust_spark.sources.tables import load_table

    rows = sketch_cms_counts_q(spark, sf_dir).collect()
    assert len(rows) == 10
    n_words = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .count()
    )
    bound = 5 * n_words / 256
    for r in rows:
        assert r["cms_est"] >= r["true_cnt"]
        assert r["cms_est"] - r["true_cnt"] <= bound
