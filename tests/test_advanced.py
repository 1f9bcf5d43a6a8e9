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
    """The query exposes the sketch contract as a boolean; tighten it
    here by recomputing the estimate and asserting <5% relative error
    (the query's own bound is the looser 3×rsd = 15%)."""
    from pyspark.sql import functions as F

    from mapreduce_rust_spark.plans.advanced import approx_distinct_q
    from mapreduce_rust_spark.sources.tables import load_table

    rows = approx_distinct_q(spark, sf_dir).collect()
    assert rows and all(r["within_tol"] for r in rows), rows

    li = load_table(spark, sf_dir, "lineitem")
    for r in li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.05).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    ).collect():
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


def test_scd2_islands_compress_alternating_states(spark, sf_dir, monkeypatch):
    """A hand-built timeline A,A,B,A must yield three runs — the
    middle B breaks the first A-run even though type A recurs."""
    import mapreduce_rust_spark.plans.behavior as B
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 7, "A", 0.0, "{}"),
            (2, "2024-01-01 01:00:00", 7, "A", 0.0, "{}"),
            (3, "2024-01-01 02:00:00", 7, "B", 0.0, "{}"),
            (4, "2024-01-01 03:00:00", 7, "A", 0.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    monkeypatch.setattr(B, "load_table", lambda s, d, n: ev)
    rows = sorted(
        (r["event_type"], r["valid_from"], r["n_events"])
        for r in B.scd2_compress_states(spark, sf_dir).collect()
    )
    assert rows == [
        ("A", "2024-01-01 00:00:00", 2),
        ("A", "2024-01-01 03:00:00", 1),
        ("B", "2024-01-01 02:00:00", 1),
    ]


def test_robust_mad_flags_planted_outlier(spark, monkeypatch):
    """Median/MAD must flag one planted extreme value and stay robust:
    the screen's own statistics must not move with the outlier."""
    import mapreduce_rust_spark.operators.profiling as P
    from pyspark.sql import functions as F

    vals = [float(v) for v in [10, 11, 12, 13, 14, 1000]]
    ev = spark.createDataFrame(
        [(i, "2024-01-01 00:00:00", i, "t", v, "{}") for i, v in enumerate(vals)],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    monkeypatch.setattr(P, "load_table", lambda s, d, n: ev)
    [row] = P.robust_mad_outliers(spark, "unused").collect()
    assert row["n"] == 6 and row["n_outliers"] == 1
    assert row["med"] == 12.5  # unmoved by the 1000

def test_source_mix_weights_sum_to_uniform(spark, sf_dir):
    """Weighted shares must reconstruct the uniform mix: share *
    uniform_weight == 1/n_sources for every source."""
    from mapreduce_rust_spark.operators.corpus import source_mix_weights

    rows = source_mix_weights(spark, sf_dir).collect()
    n = len(rows)
    assert n > 1
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert abs(r["share"] * r["uniform_weight"] - 1.0 / n) < 1e-3


def test_sketch_union_dedups_overlapping_groups(spark):
    """The union estimate must reflect the DISTINCT union of ids, not
    the sum of per-group estimates — ids shared across groups are the
    whole point of mergeable sketches."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", i) for i in range(500)] + [("b", i) for i in range(250, 750)],
        "g string, uid long",
    )
    per = df.groupBy("g").agg(F.hll_sketch_agg("uid").alias("sk"))
    [row] = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()
    # exact distinct union = 750; naive sum of groups = 1000
    assert abs(row["est"] - 750) <= 750 * 0.05


def test_time_weighted_avg_known_segments(spark):
    """LOCF weighting: a value held for 18 s dominates one held 2 s —
    twa = 1.0 while the plain avg of the same segments is 5.0."""
    import datetime as dt

    import pytest

    from pyspark.sql import Window as W

    base = dt.datetime(2026, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, base, "a", 0.0),
            (2, base + dt.timedelta(seconds=18), "a", 10.0),
            (3, base + dt.timedelta(seconds=20), "a", 99.0),
        ],
        "event_id bigint, ts timestamp, event_type string, value double",
    )
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    dur = (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).cast("double")
    seg = ev.select("event_type", "value", dur.alias("dur_us")).filter(
        F.col("dur_us").isNotNull()
    )
    row = (
        seg.groupBy("event_type")
        .agg(
            (F.sum(F.col("value") * F.col("dur_us")) / F.sum("dur_us")).alias("twa"),
            F.avg("value").alias("plain"),
        )
        .collect()[0]
    )
    assert row["twa"] == pytest.approx(1.0)
    assert row["plain"] == pytest.approx(5.0)


def test_welch_t_zero_on_identical_arms(spark):
    """Identical arm distributions give t = 0 and mean_diff = 0."""
    from mapreduce_rust_spark.plans import behavior as bh

    rows = []
    for u in range(40):
        # users 0..39; parity arms see the same value multiset
        rows.append((u, "click", float(u // 2 % 5 + 1)))
    ev = spark.createDataFrame(rows, "user_id bigint, event_type string, value double")
    orig = bh.load_table
    try:
        bh.load_table = lambda spark_, sf_dir, name: ev
        [r] = bh.ab_welch_ttest(spark, "unused").collect()
    finally:
        bh.load_table = orig
    assert r["mean_diff"] == 0.0 and r["t_stat"] == 0.0
    assert r["n0"] == 20 and r["n1"] == 20


def test_snaive_perfect_on_periodic_series(spark):
    """A perfectly 24h-periodic series backtests to MAE = RMSE = 0."""
    import datetime as dt

    from mapreduce_rust_spark.plans import timeseries as ts

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(96):  # 4 days
        for _ in range(1 + h % 24 % 3):  # volume depends only on hour-of-day
            rows.append((eid, base + dt.timedelta(hours=h), 1, "click", 1.0))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )
    orig = ts.load_table
    try:
        ts.load_table = lambda spark_, sf_dir, name: ev
        [r] = ts.ts_forecast_snaive_backtest(spark, "unused").collect()
    finally:
        ts.load_table = orig
    assert r["mae"] == 0.0 and r["rmse"] == 0.0
    assert r["n_hours_scored"] == 96 - 24


def test_stl_components_reassemble(spark):
    """trend + seasonal + residual must reassemble to n (within the
    4-decimal truncation)."""
    from mapreduce_rust_spark.plans import timeseries as ts

    rows = ts.ts_stl_decompose(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows[:200]:
        assert abs((r["trend"] + r["seasonal"] + r["residual"]) - r["n"]) < 5e-4


def test_heavy_hitters_partitioning_invariant(spark):
    """The candidate set depends on partitioning; the OUTPUT must not.
    Build a skewed stream where one word sits just above n/k and one
    just below, and check the exact threshold semantics under three
    adversarial layouts (1 partition, 13 shuffled, hash-clustered)."""
    from pyspark.sql import functions as F

    from mapreduce_rust_spark.plans.advanced import heavy_hitters

    # 200 'hot' + 150 'warm' + 50 singletons-ish cold tail = 400 tokens
    words = (
        ["hot"] * 200 + ["warm"] * 150 + [f"cold{i}" for i in range(50)]
    )
    df = spark.createDataFrame([(w,) for w in words], "w string")
    k = 4  # threshold n/k = 100: hot & warm pass, cold fails
    expected = {("hot", 200), ("warm", 150)}
    for layout in (
        df.coalesce(1),
        df.repartition(13),
        df.repartition(5, "w"),
    ):
        got = {
            (r["word"], r["cnt"]) for r in heavy_hitters(layout, k).collect()
        }
        assert got == expected
    # tight threshold: k such that warm is exactly at n/k boundary
    # n=400, k=8 → threshold 50: cold words (count 1) fail, warm/hot pass
    got = {r["word"] for r in heavy_hitters(df.repartition(7), 8).collect()}
    assert got == {"hot", "warm"}


def test_zipf_fit_slope_on_known_powerlaw(spark):
    """An exact 1/rank frequency table must fit slope -1, r2 = 1."""
    from mapreduce_rust_spark.plans import advanced  # noqa: F401  (import parity)
    from mapreduce_rust_spark.operators import text_analysis as ta

    rows = [(f"w{r}", " ".join([f"w{r}"] * (120 // r))) for r in range(1, 13)]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, (_, t) in enumerate(rows)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    orig = ta.load_table
    try:
        ta.load_table = lambda spark_, sf_dir, name: docs
        [r] = ta.text_zipf_fit(spark, "unused").collect()
    finally:
        ta.load_table = orig
    assert r["vocab"] == 12
    # 120//r is not exactly 120/r for all r, so allow a loose band
    assert -1.1 < r["zipf_slope"] < -0.9
    assert r["r2"] > 0.99


def test_event_attribution_known_credits(spark):
    """3 touches before one purchase: first/last go to the right
    channels, linear splits 1/3 : 2/3, outside-window touch excluded."""
    import datetime as dt

    from mapreduce_rust_spark.plans import behavior as bh

    t0 = dt.datetime(2024, 1, 2, 12, 0, 0)

    def ev(i, typ, hours_before):
        return (i, t0 - dt.timedelta(hours=hours_before), 7, typ, 1.0)

    rows = [
        ev(1, "view", 30),      # outside 24h lookback — no credit
        ev(2, "view", 10),      # first touch
        ev(3, "click", 5),
        ev(4, "click", 1),      # last touch
        ev(5, "purchase", 0),
        ev(6, "error", 2),      # not a channel
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )
    orig = bh.load_table
    try:
        bh.load_table = lambda spark_, sf_dir, name: df
        got = {r["channel"]: r for r in bh.event_attribution(spark, "x").collect()}
    finally:
        bh.load_table = orig
    assert got["view"]["first_touch"] == 1 and got["view"]["last_touch"] == 0
    assert got["click"]["first_touch"] == 0 and got["click"]["last_touch"] == 1
    assert abs(got["view"]["linear_credit"] - 1 / 3) < 1e-3
    assert abs(got["click"]["linear_credit"] - 2 / 3) < 1e-3
    assert got["view"]["n_touches"] == 1 and got["click"]["n_touches"] == 2


def test_dp_counts_noise_is_consistent(spark):
    """released = true + noise exactly (post-rounding), noise is
    deterministic across invocations, and no noise value is degenerate
    (the 1e-15 clamp should never bind on real keys)."""
    from mapreduce_rust_spark.operators.profiling import privacy_dp_counts

    a = privacy_dp_counts(spark, "/root/testdata/sf0.001").collect()
    b = privacy_dp_counts(spark, "/root/testdata/sf0.001").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    for r in a:
        assert abs((r["true_cnt"] + r["noise"]) - r["released_cnt"]) < 2e-4
        assert abs(r["noise"]) < 40  # ln(1e-15) * b ≈ 34.5 is the hard cap


def test_acf_perfect_periodicity(spark):
    """A strictly 24h-periodic hourly series must have acf(24) = 1."""
    import datetime as dt

    from mapreduce_rust_spark.plans import timeseries as ts

    base = dt.datetime(2024, 3, 1)
    rows, eid = [], 0
    for h in range(24 * 4):
        for _ in range(1 + (h % 24) % 5):  # volume is a pure function of hour-of-day
            rows.append((eid, base + dt.timedelta(hours=h), 1, "click", 1.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )
    orig = ts.load_table
    try:
        ts.load_table = lambda spark_, sf_dir, name: df
        got = {r["lag"]: r for r in ts.ts_autocorrelation(spark, "x").collect()}
    finally:
        ts.load_table = orig
    assert got[24]["acf"] == 1.0
    assert got[24]["n_pairs"] == 24 * 3
    assert got[1]["acf"] < 1.0  # lag-1 must not be perfectly correlated


def test_reservoir_sample_partitioning_invariant(spark):
    """Bottom-k-by-hash must return the identical sample under any
    physical layout, and adding rows only displaces larger hashes."""
    from pyspark.sql import functions as F

    from mapreduce_rust_spark.operators import corpus as cp

    def run(df):
        orig = cp.load_table
        try:
            cp.load_table = lambda spark_, sf_dir, name: df
            return [tuple(r) for r in cp.sample_reservoir_per_key(spark, "x").collect()]
        finally:
            cp.load_table = orig

    rows = [(i, f"t{i}", ["en", "de"][i % 2], "s", 10) for i in range(200)]
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    df = spark.createDataFrame(rows, schema)
    a = run(df.coalesce(1))
    b = run(df.repartition(17))
    assert a == b and len(a) == 2 * cp.RESERVOIR_K
    # monotone under ingest: the old sample is a superset filter of new
    bigger = spark.createDataFrame(
        rows + [(i, f"t{i}", ["en", "de"][i % 2], "s", 10) for i in range(200, 400)],
        schema,
    )
    c = run(bigger.repartition(5))
    old_ids = {(lang, d) for lang, _, d in a}
    new_ids = {(lang, d) for lang, _, d in c}
    # every doc dropped from the old sample was displaced by a
    # smaller-hash newcomer, never resurrected: new sample ⊆ old ∪ added
    assert all(d >= 200 or (lang, d) in old_ids for lang, d in new_ids)


def test_abc_analysis_partition_shares(spark):
    """Classes partition parts and revenue; shares sum to 1 and
    A-class revenue share is the largest."""
    from mapreduce_rust_spark.plans.analytics import abc_analysis

    rows = abc_analysis(spark, "/root/testdata/sf0.001").collect()
    assert [r["abc_class"] for r in rows] == ["A", "B", "C"]
    assert abs(sum(r["revenue_share"] for r in rows) - 1.0) < 1e-4
    a, b, c = rows
    assert a["revenue_share"] > b["revenue_share"] > c["revenue_share"]
    assert a["revenue_share"] <= 0.80 + 0.01


def test_new_ops_empty_input_safe(spark):
    """Empty frames must yield empty results, not errors: heavy
    hitters, reservoir sampling, and attribution all hit the
    degenerate case on a fresh ingest partition."""
    import datetime as dt  # noqa: F401

    from mapreduce_rust_spark.plans.advanced import heavy_hitters
    from mapreduce_rust_spark.operators import corpus as cp
    from mapreduce_rust_spark.plans import behavior as bh

    empty_words = spark.createDataFrame([], "w string")
    assert heavy_hitters(empty_words, 4).count() == 0

    empty_docs = spark.createDataFrame(
        [], "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    orig = cp.load_table
    try:
        cp.load_table = lambda s, d, n: empty_docs
        assert cp.sample_reservoir_per_key(spark, "x").count() == 0
    finally:
        cp.load_table = orig

    empty_events = spark.createDataFrame(
        [], "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )
    orig = bh.load_table
    try:
        bh.load_table = lambda s, d, n: empty_events
        assert bh.event_attribution(spark, "x").count() == 0
    finally:
        bh.load_table = orig


def test_nprobe_curve_monotone_with_exhaustive_anchor(spark):
    """Recall@3 must be nondecreasing in nprobe and exactly 1.0 when
    every cell is probed (nprobe = IVF_K ⇒ IVF ≡ brute force)."""
    from mapreduce_rust_spark.operators.similarity import (
        IVF_K,
        _NPROBE_SWEEP,
        ann_nprobe_curve,
    )

    rows = ann_nprobe_curve(spark, "/root/testdata/sf0.001").collect()
    assert [r["nprobe"] for r in rows] == sorted(_NPROBE_SWEEP)
    recalls = [r["mean_recall"] for r in rows]
    assert recalls == sorted(recalls)
    assert rows[-1]["nprobe"] == IVF_K and recalls[-1] == 1.0


def test_kcore_converged_at_fixed_rounds(spark):
    """The fixed-round peel must have reached its fixpoint on the real
    data: one extra round changes nothing (so the documented
    fixed-round output IS the true k-core there)."""
    from mapreduce_rust_spark.operators.dedup import candidate_pairs_index
    from mapreduce_rust_spark.operators.graph import (
        KCORE_K,
        KCORE_ROUNDS,
        kcore_peel,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        pairs = candidate_pairs_index(spark, sf, threshold=0.5, k=3)
        a = {tuple(r) for r in kcore_peel(pairs, "d1", "d2", KCORE_K, KCORE_ROUNDS).collect()}
        b = {tuple(r) for r in kcore_peel(pairs, "d1", "d2", KCORE_K, KCORE_ROUNDS + 1).collect()}
        assert a == b
        # every core member keeps >= k neighbors, by definition
        assert all(deg >= KCORE_K for _, deg in a)


def test_sign_code_packing_and_hamming(spark):
    """The two 32-bit sign words must pack bit b iff component b ≥ 0,
    and bit_count(xor) over both halves must equal the brute count of
    sign disagreements."""
    from pyspark.sql import functions as F

    from mapreduce_rust_spark.operators.similarity import _sign_code

    va = [(1.0 if i % 3 else -1.0) for i in range(64)]
    vb = [(1.0 if i % 5 else -1.0) for i in range(64)]
    df = spark.createDataFrame([(va, vb)], "a array<float>, b array<float>")
    row = df.select(
        _sign_code(F.col("a"), 0, 32).alias("a_lo"),
        _sign_code(F.col("a"), 32, 32).alias("a_hi"),
        _sign_code(F.col("b"), 0, 32).alias("b_lo"),
        _sign_code(F.col("b"), 32, 32).alias("b_hi"),
    ).collect()[0]
    exp_a_lo = sum(1 << i for i in range(32) if va[i] >= 0)
    exp_a_hi = sum(1 << i for i in range(32) if va[32 + i] >= 0)
    assert (row["a_lo"], row["a_hi"]) == (exp_a_lo, exp_a_hi)
    ham = bin(row["a_lo"] ^ row["b_lo"]).count("1") + bin(
        row["a_hi"] ^ row["b_hi"]
    ).count("1")
    brute = sum((x >= 0) != (y >= 0) for x, y in zip(va, vb))
    assert ham == brute


def test_kmv_jaccard_exact_when_sketch_covers_union(spark, monkeypatch):
    """KMV estimate degrades to the EXACT Jaccard whenever k ≥ |A∪B|
    (the sketch then IS the union) — the small-set correctness anchor
    for the estimator."""
    from mapreduce_rust_spark.plans import advanced as adv

    assert adv.KMV_K >= 15
    mk = lambda did, src, toks: (did, " ".join(toks), "en", src, 10)
    shared = [f"sh{i}" for i in range(5)]
    rows = [
        mk(0, "srcA", shared + [f"a{i}" for i in range(5)]),
        mk(1, "srcB", shared + [f"b{i}" for i in range(5)]),
    ]
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    df = spark.createDataFrame(rows, schema)
    monkeypatch.setattr(adv, "load_table", lambda s, d, n: df)
    out = adv.sketch_kmv_jaccard(spark, "x").collect()
    assert len(out) == 1
    r = out[0]
    # |A∪B| = 15 ≤ k → estimate is exact: 5 / 15
    assert r["est_jaccard"] == r["exact_jaccard"]
    assert abs(r["exact_jaccard"] - 5 / 15) < 2e-6
    assert r["abs_err"] == 0.0


def test_domain_cap_binds_and_partitioning_invariant(spark, monkeypatch):
    """The cap must keep exactly DOMAIN_CAP longest docs per source
    under any physical partitioning, and totals must cover the whole
    corpus."""
    from mapreduce_rust_spark.operators import corpus as cp

    rows = [
        (i, f"t{i}", "en", f"src{i % 2}", 100 + i) for i in range(80)
    ]
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    df = spark.createDataFrame(rows, schema)

    def run(frame):
        monkeypatch.setattr(cp, "load_table", lambda s, d, n: frame)
        return {r["source"]: r.asDict() for r in cp.corpus_domain_cap(spark, "x").collect()}

    a = run(df.coalesce(1))
    b = run(df.repartition(13))
    assert a == b
    for src in ("src0", "src1"):
        r = a[src]
        assert r["n_docs"] == 40 and r["n_kept"] == cp.DOMAIN_CAP
        # kept = the DOMAIN_CAP largest n_chars values of that source
        chars = sorted(
            (100 + i for i in range(80) if i % 2 == int(src[-1])), reverse=True
        )
        assert r["chars_kept"] == sum(chars[: cp.DOMAIN_CAP])
        assert r["chars_total"] == sum(chars)


def test_round5_late_ops_degenerate_inputs(spark, monkeypatch):
    """Degenerate inputs must yield empty/benign results, not errors:
    domain cap and KMV Jaccard on an empty corpus, a single-source
    corpus (zero pairs), and semantic dedup where every cluster has
    one member (zero drops)."""
    from mapreduce_rust_spark.operators import corpus as cp
    from mapreduce_rust_spark.operators import similarity as sim
    from mapreduce_rust_spark.plans import advanced as adv

    doc_schema = (
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    empty_docs = spark.createDataFrame([], doc_schema)
    monkeypatch.setattr(cp, "load_table", lambda s, d, n: empty_docs)
    assert cp.corpus_domain_cap(spark, "x").count() == 0

    monkeypatch.setattr(adv, "load_table", lambda s, d, n: empty_docs)
    assert adv.sketch_kmv_jaccard(spark, "x").count() == 0

    one_source = spark.createDataFrame(
        [(0, "a b c", "en", "solo", 5), (1, "c d e", "en", "solo", 5)],
        doc_schema,
    )
    monkeypatch.setattr(adv, "load_table", lambda s, d, n: one_source)
    assert adv.sketch_kmv_jaccard(spark, "x").count() == 0  # no pairs

    # 8 orthogonal-ish vectors -> every vector is its own centroid's
    # sole member; semantic dedup must report zero drops
    vecs = [
        (i, [1.0 if j == i else 0.0 for j in range(64)], 0) for i in range(8)
    ]
    emb = spark.createDataFrame(
        vecs, "vec_id bigint, embedding array<float>, label int"
    )
    monkeypatch.setattr(sim, "load_table", lambda s, d, n: emb)
    rows = sim.dedup_semantic_cluster(spark, "x").collect()
    assert sum(r["n_dropped"] for r in rows) == 0
    assert sum(r["n_kept"] for r in rows) == 8


def test_weighted_topk_partitioning_invariant_and_weight_tilted(spark, monkeypatch):
    """A-ES weighted top-k must be identical under any physical
    layout, and heavier docs must be overrepresented relative to a
    uniform sample."""
    from mapreduce_rust_spark.operators import corpus as cp

    rows = [
        (i, f"t{i}", "en", "s", 10 if i < 180 else 10_000)
        for i in range(200)
    ]
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    df = spark.createDataFrame(rows, schema)

    def run(frame):
        monkeypatch.setattr(cp, "load_table", lambda s, d, n: frame)
        return [tuple(r) for r in cp.sample_weighted_topk(spark, "x").collect()]

    a = run(df.coalesce(1))
    b = run(df.repartition(17))
    assert a == b and len(a) == cp.AES_K
    # 20 heavy docs (w=10000) vs 180 light (w=10): heavy docs should
    # dominate the k=20 sample by a wide margin
    heavy = sum(1 for _, doc_id, _, _ in a if doc_id >= 180)
    assert heavy >= cp.AES_K // 2


def test_consistent_hashing_moves_only_to_new_shard(spark):
    """The elasticity invariant: growing the ring from N to N+1
    shards may move a key ONLY to the new shard (old-shard vnodes are
    identical in both rings), and the moved fraction is in the
    ~1/(N+1) ballpark."""
    from pyspark.sql import functions as F

    from mapreduce_rust_spark.operators.skew import (
        RING_SHARDS,
        _assign,
        _ring,
    )

    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = _assign(docs, _ring(spark, RING_SHARDS)).withColumnRenamed(
        "shard", "s_before"
    )
    b = _assign(docs, _ring(spark, RING_SHARDS + 1)).withColumnRenamed(
        "shard", "s_after"
    )
    j = a.join(b, "doc_id")
    moved = j.filter(F.col("s_before") != F.col("s_after"))
    # every moved key must land on the NEW shard
    bad = moved.filter(F.col("s_after") != RING_SHARDS).count()
    assert bad == 0
    frac = moved.count() / 2000
    assert 0.02 < frac < 0.35, frac


def test_sliding_distinct_exact_matches_model(spark, monkeypatch):
    """The trailing-window exact counts must equal a Python model on
    a constructed stream (3 hours, overlapping users)."""
    import datetime as dt

    from mapreduce_rust_spark.plans import advanced as adv

    base = dt.datetime(2024, 1, 1)
    rows = []
    # hour 0: users 0-9; hour 1: users 5-14; hour 2: users 10-19
    for h, lo in ((0, 0), (1, 5), (2, 10)):
        for u in range(lo, lo + 10):
            rows.append((len(rows), base + dt.timedelta(hours=h), u, "view", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(adv, "load_table", lambda s, d, n: ev)
    out = {r["h"]: r for r in adv.sketch_sliding_distinct(spark, "x").collect()}
    hours = sorted(out)
    assert len(hours) == 3
    # trailing-6h windows cover everything seen so far at each hour
    assert out[hours[0]]["exact_users"] == 10
    assert out[hours[1]]["exact_users"] == 15
    assert out[hours[2]]["exact_users"] == 20
    assert all(out[h]["within_tol"] for h in hours)


def test_scripting_loop_trim_is_monotone(spark):
    """Each WHILE round of the mean-trim keeps a (weakly) smaller,
    cheaper set: n_kept and sum_kept must both be below the full
    table's, and the loop reports exactly 3 rounds."""
    from mapreduce_rust_spark.plans.sqlface import sql_scripting_loop
    from mapreduce_rust_spark.sources.tables import load_table

    [r] = sql_scripting_loop(spark, "/root/testdata/sf0.001").collect()
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    n_all = orders.count()
    assert r["n_rounds"] == 3
    assert 0 < r["n_kept"] < n_all
