"""Round-8 continuation operators. Each test pins SEMANTICS (golden
micro-cases / analytic invariants); the registry oracle sweep pins
exact values on real data."""

from __future__ import annotations

from pyspark.sql import functions as F


def _arm(spark, rows):
    return spark.createDataFrame(rows, "qid bigint, doc_id bigint, rank int")


def test_rrf_both_arms_sum(spark):
    """A doc ranked in BOTH arms scores 1/(k+rd) + 1/(k+rl)."""
    from mapreduce_rust_spark.operators.corpus import rrf_fuse

    dense = _arm(spark, [(1, 10, 1)])
    lex = _arm(spark, [(1, 10, 2)])
    r = rrf_fuse(dense, lex, k=60, topk=5).collect()
    assert len(r) == 1
    got = r[0]
    assert got["r_dense"] == 1 and got["r_lex"] == 2
    assert abs(got["rrf"] - (1 / 61 + 1 / 62)) < 1e-6


def test_rrf_single_arm_contributes_zero_for_absent(spark):
    from mapreduce_rust_spark.operators.corpus import rrf_fuse

    dense = _arm(spark, [(1, 10, 1)])
    lex = _arm(spark, [(1, 20, 1)])
    rows = {r["doc_id"]: r for r in rrf_fuse(dense, lex, k=60, topk=5).collect()}
    assert rows[10]["r_lex"] is None
    assert rows[20]["r_dense"] is None
    assert abs(rows[10]["rrf"] - 1 / 61) < 1e-6
    assert abs(rows[20]["rrf"] - 1 / 61) < 1e-6


def test_rrf_consensus_beats_single_strong_arm(spark):
    """The canonical RRF property: a doc ranked moderately in BOTH
    arms outranks a doc ranked #1 in only one arm (1/62 + 1/63 >
    1/61), and ties in fused score break on doc_id."""
    from mapreduce_rust_spark.operators.corpus import rrf_fuse

    dense = _arm(spark, [(1, 10, 1), (1, 30, 2)])
    lex = _arm(spark, [(1, 20, 1), (1, 30, 3)])
    out = rrf_fuse(dense, lex, k=60, topk=5).collect()
    assert [r["doc_id"] for r in out] == [30, 10, 20]
    assert out[0]["rank"] == 1
    # 10 and 20 tie at 1/61 → doc_id ascending
    assert out[1]["rrf"] == out[2]["rrf"]


def test_minhash_decon_flagged_rows_are_verified_near_dups(spark, sf_dir):
    """Every flagged row must satisfy the screen's contract: corpus
    doc outside the bench slice, bench doc inside it, and the reported
    jaccard equals the TRUE 3-gram Jaccard of the pair (recomputed
    here from shingle sets) at or above the flag threshold."""
    from mapreduce_rust_spark.operators.cleaning import (
        DECON_MH_CAP,
        DECON_MH_HOLDOUT,
        DECON_MH_THR,
        corpus_decontaminate_minhash,
    )
    from mapreduce_rust_spark.operators.dedup import shingle_sets
    from mapreduce_rust_spark.sources.tables import load_table

    rows = corpus_decontaminate_minhash(spark, sf_dir).collect()
    assert rows, "synthetic corpus is known to contain bench near-dups"
    sh = {
        r["doc_id"]: set()
        for r in rows
    }
    wanted = {r["doc_id"] for r in rows} | {r["bench_id"] for r in rows}
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isin([int(x) for x in wanted])
    )
    for rec in shingle_sets(docs, "doc_id", "text", k=3).collect():
        sh.setdefault(rec["doc_id"], set()).add(rec["s"])
    for r in rows:
        assert r["bench_id"] % DECON_MH_HOLDOUT == 0 and r["bench_id"] < DECON_MH_CAP
        assert not (r["doc_id"] % DECON_MH_HOLDOUT == 0 and r["doc_id"] < DECON_MH_CAP)
        a, b = sh[r["doc_id"]], sh[r["bench_id"]]
        true_j = len(a & b) / len(a | b)
        assert r["jaccard"] >= DECON_MH_THR
        assert abs(r["jaccard"] - true_j) < 1e-3
        assert r["n_shared"] == len(a & b)


def test_minhash_decon_corpus_never_shuffles(spark, sf_dir):
    """Both probe structures (band index, bench shingles) broadcast;
    candidate-bounded frames broadcast into the size joins — the plan
    must contain no sort-merge join and no cartesian."""
    import io
    import contextlib

    from mapreduce_rust_spark.operators.cleaning import corpus_decontaminate_minhash

    df = corpus_decontaminate_minhash(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "SortMergeJoin" not in p
    assert "Cartesian" not in p
    assert "BroadcastHashJoin" in p


def _xy(spark, rows):
    return spark.createDataFrame(rows, "g string, x double, i int, y double")


def test_xicor_perfect_monotone_matches_closed_form(spark):
    """No-ties strictly increasing y=f(x): ξ = (n−2)/(n+1) exactly."""
    from mapreduce_rust_spark.operators.profiling import xicor_by_group

    n = 50
    rows = [("a", float(i), i, float(i) * 2.0 + 1.0) for i in range(n)]
    r = xicor_by_group(_xy(spark, rows), "g", ["x", "i"], "y").collect()[0]
    assert r["n"] == n
    assert abs(r["xi"] - (n - 2) / (n + 1)) < 1e-6


def test_xicor_detects_nonmonotone_function_pearson_misses(spark):
    """A noiseless symmetric parabola: Pearson = 0 by symmetry but ξ
    is high — the screen's selling point over corr_matrix."""
    from mapreduce_rust_spark.operators.profiling import xicor_by_group

    n = 400
    rows = [("p", float(i), i, (i - (n - 1) / 2.0) ** 2) for i in range(n)]
    df = _xy(spark, rows)
    xi = xicor_by_group(df, "g", ["x", "i"], "y").collect()[0]["xi"]
    pearson = df.select(F.corr("x", "y")).collect()[0][0]
    assert abs(pearson) < 0.01
    assert xi > 0.8


def test_xicor_independent_is_near_zero_and_bounded(spark):
    """y hash-scrambled w.r.t. x (no estimable local structure):
    ξ ≈ 0 — unlike the parabola case above."""
    import hashlib

    from mapreduce_rust_spark.operators.profiling import xicor_by_group

    n = 500
    rows = [
        (
            "r",
            float(i),
            i,
            float(int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)),
        )
        for i in range(n)
    ]
    xi = xicor_by_group(_xy(spark, rows), "g", ["x", "i"], "y").collect()[0]["xi"]
    assert abs(xi) < 0.15


def test_stump_perfectly_separable_gain_equals_parent_gini(spark):
    """x < 100 all y=0, x > 200 all y=1 (balanced): the best split's
    children are pure, so gain = parent Gini = 0.5."""
    from mapreduce_rust_spark.operators.cleaning import stump_search

    rows = [("f", float(i), 0) for i in range(50)] + [
        ("f", 200.0 + i, 1) for i in range(50)
    ]
    long = spark.createDataFrame(rows, "feature string, x double, y int")
    r = stump_search(long).collect()[0]
    assert r["n_left"] == 50 and r["n_right"] == 50
    assert abs(r["gini_gain"] - 0.5) < 1e-6
    assert 49.0 < r["threshold"] < 201.0


def test_stump_constant_feature_degenerate_range_no_error(spark):
    """A constant feature must hit the width floor (no ANSI divide-
    by-zero) and produce no split row (single occupied bin)."""
    from mapreduce_rust_spark.operators.cleaning import stump_search

    rows = [("c", 7.0, i % 2) for i in range(40)]
    long = spark.createDataFrame(rows, "feature string, x double, y int")
    assert stump_search(long).count() == 0


def test_stump_uninformative_feature_gain_near_zero(spark):
    """y independent of x: every candidate split has ~0 gain."""
    from mapreduce_rust_spark.operators.cleaning import stump_search

    rows = [("u", float(i), i % 2) for i in range(200)]
    long = spark.createDataFrame(rows, "feature string, x double, y int")
    r = stump_search(long).collect()[0]
    assert r["gini_gain"] < 0.01


def test_seq_pattern_gap_constraint_and_nonadjacency(spark, tmp_path):
    """a→c counted even with b between them (non-adjacent); a pair
    outside the gap window is NOT counted; support is per-user
    (a user exhibiting a pattern twice counts once)."""
    import datetime as dt

    from mapreduce_rust_spark.plans import behavior as B

    t0 = dt.datetime(2024, 1, 1)
    # types must come from the fixed SEQ_TYPES alphabet — the operator
    # filters to it in both engines (vocabulary-drift guard)
    rows = [
        # user 1: view, click, purchase within 5 min —
        # view→purchase is non-adjacent but inside the gap
        (1, t0, "view"),
        (1, t0 + dt.timedelta(minutes=2), "click"),
        (1, t0 + dt.timedelta(minutes=4), "purchase"),
        # user 1 again: second view→click pair (must not double-count)
        (1, t0 + dt.timedelta(hours=2), "view"),
        (1, t0 + dt.timedelta(hours=2, minutes=1), "click"),
        # user 2: view then purchase 30 min apart — outside the gap
        (2, t0, "view"),
        (2, t0 + dt.timedelta(minutes=30), "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )
    p = tmp_path / "events.parquet"
    ev.write.mode("overwrite").parquet(str(p))
    # load_table expects <dir>/events.parquet
    out = B.events_seq_pattern_support(spark, str(tmp_path))
    got = {(r["ea"], r["eb"]): r for r in out.collect()}
    assert got[("view", "purchase")]["n_users"] == 1  # non-adjacent, in gap
    assert got[("view", "click")]["n_users"] == 1  # once despite two pairs
    # tightest qualifying view→click gap is the 1-minute second pair
    assert abs(got[("view", "click")]["avg_min_gap_s"] - 60.0) < 0.01
    assert ("click", "view") not in got  # order matters


def test_conformal_coverage_meets_target_per_group(spark, sf_dir):
    """The split-conformal guarantee: per-group test coverage of
    ŷ ± q̂ should sit at or above ~1−α (in expectation; loose lower
    bound for finite samples), and the reported geometry must be
    self-consistent (width = 2·q̂, target = 0.9)."""
    from mapreduce_rust_spark.operators.cleaning import (
        CONF_ALPHA,
        features_conformal_interval,
    )

    rows = features_conformal_interval(spark, sf_dir).collect()
    assert len(rows) == 5  # one per order priority
    for r in rows:
        assert r["target"] == 1.0 - CONF_ALPHA
        assert r["qhat"] > 0
        assert abs(r["width"] - 2 * r["qhat"]) < 2e-4  # independent rounding
        # per-group finite-sample noise at the sf0.001 smoke scale is
        # ±3-5% (n_cal ≈ 100/group); the guarantee is in expectation
        assert r["coverage"] >= 0.80
        assert r["n_cal"] > 50 and r["n_test"] > 50
    mean_cov = sum(r["coverage"] for r in rows) / len(rows)
    assert mean_cov >= 0.85


def test_fdr_bh_matches_textbook_recomputation(spark, sf_dir):
    """Recompute the BH step-up from the reported p-values in plain
    Python and compare: q_i = min_{j>=i}(p_j*m/j) capped at 1, q
    monotone in rank, rejection exactly q <= alpha."""
    from mapreduce_rust_spark.plans.behavior import FDR_ALPHA, ab_fdr_bh

    rows = ab_fdr_bh(spark, sf_dir).orderBy("rank").collect()
    assert rows
    m = rows[0]["m_tests"]
    assert m == len(rows)
    ps = [r["p_value"] for r in rows]
    assert ps == sorted(ps)  # ranked ascending
    # textbook reversed running min
    qraw = [p * m / (i + 1) for i, p in enumerate(ps)]
    expect = []
    best = float("inf")
    for qr in reversed(qraw):
        best = min(best, qr)
        expect.append(min(best, 1.0))
    expect.reverse()
    for r, e in zip(rows, expect):
        assert abs(r["q_value"] - e) < 1e-4  # p rounded at 1e-6 in output
        if abs(e - FDR_ALPHA) > 1e-3:  # away from the decision boundary
            assert r["rejected"] == (e <= FDR_ALPHA)
        assert r["q_value"] <= 1.0 + 1e-9
    qs = [r["q_value"] for r in rows]
    assert qs == sorted(qs)  # BH q is monotone in rank


def test_cem_att_is_treated_weighted_mean_of_stratum_diffs(spark, sf_dir):
    """ATT must equal sum(w_treated * diff) over matched strata, the
    weights must sum to 1, and every stratum must have both arms."""
    from mapreduce_rust_spark.plans.behavior import events_cem_att

    rows = events_cem_att(spark, sf_dir).collect()
    assert rows
    w_sum = sum(r["w_treated"] for r in rows)
    assert abs(w_sum - 1.0) < 1e-4
    att = rows[0]["att"]
    assert all(abs(r["att"] - att) < 1e-9 for r in rows)
    recomputed = sum(r["w_treated"] * r["diff"] for r in rows)
    assert abs(att - recomputed) < 1e-2  # rounding at 1e-6 per term
    for r in rows:
        assert r["n_treated"] > 0 and r["n_control"] > 0
        assert abs(r["diff"] - (r["y_t"] - r["y_c"])) < 2e-6


def _auc(spark, rows):
    from mapreduce_rust_spark.operators.text_analysis import auc_by_group

    df = spark.createDataFrame(rows, "g string, s double, y int")
    out = auc_by_group(df, "g", "s", "y").collect()
    return {r["g"]: r["auc"] for r in out}


def test_auc_perfect_reversed_and_tied(spark):
    """AUC = 1 for perfect separation, 0 for perfectly reversed,
    exactly 0.5 when every score ties (midrank correctness)."""
    rows = (
        [("perf", float(i), 1 if i >= 10 else 0) for i in range(20)]
        + [("rev", float(i), 1 if i < 10 else 0) for i in range(20)]
        + [("tied", 7.0, i % 2) for i in range(20)]
    )
    got = _auc(spark, rows)
    assert got["perf"] == 1.0
    assert got["rev"] == 0.0
    assert abs(got["tied"] - 0.5) < 1e-9


def test_auc_matches_pair_counting(spark):
    """AUC must equal P(score_pos > score_neg) + 0.5 P(tie) computed
    by brute-force pair counting on a small mixed fixture."""
    import itertools

    vals = [(0.1, 0), (0.4, 0), (0.4, 1), (0.7, 0), (0.9, 1), (0.9, 1), (0.2, 1)]
    rows = [("m", s, y) for s, y in vals]
    got = _auc(spark, rows)["m"]
    pos = [s for s, y in vals if y == 1]
    neg = [s for s, y in vals if y == 0]
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p, n in itertools.product(pos, neg)
    )
    assert abs(got - wins / (len(pos) * len(neg))) < 1e-6


def test_rrf_topk_truncates_per_query(spark):
    from mapreduce_rust_spark.operators.corpus import rrf_fuse

    dense = _arm(spark, [(1, d, d) for d in range(1, 8)])
    lex = _arm(spark, [(2, d, d) for d in range(1, 8)])
    out = rrf_fuse(dense, lex, k=60, topk=3)
    cnt = out.groupBy("query_id").count().collect()
    assert {r["query_id"]: r["count"] for r in cnt} == {1: 3, 2: 3}
