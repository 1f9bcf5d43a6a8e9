"""Round-8 operators. Each test pins SEMANTICS (golden micro-cases /
analytic invariants); the registry oracle sweep pins exact values on
real data."""

from __future__ import annotations

from pyspark.sql import functions as F


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


WORDS = [f"w{i:02d}" for i in range(40)]


def test_substring_runs_reconstructs_isolated_run_length(spark):
    """Two docs sharing one isolated 20-token passage: the census must
    report exactly one run per doc of run_len 20 (bucket 16)."""
    from mapreduce_rust_spark.operators.dedup import substring_run_census

    shared = " ".join(WORDS[:20])
    uniq1 = " ".join(f"aa{i}" for i in range(12))
    uniq2 = " ".join(f"bb{i}" for i in range(12))
    docs = _mk_docs(
        spark,
        [(1, f"{uniq1} {shared}"), (2, f"{shared} {uniq2}")],
    )
    rows = substring_run_census(docs, "doc_id", "text").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["run_bucket"] == 16
    assert r["n_runs"] == 2  # one run in each doc
    assert r["n_docs"] == 2
    assert r["dup_tokens"] == 40  # 20 tokens duplicated in each doc


def test_substring_runs_no_duplication_is_empty(spark):
    from mapreduce_rust_spark.operators.dedup import substring_run_census

    docs = _mk_docs(
        spark,
        [
            (1, " ".join(f"aa{i}" for i in range(30))),
            (2, " ".join(f"bb{i}" for i in range(30))),
        ],
    )
    assert substring_run_census(docs, "doc_id", "text").count() == 0


def test_substring_runs_short_doc_overlap_below_anchor_is_invisible(spark):
    """A shared passage SHORTER than the anchor width produces no
    anchors and therefore no runs — the documented resolution floor."""
    from mapreduce_rust_spark.operators.dedup import (
        RUN_SPAN_K,
        substring_run_census,
    )

    shared = " ".join(WORDS[: RUN_SPAN_K - 1])  # 7 tokens < k=8
    docs = _mk_docs(
        spark,
        [
            (1, f"{shared} " + " ".join(f"aa{i}" for i in range(10))),
            (2, f"{shared} " + " ".join(f"bb{i}" for i in range(10))),
        ],
    )
    assert substring_run_census(docs, "doc_id", "text").count() == 0


def test_substring_runs_census_invariants_on_corpus(spark, sf_dir):
    """On the real corpus: buckets are powers of two >= anchor width,
    and every run's length lies in [bucket, 2*bucket)."""
    from mapreduce_rust_spark.operators.dedup import (
        RUN_SPAN_K,
        dedup_substring_runs,
    )

    rows = dedup_substring_runs(spark, sf_dir).collect()
    assert rows, "synthetic corpus carries near-dups; census must be non-empty"
    for r in rows:
        b = r["run_bucket"]
        assert b >= 2 ** (RUN_SPAN_K.bit_length() - 1)
        assert b & (b - 1) == 0, "bucket must be a power of two"
        # run_len in [bucket, 2*bucket) bounds the token mass
        assert r["n_runs"] * b <= r["dup_tokens"] < r["n_runs"] * 2 * b
        assert 1 <= r["n_docs"] <= 2 * r["n_runs"]


def test_pacf_lag1_equals_acf_lag1_and_bounded(spark, sf_dir):
    """PACF(1) == ACF(1) by definition; all values in [-1, 1]."""
    from mapreduce_rust_spark.plans.timeseries import PACF_MAX_LAG, ts_pacf

    rows = {r["lag"]: r["pacf"] for r in ts_pacf(spark, sf_dir).collect()}
    assert sorted(rows) == list(range(1, PACF_MAX_LAG + 1))
    for v in rows.values():
        assert v is None or -1.0001 <= v <= 1.0001


def test_pacf_durbin_levinson_matches_numpy(spark, sf_dir):
    """Golden: solve the Yule-Walker system directly with numpy from
    the same ACF and compare against the unrolled recursion."""
    import numpy as np
    from mapreduce_rust_spark.plans.timeseries import PACF_MAX_LAG, ts_pacf
    from mapreduce_rust_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    pdf = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
        .orderBy("h")
        .toPandas()
    )
    x = pdf["n"].to_numpy()
    hs = pdf["h"].astype("int64").to_numpy() // 3_600_000_000_000
    d = x - x.mean()
    g0 = float((d * d).sum())
    pos = {h: i for i, h in enumerate(hs)}
    rho = []
    for k in range(1, PACF_MAX_LAG + 1):
        s = sum(
            d[i] * d[pos[h - k]] for i, h in enumerate(hs) if (h - k) in pos
        )
        rho.append(round(s / g0, 6))
    got = {r["lag"]: r["pacf"] for r in ts_pacf(spark, sf_dir).collect()}
    # Yule-Walker solve per k: phi_kk is the last coefficient
    for k in range(1, PACF_MAX_LAG + 1):
        r = np.array(rho[:k])
        toep = np.array(
            [[(rho[abs(i - j) - 1] if i != j else 1.0) for j in range(k)] for i in range(k)]
        )
        phi = np.linalg.solve(toep, r)
        assert abs(got[k] - phi[-1]) < 5e-4, (k, got[k], phi[-1])


def test_sequential_obf_boundary_shrinks_and_final_look(spark, sf_dir):
    """The OBF boundary must be monotonically non-increasing in the
    information fraction and equal OBF_C at the final look (t=1)."""
    from mapreduce_rust_spark.plans.behavior import OBF_C, ab_sequential_obf

    rows = ab_sequential_obf(spark, sf_dir).orderBy("day").collect()
    assert rows
    bounds = [r["boundary"] for r in rows]
    assert bounds == sorted(bounds, reverse=True)
    assert abs(rows[-1]["t_frac"] - 1.0) < 1e-9
    assert abs(rows[-1]["boundary"] - OBF_C) < 1e-3
    for r in rows:
        assert (r["crossed"] is None) == (r["z"] is None)


def test_cramers_v_in_unit_interval(spark, sf_dir):
    from mapreduce_rust_spark.operators.profiling import table_cramers_v

    r = table_cramers_v(spark, sf_dir).collect()[0]
    assert 0.0 <= r["cramers_v"] <= 1.0
    assert r["chi2"] >= 0.0
    assert r["n_types"] >= 2 and r["n_dows"] >= 2


def test_charset_shares_sum_to_one(spark, sf_dir):
    from mapreduce_rust_spark.operators.text_analysis import text_charset_profile

    for r in text_charset_profile(spark, sf_dir).collect():
        total = (
            r["lower_share"]
            + r["upper_share"]
            + r["digit_share"]
            + r["space_share"]
            + r["other_share"]
        )
        assert abs(total - 1.0) < 1e-4, r
        assert r["n_chars"] > 0


def test_theta_forecast_matches_numpy_golden(spark, sf_dir):
    """Golden: replay the theta decomposition in numpy from the same
    daily series and compare slope/level/forecast."""
    from mapreduce_rust_spark.plans.timeseries import (
        THETA_ALPHA,
        THETA_HORIZON,
        forecast_theta,
    )
    from mapreduce_rust_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.avg("value").alias("y"))
        .orderBy("event_type", "day")
        .toPandas()
    )
    got = {r["event_type"]: r for r in forecast_theta(spark, sf_dir).collect()}
    for et, grp in daily.groupby("event_type"):
        y = grp.sort_values("day")["y"].to_list()
        n = len(y)
        if n < 2:
            assert et not in got
            continue
        st = sum(range(1, n + 1))
        sy = sum(y)
        sty = sum(t * v for t, v in enumerate(y, start=1))
        stt = sum(t * t for t in range(1, n + 1))
        b = (n * sty - st * sy) / (n * stt - st * st)
        a = (sy - b * st) / n
        s = 2.0 * y[0] - (a + b)
        for t in range(2, n + 1):
            s = THETA_ALPHA * (2.0 * y[t - 1] - (a + b * t)) + (1 - THETA_ALPHA) * s
        fc = 0.5 * s + 0.5 * (a + b * (n + THETA_HORIZON))
        assert abs(got[et]["slope"] - b) < 1e-3
        assert abs(got[et]["forecast"] - fc) < 1e-3


def test_nelson_aalen_brackets_kaplan_meier(spark, sf_dir):
    """Analytic invariant: exp(-H) >= S_KM pointwise (each KM factor
    1-x <= exp(-x)), hazard is nondecreasing, and both estimators
    agree within a few percent on dense grids."""
    from mapreduce_rust_spark.plans.behavior import (
        survival_kaplan_meier,
        survival_nelson_aalen,
    )

    km = {r["horizon_days"]: r for r in survival_kaplan_meier(spark, sf_dir).collect()}
    na = {r["horizon_days"]: r for r in survival_nelson_aalen(spark, sf_dir).collect()}
    assert set(km) == set(na)
    prev_h = 0.0
    for h in sorted(na):
        assert na[h]["cum_hazard"] >= prev_h - 1e-9
        prev_h = na[h]["cum_hazard"]
        assert na[h]["s_fleming_harrington"] >= km[h]["survival"] - 1e-6
        assert na[h]["n_at_risk"] == km[h]["n_at_risk"]
        assert na[h]["events_so_far"] == km[h]["events_so_far"]


def test_fellegi_sunter_decision_ordering(spark, sf_dir):
    """Links must out-score possibles must out-score non-links, with
    agreement rates monotone in the same direction for every field,
    and the thresholds actually separating the classes."""
    from mapreduce_rust_spark.operators.linkage import (
        FS_LOWER,
        FS_UPPER,
        linkage_fellegi_sunter,
    )

    rows = {r["decision"]: r for r in linkage_fellegi_sunter(spark, sf_dir).collect()}
    assert "link" in rows and "nonlink" in rows
    assert rows["link"]["avg_score"] >= FS_UPPER
    assert rows["nonlink"]["avg_score"] < FS_LOWER
    if "possible" in rows:
        assert FS_LOWER <= rows["possible"]["avg_score"] < FS_UPPER
    assert rows["link"]["name_agree_rate"] > rows["nonlink"]["name_agree_rate"]


def test_fellegi_sunter_weights_signs():
    from mapreduce_rust_spark.operators.linkage import _fs_weights

    for field, (w_agree, w_disagree) in _fs_weights().items():
        assert w_agree > 0 > w_disagree, field


def test_session_variables_round_trip(spark, sf_dir):
    """The derived variable must hold the actual data-driven value
    after the query ran, and re-running is idempotent."""
    from mapreduce_rust_spark.plans.sqlface import (
        SQLVAR_TOP_N,
        sql_session_variables,
    )

    out1 = sql_session_variables(spark, sf_dir).collect()
    out2 = sql_session_variables(spark, sf_dir).collect()
    assert out1 == out2
    assert 0 < len(out1) <= SQLVAR_TOP_N
    v = spark.sql("SELECT mrs_avg_price AS p").collect()[0]["p"]
    assert v is not None and v > 0


def test_lsh_incremental_topology_and_threshold(spark, sf_dir):
    """Matches must be batch(odd) -> corpus(even) only, one row per
    flagged batch doc, est_sim at or above the policy threshold, and
    every flagged pair must also exist in the full-corpus LSH
    candidate set (the incremental view is a subset by construction)."""
    from mapreduce_rust_spark.operators.dedup import (
        INC_LSH_THRESHOLD,
        dedup_lsh_incremental,
        dedup_minhash_lsh,
    )

    rows = dedup_lsh_incremental(spark, sf_dir).collect()
    assert rows, "synthetic corpus has cross-parity near-dups"
    ids = [r["batch_id"] for r in rows]
    assert len(ids) == len(set(ids)), "one best match per batch doc"
    full = {
        (min(r["d1"], r["d2"]), max(r["d1"], r["d2"]))
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    for r in rows:
        assert r["batch_id"] % 2 == 1 and r["corpus_id"] % 2 == 0
        assert r["est_sim"] >= INC_LSH_THRESHOLD
        key = (min(r["batch_id"], r["corpus_id"]), max(r["batch_id"], r["corpus_id"]))
        assert key in full, key


def test_poisson_rate_test_recomputes(spark, sf_dir):
    """Golden replay: recompute z from the reported counts and the
    fixed split; verify the flag agrees with the reported z."""
    import math

    from mapreduce_rust_spark.plans.behavior import (
        PWR_Z_ALPHA,
        RATE_SPLIT_DAY,
        events_poisson_rate_test,
    )
    from mapreduce_rust_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    span = ev.agg(
        (F.datediff(F.date_trunc("day", F.max("ts")),
                    F.date_trunc("day", F.min("ts"))) + 1).alias("s")
    ).collect()[0]["s"]
    t1, t2 = float(RATE_SPLIT_DAY), float(span - RATE_SPLIT_DAY)
    for r in events_poisson_rate_test(spark, sf_dir).collect():
        r1, r2 = r["c1"] / t1, r["c2"] / t2
        z = (r1 - r2) / math.sqrt(max(r["c1"] / t1**2 + r["c2"] / t2**2, 1e-12))
        assert abs(r["z"] - z) < 1e-3
        assert r["rate_changed"] == (abs(r["z"]) > PWR_Z_ALPHA)


def test_scd2_apply_stitches_boundary_runs(spark, sf_dir):
    """The incremental result must equal the full-history rebuild
    (row-for-row), and must contain NO same-type adjacent duplicate
    rows per user — the naive-append failure the stitch prevents."""
    from mapreduce_rust_spark.plans.behavior import scd2_compress_states
    from mapreduce_rust_spark.plans.incremental import incremental_scd2_apply

    inc = incremental_scd2_apply(spark, sf_dir)
    full = scd2_compress_states(spark, sf_dir)
    cols = ["user_id", "event_type", "valid_from", "valid_to", "n_events"]
    a = sorted(map(tuple, inc.select(*cols).collect()))
    b = sorted(map(tuple, full.select(*cols).collect()))
    assert a == b
    by_user: dict = {}
    for r in a:
        by_user.setdefault(r[0], []).append(r)
    for rows in by_user.values():
        rows.sort(key=lambda r: r[2])
        for prev, nxt in zip(rows, rows[1:]):
            if prev[1] == nxt[1]:
                # same type twice in a row is only legal if another
                # type's run separates them in time
                assert prev[3] <= nxt[2]


def test_streaming_left_outer_subsumes_inner(spark, sf_dir):
    """Within the decidable domain: attributed value must equal the
    inner join's rollup for the same users, and unattributed counts
    must be positive somewhere (the whole point of OUTER)."""
    from mapreduce_rust_spark.streaming.queries import (
        streaming_join_left_outer,
        streaming_stream_join,
    )

    outer = {r["user_id"]: r for r in streaming_join_left_outer(spark, sf_dir).collect()}
    assert outer and any(r["n_unattributed"] > 0 for r in outer.values())
    inner = {r["user_id"]: r for r in streaming_stream_join(spark, sf_dir).collect()}
    for uid, r in outer.items():
        matched = r["n_rows"] - r["n_unattributed"]
        if matched:
            assert uid in inner
            # inner covers ALL clicks; outer only the decidable domain
            assert inner[uid]["n_attributed"] >= matched
        assert r["n_rows"] >= r["n_unattributed"] >= 0


def test_conductance_bounds_and_vol_cut_sanity(spark, sf_dir):
    from mapreduce_rust_spark.operators.graph import graph_conductance

    rows = graph_conductance(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["conductance"] <= 1.0 + 1e-9
        assert r["cut"] <= r["vol"], "cut endpoints are a subset of volume"
        assert r["vol"] > 0


def test_granger_matches_numpy_ols(spark, sf_dir):
    """Golden: refit both regressions with numpy lstsq and compare F."""
    import numpy as np

    from mapreduce_rust_spark.plans.timeseries import ts_granger_lite
    from mapreduce_rust_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("t"), F.date_trunc("day", "ts").alias("day"))
        .agg(F.avg("value").alias("v"))
        .toPandas()
    )
    series = {
        t: grp.sort_values("day")["v"].to_numpy()
        for t, grp in daily.groupby("t")
    }
    got = {(r["cause"], r["effect"]): r for r in ts_granger_lite(spark, sf_dir).collect()}
    checked = 0
    for (cause, effect), r in got.items():
        x, y = series[cause], series[effect]
        n = min(len(x), len(y))
        yy, u, v = y[1:n], y[: n - 1], x[: n - 1]
        if r["f_stat"] is None or len(yy) < 4:
            continue
        ones = np.ones_like(u)
        rss1 = np.linalg.lstsq(np.c_[ones, u], yy, rcond=None)[1][0]
        rss2_res = np.linalg.lstsq(np.c_[ones, u, v], yy, rcond=None)[1]
        rss2 = rss2_res[0] if len(rss2_res) else 0.0
        f = (rss1 - rss2) / (rss2 / (len(yy) - 3))
        assert abs(r["f_stat"] - f) < max(0.01, 0.01 * abs(f)), (cause, effect, r["f_stat"], f)
        checked += 1
    assert checked >= 10


def test_rouge_l_golden_and_bounds(spark, sf_dir):
    """Golden: recompute LCS in pure Python from the same clamped
    token lists for every reported pair."""
    from mapreduce_rust_spark.operators.dedup import (
        ROUGE_PREFIX_TOKENS,
        dedup_rouge_l_verified,
    )
    from mapreduce_rust_spark.functions.text import normalize_text, tokenize_whitespace
    from mapreduce_rust_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    rows = dedup_rouge_l_verified(spark, sf_dir).collect()
    assert rows
    docs = dict(
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.slice(
                tokenize_whitespace(normalize_text(F.col("text"))),
                1,
                ROUGE_PREFIX_TOKENS,
            ).alias("tok"),
        )
        .rdd.map(lambda r: (r["doc_id"], r["tok"]))
        .collect()
    )

    def lcs(xs, ys):
        row = [0] * (len(ys) + 1)
        for x in xs:
            diag = 0
            for j in range(1, len(ys) + 1):
                cur = row[j]
                row[j] = diag + 1 if x == ys[j - 1] else max(row[j], row[j - 1])
                diag = cur
        return row[-1]

    for r in rows:
        a, b = docs[r["d1"]], docs[r["d2"]]
        want = lcs(a, b)
        assert r["lcs_len"] == want, (r["d1"], r["d2"], r["lcs_len"], want)
        assert 0.0 <= r["rouge_l_f"] <= 1.0


def test_neyman_allocation_conservation_and_shift(spark, sf_dir):
    """Allocations stay within budget (floor rounding), shifts sum to
    ~0, and a higher-variance stratum never gets less than a lower-
    variance stratum of the same size would."""
    from mapreduce_rust_spark.operators.corpus import (
        NEYMAN_BUDGET,
        sample_neyman_allocation,
    )

    rows = sample_neyman_allocation(spark, sf_dir).collect()
    assert rows
    assert sum(r["alloc_neyman"] for r in rows) <= NEYMAN_BUDGET
    assert sum(r["alloc_proportional"] for r in rows) <= NEYMAN_BUDGET
    for r in rows:
        assert r["alloc_shift"] == r["alloc_neyman"] - r["alloc_proportional"]
        assert r["alloc_neyman"] >= 0 and r["alloc_proportional"] >= 0


def test_winnowing_guarantee_on_constructed_docs(spark):
    """MOSS guarantee: two docs sharing a run of >= w+k-1 tokens must
    share at least one fingerprint; disjoint docs share none."""
    from mapreduce_rust_spark.operators.text_analysis import WIN_K, WIN_W
    from mapreduce_rust_spark.functions.text import hash64, normalize_text, tokenize_whitespace, word_shingles
    from pyspark.sql import functions as F

    shared = " ".join(f"tok{i}" for i in range(WIN_K + WIN_W - 1))
    docs = spark.createDataFrame(
        [
            (1, f"{shared} " + " ".join(f"aa{i}" for i in range(10))),
            (2, " ".join(f"bb{i}" for i in range(10)) + f" {shared}"),
            (3, " ".join(f"cc{i}" for i in range(20))),
        ],
        "doc_id bigint, text string",
    )
    h = F.transform(word_shingles(F.col("text"), WIN_K), lambda s: hash64(s))
    hc = F.col("h")
    mins = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(hc) - F.lit(WIN_W - 1)),
            lambda s: F.array_min(F.slice(hc, s, WIN_W)),
        )
    )
    fps = {
        r["doc_id"]: set(r["fps"])
        for r in docs.select("doc_id", h.alias("h"))
        .filter(F.size("h") >= WIN_W)
        .select("doc_id", mins.alias("fps"))
        .collect()
    }
    assert fps[1] & fps[2], "shared run must leave a common fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_markov_order2_gain_nonnegative(spark, sf_dir):
    """Per context, the order-2 model can never fit its own training
    trigrams worse than order-1: G2 >= 0 everywhere (MLE nesting)."""
    from mapreduce_rust_spark.plans.behavior import events_markov_order2

    rows = events_markov_order2(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["g2"] >= -1e-6, r
        assert r["ll_order2"] >= r["ll_order1"] - 1e-6
        assert r["n_transitions"] > 0
