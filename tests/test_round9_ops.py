"""Round-9 operators: duplicate-span removal (keep-one excision) and
the end-to-end decontamination pipeline."""

from __future__ import annotations

import contextlib
import io


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_span_removal_keep_one_golden(spark):
    """Crafted near-dup fixture: the survivor (globally first
    occurrence: min doc_id, min pos) keeps the duplicated 8-token
    span; every other occurrence is excised."""
    from mapreduce_rust_spark.operators.dedup import duplicate_span_removal

    span = "a b c d e f g h"  # exactly RUN_SPAN_K tokens
    docs = _docs(
        spark,
        [
            (0, span + " i j"),  # survivor: keeps everything
            (1, span + " x y"),  # dup occurrence: span excised
            (2, "q r s t u v w q2 r2 s2"),  # unique: untouched
        ],
    )
    out = {
        r["doc_id"]: r
        for r in duplicate_span_removal(docs, "doc_id", "text").collect()
    }
    assert out[0]["n_tokens_removed"] == 0
    assert out[0]["cleaned_text"] == span + " i j"
    assert out[1]["n_tokens_removed"] == 8
    assert out[1]["cleaned_text"] == "x y"
    assert out[2]["n_tokens_removed"] == 0
    assert out[2]["cleaned_text"] == "q r s t u v w q2 r2 s2"


def test_span_removal_long_run_fully_excised(spark):
    """A 10-token duplicated run chains 3 overlapping anchors; the
    coverage union removes all 10 tokens from the non-survivor —
    including a doc that becomes EMPTY after excision."""
    from mapreduce_rust_spark.operators.dedup import duplicate_span_removal

    run = "a b c d e f g h i j"  # 10 tokens -> anchors at pos 1,2,3
    docs = _docs(
        spark,
        [
            (3, run + " tail1 tail2"),  # survivor
            (4, run),  # fully duplicated -> empty after excision
        ],
    )
    out = {
        r["doc_id"]: r
        for r in duplicate_span_removal(docs, "doc_id", "text").collect()
    }
    assert out[3]["n_tokens_removed"] == 0
    assert out[4]["n_tokens_removed"] == 10
    assert out[4]["cleaned_text"] == ""
    assert out[4]["n_tokens"] == 10


def test_span_removal_intra_doc_repeat_keeps_first(spark):
    """The same span twice WITHIN the survivor doc: only the globally
    first occurrence (min pos) survives; the second is excised."""
    from mapreduce_rust_spark.operators.dedup import duplicate_span_removal

    span = "a b c d e f g h"
    docs = _docs(
        spark,
        [
            (0, span + " mid " + span),  # pos 1..8 kept, pos 10..17 excised
            (1, span + " zz"),  # non-survivor: excised
        ],
    )
    out = {
        r["doc_id"]: r
        for r in duplicate_span_removal(docs, "doc_id", "text").collect()
    }
    assert out[0]["cleaned_text"] == span + " mid"
    assert out[0]["n_tokens_removed"] == 8
    assert out[1]["cleaned_text"] == "zz"


def test_span_removal_conserves_spans_corpus_wide(spark, sf_dir):
    """Every duplicated anchor's span survives somewhere: total
    removed tokens < total duplicated-token mass, and no doc removes
    more tokens than it has."""
    from mapreduce_rust_spark.operators.dedup import dedup_span_removal

    rows = dedup_span_removal(spark, sf_dir).collect()
    assert all(0 <= r["n_tokens_removed"] <= r["n_tokens"] for r in rows)
    # at least one doc must be untouched (the survivors)
    assert any(r["n_tokens_removed"] == 0 for r in rows)


def test_pipeline_decontaminate_census_consistency(spark, sf_dir):
    """3 pair rows; joint flags bounded by each side; any/all census
    consistent with the per-screen counts."""
    from mapreduce_rust_spark.plans.pipeline import pipeline_decontaminate

    rows = pipeline_decontaminate(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["flag_both"] <= min(r["flag_a"], r["flag_b"])
        assert r["only_screen_a"] <= r["flag_a"]
        assert r["flag_all"] <= r["flag_both"]
        assert r["flag_any"] >= max(r["flag_a"], r["flag_b"])
        assert r["flag_any"] <= r["n_corpus"]
        assert 0.0 <= r["overlap_jaccard"] <= 1.0


def test_calibration_curve_brier_identities(spark, sf_dir):
    """Brier/decomposition invariants: brier ∈ [0,1]; reliability and
    resolution non-negative; uncertainty = base(1−base) ≤ 0.25; the
    summary columns are constant across bins; bin means live in the
    bin's score range."""
    from mapreduce_rust_spark.operators.cleaning import (
        CALIB_BINS,
        features_calibration_curve,
    )

    rows = features_calibration_curve(spark, sf_dir).collect()
    assert rows
    assert len({(r["brier"], r["reliability"], r["resolution"], r["uncertainty"]) for r in rows}) == 1
    r0 = rows[0]
    assert 0.0 <= r0["brier"] <= 1.0
    assert r0["reliability"] >= 0.0 and r0["resolution"] >= 0.0
    assert 0.0 <= r0["uncertainty"] <= 0.25
    for r in rows:
        lo, hi = r["bin"] / CALIB_BINS, (r["bin"] + 1) / CALIB_BINS
        assert lo - 1e-9 <= r["mean_pred"] <= hi + 1e-9 or r["bin"] == CALIB_BINS - 1
        assert abs(r["gap"] - (r["mean_pred"] - r["frac_pos"])) < 2e-6


def test_cohens_kappa_confusion_identities(spark, sf_dir):
    """κ ≤ 1; the 2×2 cells partition n; p_o/p_e are probabilities;
    perfect-agreement sources (n10=n01=0) read κ=1 unless the
    marginals are degenerate (p_e=1 → κ≈0 by the floor)."""
    from mapreduce_rust_spark.operators.cleaning import features_cohens_kappa

    rows = features_cohens_kappa(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n11"] + r["n10"] + r["n01"] + r["n00"] == r["n"]
        assert 0.0 <= r["p_observed"] <= 1.0
        assert 0.0 <= r["p_chance"] <= 1.0 + 1e-9
        assert r["kappa"] <= 1.0 + 1e-9
        if r["n10"] == 0 and r["n01"] == 0 and r["p_chance"] < 0.999999:
            assert r["kappa"] >= 0.999


def test_corpus_concentration_lorenz_identities(spark, sf_dir):
    """Shares sum to 1, the Lorenz curve ends at 1, Gini ∈ [0,1),
    HHI ≥ 1/K (evenness bound), top_share = max share."""
    from mapreduce_rust_spark.operators.corpus import corpus_concentration

    rows = corpus_concentration(spark, sf_dir).collect()
    k = len(rows)
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    assert abs(rows[-1]["cum_share"] - 1.0) < 1e-5
    r0 = rows[0]
    assert 0.0 <= r0["gini"] < 1.0
    assert r0["hhi"] >= 1.0 / k - 1e-9
    assert abs(r0["top_share"] - max(r["share"] for r in rows)) < 2e-6
    # Lorenz curve is non-decreasing and below the diagonal ordering
    cums = [r["cum_share"] for r in rows]
    assert cums == sorted(cums)


def test_softdedup_effective_mass_matches_distinct_census(spark, sf_dir):
    """Σ per-source effective_docs = number of distinct normalized
    contents (each dup group contributes m·(1/m) = 1), and inflation
    ≥ 1 everywhere."""
    from mapreduce_rust_spark.operators.corpus import corpus_softdedup_weights
    from mapreduce_rust_spark.registry import queries

    rows = corpus_softdedup_weights(spark, sf_dir).collect()
    assert all(r["inflation"] >= 1.0 - 1e-9 for r in rows)
    assert all(r["effective_docs"] <= r["n_docs"] + 1e-9 for r in rows)
    n_distinct = queries()["dedup_exact_normalized"](spark, sf_dir).count()
    assert abs(sum(r["effective_docs"] for r in rows) - n_distinct) < 1e-3


def test_ivf_balance_audit_cost_bounds(spark, sf_dir):
    """All K cells reported; shares sum to 1; imbalance ≥ 1; expected
    probe cost ≥ balanced cost (Cauchy-Schwarz: Σn²/N ≥ N/K)."""
    from mapreduce_rust_spark.operators.similarity import (
        IVF_K,
        ann_ivf_balance_audit,
    )

    rows = ann_ivf_balance_audit(spark, sf_dir).collect()
    assert len(rows) == IVF_K
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    r0 = rows[0]
    assert r0["imbalance_factor"] >= 1.0 - 1e-9
    assert r0["expected_probe_cost"] >= r0["balanced_cost"] - 1e-6
    assert sum(r["n_vecs"] for r in rows) == r0["k_cells"] * r0["balanced_cost"]


def test_lsh_band_planner_scurve_identities(spark, sf_dir):
    """One row per divisor pair of N_HASHES; s50 matches the closed
    form (1/b)^(1/r); exactly one starred best; wider bands (more
    bands, shorter rows) always trade FN mass for FP mass — b=16,r=1
    has the max FP and min FN of the panel, b=1,r=16 the reverse."""
    from mapreduce_rust_spark.operators.dedup import (
        N_HASHES,
        dedup_lsh_band_planner,
    )

    rows = {r["b"]: r for r in dedup_lsh_band_planner(spark, sf_dir).collect()}
    assert sorted(rows) == [1, 2, 4, 8, 16]
    for b, r in rows.items():
        assert b * r["r"] == N_HASHES
        assert abs(r["s50"] - (1.0 / b) ** (1.0 / r["r"])) < 1e-3
        assert r["exp_fp_pairs"] >= 0 and r["exp_fn_pairs"] >= 0
    assert sum(r["is_best"] for r in rows.values()) == 1
    fps = [rows[b]["exp_fp_pairs"] for b in (1, 2, 4, 8, 16)]
    fns = [rows[b]["exp_fn_pairs"] for b in (1, 2, 4, 8, 16)]
    assert fps == sorted(fps)  # more bands -> more collisions -> more FP
    assert fns == sorted(fns, reverse=True)  # ... and fewer misses


def test_retention_decay_fit_identities(spark, sf_dir):
    """R² ∈ [0,1]; half-life consistent with the decay rate
    (ln2/decay) for decaying cohorts and NULL otherwise; predicted
    week-1 retention is a probability."""
    import math

    from mapreduce_rust_spark.plans.behavior import events_retention_decay_fit

    rows = events_retention_decay_fit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r["r2"] <= 1.0 + 1e-9
        assert 0.0 < r["pred_week1_retention"] <= 1.0 + 1e-6
        assert r["n_points"] >= 2
        if r["decay_rate"] > 0:
            assert r["half_life_weeks"] is not None
            assert (
                abs(r["half_life_weeks"] - math.log(2.0) / r["decay_rate"])
                < 0.01 * max(r["half_life_weeks"], 1.0)
            )
        else:
            assert r["half_life_weeks"] is None


def test_pipeline_decontaminate_bench_sides_broadcast(spark, sf_dir):
    """All three screens stream the corpus against broadcast eval-set
    structures — no cartesian product; the only SMJs allowed are the
    contamination-bounded flag-set full-outer joins."""
    from mapreduce_rust_spark.plans.pipeline import pipeline_decontaminate

    df = pipeline_decontaminate(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p
    assert p.count("BroadcastHashJoin") >= 5
    # SMJs are allowed only for the contamination-bounded frames (the
    # flag-set full-outer joins + the minhash candidate verify); the
    # exact count varies with whether the session's signature index is
    # already checkpointed, so bound it rather than pin it
    assert p.count("SortMergeJoin") <= 6
