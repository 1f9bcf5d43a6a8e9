"""Round-10 additions: corpus-prep v2 (span excision composed into the
funnel), the quality-classifier distillation family, and the
session-memoized shared index artifacts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_prepare_corpus_v2_identities(spark, sf_dir):
    """Per-language report: counts positive, token budget and attrition
    non-negative, avg_quality within the composite score's [0, 1]
    range, and the attrition is consistent with the standalone span
    slug (v2 excises over exact-dedup survivors only, so its removed
    mass is bounded by the full-corpus excision census)."""
    from mapreduce_rust_spark.operators.dedup import dedup_span_removal
    from mapreduce_rust_spark.plans.pipeline import pipeline_prepare_corpus_v2

    rows = pipeline_prepare_corpus_v2(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_docs"] >= 1
        assert r["total_tokens"] >= 0
        assert r["tokens_removed"] >= 0
        assert 0.0 < r["avg_quality"] <= 1.0 + 1e-9
    total_removed_v2 = sum(r["tokens_removed"] for r in rows)
    census = dedup_span_removal(spark, sf_dir).agg(
        F.sum("n_tokens_removed").alias("t")
    ).collect()[0]["t"]
    assert total_removed_v2 <= census


def test_quality_distill_model_identities(spark, sf_dir):
    """Fixed-size model: at most QC_BUCKETS+1 rows, intercept present,
    support counts consistent (positives never exceed support; support
    never exceeds the train-split size)."""
    from mapreduce_rust_spark.operators.cleaning import (
        QC_BUCKETS,
        QC_TRAIN_MOD,
        features_quality_distill,
    )
    from mapreduce_rust_spark.sources.tables import load_table

    rows = features_quality_distill(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 2 * QC_BUCKETS + 1
    by_bucket = {r["bucket"]: r for r in rows}
    assert -1 in by_bucket  # intercept trained on every doc
    n_train = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % QC_TRAIN_MOD) != 0)
        .count()
    )
    for r in rows:
        assert 0 <= r["n_pos_docs"] <= r["n_train_docs"] <= n_train
    assert by_bucket[-1]["n_train_docs"] == n_train


def test_quality_classifier_report_identities(spark, sf_dir):
    """Per-source rollup covers the whole scored corpus; every rate is
    a probability; agreement is consistent with the pos rates (perfect
    agreement iff the rates coincide on every source)."""
    from mapreduce_rust_spark.operators.cleaning import corpus_quality_classifier
    from mapreduce_rust_spark.sources.tables import load_table

    rows = corpus_quality_classifier(spark, sf_dir).collect()
    assert rows
    n_corpus = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .count()
    )
    assert sum(r["n_docs"] for r in rows) == n_corpus
    for r in rows:
        for c in ("mean_score", "student_pos_rate", "teacher_pos_rate", "agreement"):
            assert -1e-9 <= r[c] <= 1.0 + 1e-9
        # |student_pos - teacher_pos| <= disagreement mass
        assert (
            abs(r["student_pos_rate"] - r["teacher_pos_rate"])
            <= 1.0 - r["agreement"] + 1e-4
        )


def test_session_memoized_indexes_are_shared(spark, sf_dir):
    """The round's memoization work: repeated calls return the SAME
    cached frame object (one build per session per dataset)."""
    from mapreduce_rust_spark.operators.cleaning import qc_beta_index
    from mapreduce_rust_spark.operators.similarity import (
        ivf_assign_index,
        kmeans_centroids_index,
        pq_assignments_index,
    )

    for fn in (
        kmeans_centroids_index,
        ivf_assign_index,
        pq_assignments_index,
        qc_beta_index,
    ):
        assert fn(spark, sf_dir) is fn(spark, sf_dir), fn.__name__


def test_kmeans_memoized_matches_inline_trace(spark, sf_dir):
    """Memoizing the Lloyd trace must not change any value: the cached
    centroid frame equals a fresh inline recomputation."""
    from mapreduce_rust_spark.operators.similarity import (
        KMEANS_ITERS,
        KMEANS_K,
        kmeans_centroids,
        kmeans_centroids_index,
    )
    from mapreduce_rust_spark.sources.tables import load_table

    cached = {
        r["cid"]: r["cv"]
        for r in kmeans_centroids_index(spark, sf_dir).collect()
    }
    fresh = {
        r["cid"]: r["cv"]
        for r in kmeans_centroids(
            load_table(spark, sf_dir, "embeddings"),
            "vec_id",
            "embedding",
            k=KMEANS_K,
            max_iter=KMEANS_ITERS,
        ).collect()
    }
    assert cached.keys() == fresh.keys()
    for cid, cv in fresh.items():
        assert cached[cid] == pytest.approx(cv, abs=1e-9)


def test_band_planner_midpoint_clamped(spark, sf_dir):
    """The r09 high-severity fix: the populated j=1.0 bucket must not
    mint out-of-range collision probabilities — every expected mass is
    non-negative and b=1 (rows=16) has near-zero FP by construction."""
    from mapreduce_rust_spark.operators.dedup import dedup_lsh_band_planner

    rows = {r["b"]: r for r in dedup_lsh_band_planner(spark, sf_dir).collect()}
    for r in rows.values():
        assert r["exp_fp_pairs"] >= 0.0
        assert r["exp_fn_pairs"] >= 0.0
    assert sum(r["is_best"] for r in rows.values()) == 1
