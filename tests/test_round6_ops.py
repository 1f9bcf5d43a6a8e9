"""Round-6 operators: DSIR importance weights, Kneser-Ney bigram LM,
unigram entropy, IVF+PQ composite ANN, label propagation, balanced
range planning, binaryFile ingest, and the adaptive sign-LSH policy
(the fix for the quadratic fixed-bit bucketing the sf0.1→sf1 sweep
caught)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_sign_bits_ladder_thresholds(spark):
    from mapreduce_rust_spark.operators.similarity import (
        SIGN_BITS_MAX,
        SIGN_BITS_MIN,
        SIGN_OCCUPANCY,
        sign_bits_for,
    )

    lo = SIGN_OCCUPANCY << SIGN_BITS_MIN
    cases = [
        (1, SIGN_BITS_MIN),
        (lo, SIGN_BITS_MIN),
        (lo + 1, SIGN_BITS_MIN + 1),
        (SIGN_OCCUPANCY << 10, 10),
        ((SIGN_OCCUPANCY << (SIGN_BITS_MAX - 1)) + 1, SIGN_BITS_MAX),
        (10**12, SIGN_BITS_MAX),
    ]
    df = spark.createDataFrame([(n,) for n, _ in cases], "n long")
    got = [r[0] for r in df.select(sign_bits_for(F.col("n"))).collect()]
    assert got == [b for _, b in cases]


def test_adaptive_bucket_matches_fixed_at_min_bits(spark):
    """At gate scale (n ≤ OCCUPANCY·2^MIN) the adaptive bucket must be
    byte-identical to the historical fixed-4-bit bucket."""
    from mapreduce_rust_spark.operators.similarity import (
        SIGN_BITS_MIN,
        sign_bits_for,
        sign_bucket,
        sign_bucket_adaptive,
    )

    vecs = [([0.5, -1.0, 2.0, -0.1, 1.0] * 13)[:64], [-1.0] * 64, [1.0] * 64]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    ).withColumn("n_corpus", F.lit(100))
    rows = df.select(
        sign_bucket(F.col("embedding")).alias("fixed"),
        sign_bucket_adaptive(
            F.col("embedding"), sign_bits_for(F.col("n_corpus"))
        ).alias("adaptive"),
    ).collect()
    assert all(r["fixed"] == r["adaptive"] for r in rows)
    assert all(0 <= r["adaptive"] < (1 << SIGN_BITS_MIN) for r in rows)


def test_embedding_lsh_pairs_scale_linearly(spark, sf_dir):
    """The candidate-pair count must stay ~n·OCCUPANCY/2, not n²/2^B:
    doubling the corpus must not quadruple the within-bucket pairs.
    Synthetic corpus straddles the 2048-row bit-ladder threshold."""
    import numpy as np

    from mapreduce_rust_spark.operators.similarity import (
        sign_bits_for,
        sign_bucket_adaptive,
    )

    rng = np.random.default_rng(7)

    def bucket_counts(n):
        vecs = rng.standard_normal((n, 64)).astype(float).tolist()
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        ).withColumn("n_corpus", F.lit(n))
        b = df.select(
            sign_bucket_adaptive(
                F.col("embedding"), sign_bits_for(F.col("n_corpus"))
            ).alias("bucket")
        )
        per = b.groupBy("bucket").count().collect()
        return sum(r["count"] * (r["count"] - 1) // 2 for r in per)

    pairs_2k, pairs_4k = bucket_counts(2048), bucket_counts(4096)
    # fixed bits would give pairs_4k ≈ 4×pairs_2k; adaptive doubles
    # the bucket count at 4096, so the ratio must stay well under 3
    assert pairs_4k < 3 * pairs_2k


def test_dsir_weights_report(spark, sf_dir):
    from mapreduce_rust_spark.operators.corpus import corpus_dsir_weights

    rows = corpus_dsir_weights(spark, sf_dir).collect()
    assert len(rows) == 20  # one per source
    assert all(0.0 <= r["share_target_like"] <= 1.0 for r in rows)
    assert sum(r["n_docs"] for r in rows) > 0
    again = corpus_dsir_weights(spark, sf_dir).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))


def test_kneser_ney_bigram_probabilities(spark, sf_dir):
    from mapreduce_rust_spark.operators.text_analysis import (
        KN_TOPN,
        text_kneser_ney_bigram,
    )

    rows = text_kneser_ney_bigram(spark, sf_dir).collect()
    assert len(rows) == KN_TOPN
    assert all(0.0 < r["pkn"] <= 1.0 for r in rows)
    counts = [r["c"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_unigram_entropy_bounds(spark, sf_dir):
    from mapreduce_rust_spark.operators.text_analysis import text_unigram_entropy

    rows = text_unigram_entropy(spark, sf_dir).collect()
    assert rows
    # 31-word vocab caps per-doc entropy at log2(31); uniform docs of
    # ≥10 tokens keep it well above zero
    cap = math.log2(31) + 1e-6
    for r in rows:
        assert 0.0 < r["min_entropy"] <= r["avg_entropy"] <= r["max_entropy"] <= cap


def test_ivfpq_topk_shape(spark, sf_dir):
    from mapreduce_rust_spark.operators.similarity import (
        PQ_TOPK,
        ann_topk_ivfpq,
    )

    rows = ann_topk_ivfpq(spark, sf_dir).collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        assert len(rs) <= PQ_TOPK
        rs.sort(key=lambda r: r["rank"])
        dists = [r["approx_dist"] for r in rs]
        assert dists == sorted(dists)


def test_label_propagation_partitions_nodes(spark, sf_dir):
    from mapreduce_rust_spark.operators.dedup import candidate_pairs_index
    from mapreduce_rust_spark.operators.graph import graph_label_propagation

    pairs = candidate_pairs_index(spark, sf_dir, threshold=0.5, k=3)
    n_nodes = (
        pairs.select(F.col("d1").alias("n"))
        .union(pairs.select(F.col("d2").alias("n")))
        .distinct()
        .count()
    )
    rows = graph_label_propagation(spark, sf_dir).collect()
    assert sum(r["n_nodes"] for r in rows) == n_nodes
    assert all(r["n_nodes"] >= 1 for r in rows)


def test_label_propagation_finds_communities_not_reachability(spark):
    """Two 4-cliques joined by one bridge edge: components would merge
    them into one cluster; 2-round LPA keeps two communities because
    the within-clique mode outvotes the single bridge label."""
    import itertools

    from mapreduce_rust_spark.operators.graph import label_propagation

    left = list(itertools.combinations([0, 1, 2, 3], 2))
    right = list(itertools.combinations([4, 5, 6, 7], 2))
    edges = spark.createDataFrame(
        left + right + [(3, 4)], "d1 long, d2 long"
    )
    final = label_propagation(edges, "d1", "d2")
    labels = {r["node"]: r["lbl"] for r in final.collect()}
    assert len({labels[n] for n in (0, 1, 2, 3)}) == 1
    assert len({labels[n] for n in (4, 5, 6, 7)}) == 1
    assert labels[0] != labels[4]


def test_balanced_ranges_exact_boundaries(spark, sf_dir):
    from mapreduce_rust_spark.operators.skew import (
        RANGE_PARTS,
        skew_balanced_ranges,
    )
    from mapreduce_rust_spark.sources.tables import load_table

    rows = skew_balanced_ranges(spark, sf_dir).collect()
    assert [r["partition_id"] for r in rows] == list(range(1, RANGE_PARTS + 1))
    keys = [r["boundary_key"] for r in rows]
    assert keys == sorted(keys)
    total = load_table(spark, sf_dir, "lineitem").count()
    for r in rows:
        # exact crossing: cum reaches i/P of total, previous row didn't
        assert r["cum_rows"] * RANGE_PARTS >= r["partition_id"] * total
    assert rows[-1]["cum_frac"] == pytest.approx(1.0)


def test_binaryfile_ingest_integrity(spark, sf_dir):
    from mapreduce_rust_spark.sources.formats import (
        BINARYFILE_N,
        source_binaryfile_ingest,
    )

    rows = source_binaryfile_ingest(spark, sf_dir).collect()
    assert sum(r["n_files"] for r in rows) == BINARYFILE_N
    for r in rows:
        assert r["total_bytes"] > r["n_files"]  # every file ≥ 2 bytes
        assert 1 <= r["n_distinct_sha"] <= r["n_files"]


def test_recursive_tree_depth_census(spark, sf_dir):
    from mapreduce_rust_spark.plans.sqlface import sql_recursive_tree_depth
    from mapreduce_rust_spark.sources.tables import load_table

    rows = sql_recursive_tree_depth(spark, sf_dir).collect()
    n_supp = load_table(spark, sf_dir, "supplier").count()
    assert sum(r["n_suppliers"] for r in rows) == n_supp
    by_depth = {r["depth"]: r["n_suppliers"] for r in rows}
    # binary heap: level d holds 2^d nodes until the last partial level
    assert by_depth[0] == 1 and by_depth[1] == 2 and by_depth[2] == 4


def test_approx_top_k_exact_when_tracked(spark, sf_dir):
    from mapreduce_rust_spark.plans.sqlface import sql_approx_top_k
    from mapreduce_rust_spark.operators.text_analysis import text_token_stats

    rows = sql_approx_top_k(spark, sf_dir).collect()
    assert len({r["token"] for r in rows}) == len(rows)
    total_tokens = sum(
        r["n_tokens"] for r in text_token_stats(spark, sf_dir).collect()
    )
    assert sum(r["cnt"] for r in rows) == total_tokens


def test_listagg_topn_order(spark, sf_dir):
    from mapreduce_rust_spark.plans.sqlface import sql_listagg_topn

    rows = sql_listagg_topn(spark, sf_dir).collect()
    assert len(rows) == 5  # market segments
    for r in rows:
        assert len(r["top3_names"].split(",")) == 3


def test_bigram_perplexity_bounds(spark, sf_dir):
    from mapreduce_rust_spark.operators.text_analysis import text_bigram_perplexity

    rows = text_bigram_perplexity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # self-trained model: every bigram seen, pkn in (0,1] so
        # bits are finite and non-negative
        assert 0.0 <= r["min_nll_bits"] <= r["avg_nll_bits"] <= r["max_nll_bits"]


def test_session_window_histogram_consistent(spark, sf_dir):
    """Native session_window finalized-session histogram must account
    for every event in a finalized session and produce positive
    session counts with bounded sizes."""
    from mapreduce_rust_spark.streaming.queries import streaming_session_window

    rows = streaming_session_window(spark, sf_dir).collect()
    assert rows
    assert all(r["n_events"] >= 1 and r["n_sessions"] >= 1 for r in rows)
    sizes = [r["n_events"] for r in rows]
    assert sizes == sorted(sizes)


def test_power_iteration_unit_vector_and_rayleigh(spark, sf_dir):
    """The returned direction must be unit-norm; the Rayleigh quotient
    must dominate the average diagonal (it approaches the top
    eigenvalue, which is >= mean of eigenvalues = mean variance)."""
    from mapreduce_rust_spark.operators.similarity import (
        _COV_DIMS,
        embedding_covariance,
        embedding_power_iteration,
    )

    rows = embedding_power_iteration(spark, sf_dir).collect()
    assert len(rows) == _COV_DIMS
    norm2 = sum(r["component"] ** 2 for r in rows)
    assert abs(norm2 - 1.0) < 1e-4
    rq = rows[0]["rayleigh"]
    diag = [
        r["cov"]
        for r in embedding_covariance(spark, sf_dir).collect()
        if r["i"] == r["j"]
    ]
    assert rq >= sum(diag) / len(diag) - 1e-9


def test_benford_audit_shares(spark, sf_dir):
    import math

    from mapreduce_rust_spark.operators.profiling import table_benford_audit
    from mapreduce_rust_spark.sources.tables import load_table

    rows = table_benford_audit(spark, sf_dir).collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    assert sum(r["n_orders"] for r in rows) == load_table(
        spark, sf_dir, "orders"
    ).count()
    for r in rows:
        expect = math.log10(1 + 1 / r["digit"])
        assert abs(r["benford_share"] - expect) < 1e-5
        assert abs(r["abs_dev"] - abs(r["obs_share"] - expect)) < 1e-5


def test_incremental_join_delta_equals_direct_join(spark, sf_dir):
    """The three delta terms plus the old-old term must reproduce the
    direct join exactly (algebraic identity on real data)."""
    from mapreduce_rust_spark.plans.incremental import incremental_join_delta
    from mapreduce_rust_spark.sources.tables import load_table

    got = {
        r["o_orderpriority"]: (r["n_rows"], r["revenue_cents"])
        for r in incremental_join_delta(spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    direct = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
            ).alias("cents"),
        )
        .collect()
    )
    assert got == {r["o_orderpriority"]: (r["n"], r["cents"]) for r in direct}


def test_hashing_trick_collision_census(spark, sf_dir):
    from mapreduce_rust_spark.operators.cleaning import (
        HASH_BUCKETS,
        features_hashing_trick,
    )
    from mapreduce_rust_spark.sources.tables import load_table

    rows = features_hashing_trick(spark, sf_dir).collect()
    assert all(0 <= r["bucket"] < HASH_BUCKETS for r in rows)
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r["n_values"] for r in rows) == 3 * n_cust
    # with ~41 features in 32 buckets, pigeonhole guarantees collisions
    assert any(r["n_distinct_feats"] > 1 for r in rows)
    assert all(abs(r["signed_count"]) <= r["n_values"] for r in rows)


def test_dau_wau_mau_monotone_and_bounded(spark, sf_dir):
    from mapreduce_rust_spark.plans.behavior import events_dau_wau_mau
    from mapreduce_rust_spark.sources.tables import load_table

    rows = events_dau_wau_mau(spark, sf_dir).collect()
    assert len(rows) == 30  # 30-day event window
    total_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    for r in rows:
        assert 1 <= r["dau"] <= r["wau"] <= r["mau"] <= total_users
    # by day 30 the trailing-30d window covers the whole corpus
    assert rows[-1]["mau"] == total_users


def test_ab_srm_no_alarm_on_parity_split(spark, sf_dir):
    """user_id-parity assignment is a perfect hash split; the SRM
    audit must stay quiet (chi2 small) for every event type."""
    from mapreduce_rust_spark.plans.behavior import ab_srm_audit

    rows = ab_srm_audit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n0"] > 0 and r["n1"] > 0
        assert r["chi2"] >= 0.0
        assert not r["srm_alarm"]
