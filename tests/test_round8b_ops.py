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


def test_rrf_topk_truncates_per_query(spark):
    from mapreduce_rust_spark.operators.corpus import rrf_fuse

    dense = _arm(spark, [(1, d, d) for d in range(1, 8)])
    lex = _arm(spark, [(2, d, d) for d in range(1, 8)])
    out = rrf_fuse(dense, lex, k=60, topk=3)
    cnt = out.groupBy("query_id").count().collect()
    assert {r["query_id"]: r["count"] for r in cnt} == {1: 3, 2: 3}
