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
