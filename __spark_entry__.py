"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query; ``queries``/``oracle_sql`` expose
the full operator inventory (SURVEY.md §2 parity slugs + engine
extensions) from ``mapreduce_rust_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduce_rust_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the end-to-end
    corpus-preparation pipeline (exact-dedup survivors → quality +
    language gates → per-language doc/token budget) — the composite
    job this engine exists to run. See plans/pipeline.py."""
    from mapreduce_rust_spark.plans.pipeline import pipeline_prepare_corpus

    return pipeline_prepare_corpus(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per slug (same column names/aliases)."""
    return registry.oracle_sql()
