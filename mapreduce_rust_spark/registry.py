"""Central query registry: slug → (spark callable, DuckDB oracle SQL).

This is the single source of truth consumed by ``__spark_entry__.py``
(the driver contract), ``bench.py``, and the self-check tool
(``tools/check_correctness.py``). Slugs follow SURVEY.md §2a for the
reference-parity surface, plus the engine-extension families
(analytics / dedup / similarity / text analysis / multimodal).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def _register(queries: dict[str, QueryFn], oracles: dict[str, str]) -> None:
    for name, fn in queries.items():
        if name in _QUERIES:
            raise ValueError(f"duplicate query slug: {name}")
        _QUERIES[name] = fn
    for name, sql in oracles.items():
        if name not in queries:
            raise ValueError(f"oracle for unknown slug: {name}")
        _ORACLES[name] = sql.strip()


def _load() -> None:
    if _QUERIES:
        return
    from mapreduce_rust_spark.plans import (
        advanced,
        analytics,
        behavior,
        parity,
        pipeline,
        sqlface,
        timeseries,
        tpch,
    )

    _register(parity.QUERIES, parity.ORACLE)
    _register(analytics.QUERIES, analytics.ORACLE)
    _register(advanced.QUERIES, advanced.ORACLE)
    _register(tpch.QUERIES, tpch.ORACLE)
    _register(sqlface.QUERIES, sqlface.ORACLE)
    _register(timeseries.QUERIES, timeseries.ORACLE)
    _register(pipeline.QUERIES, pipeline.ORACLE)
    _register(behavior.QUERIES, behavior.ORACLE)
    for mod_name in (
        "mapreduce_rust_spark.operators.dedup",
        "mapreduce_rust_spark.streaming.queries",
        "mapreduce_rust_spark.operators.similarity",
        "mapreduce_rust_spark.operators.text_analysis",
        "mapreduce_rust_spark.operators.multimodal",
        "mapreduce_rust_spark.operators.skew",
        "mapreduce_rust_spark.operators.graph",
        "mapreduce_rust_spark.operators.profiling",
        "mapreduce_rust_spark.sources.formats",
    ):
        try:
            mod = __import__(mod_name, fromlist=["QUERIES", "ORACLE"])
        except ImportError:
            continue
        _register(mod.QUERIES, getattr(mod, "ORACLE", {}))


def queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load()
    return dict(_ORACLES)
