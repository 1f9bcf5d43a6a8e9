"""Steady-state per-slug timing for A/B work during optimization
rounds: run each named slug N times (default 3) in one warmed session
and report per-run times + min. The min approximates the slug's cost
in a long-running warmed session (the bench's regime after the first
hundred queries), insulated from JIT warmup and host noise spikes.

    python tools/steady_profile.py [-nN] slug [slug ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    n = 3
    if args and args[0].startswith("-n"):
        n = int(args[0][2:])
        args = args[1:]
    slugs = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mapreduce_rust_spark import get_spark
    from mapreduce_rust_spark.registry import queries

    spark = get_spark("steady")
    spark.range(1_000_000).selectExpr("sum(id) as s").write.format("noop").mode(
        "overwrite"
    ).save()
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()
    import glob as _glob

    for p in sorted(_glob.glob(os.path.join(sf_dir, "*.parquet"))):
        with open(p, "rb") as fh:
            while fh.read(1 << 24):
                pass

    qmap = queries()
    mins: dict[str, float] = {}
    for name in slugs:
        fn = qmap[name]
        runs = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"steady:{name}:{i}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 2))
            spark.catalog.clearCache()
        mins[name] = min(runs)
        print(f"STEADY {name}: runs={runs} min={min(runs)}", flush=True)
    print("SUMMARY " + json.dumps(mins))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
