"""Interleaved A/B timing of a slug between the WORKING TREE (new)
and a git ref (old, default HEAD): both registries are imported into
one warmed Spark session and runs alternate old/new N times, so host
noise episodes and JIT warmup hit both sides equally. Paired min/med
comparison is then meaningful on a noisy host where consecutive
sessions can differ 3x.

    python tools/ab_interleave.py [-nN] [-rREF] slug [slug ...]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load_registry(path: str):
    """Import mapreduce_rust_spark.registry rooted at ``path``,
    purging any previously imported copy so the two sides don't
    share modules."""
    for mod in [m for m in sys.modules if m.startswith("mapreduce_rust_spark")]:
        del sys.modules[mod]
    sys.path.insert(0, path)
    try:
        from mapreduce_rust_spark.registry import queries

        return queries()
    finally:
        sys.path.remove(path)


def main() -> int:
    args = sys.argv[1:]
    n = 4
    ref = "HEAD"
    while args and args[0].startswith("-"):
        if args[0].startswith("-n"):
            n = int(args[0][2:])
        elif args[0].startswith("-r"):
            ref = args[0][2:]
        args = args[1:]
    slugs = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    old_root = tempfile.mkdtemp(prefix="mrs_ab_old_")
    subprocess.run(
        f"git -C {REPO} archive {ref} | tar -x -C {old_root}",
        shell=True,
        check=True,
    )

    new_q = _load_registry(REPO)
    old_q = _load_registry(old_root)
    # session factory from the new tree (identical confs both sides)
    for mod in [m for m in sys.modules if m.startswith("mapreduce_rust_spark")]:
        del sys.modules[mod]
    from mapreduce_rust_spark import get_spark

    spark = get_spark("ab")
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

    for name in slugs:
        olds, news = [], []
        # one unmeasured warmup per side (JIT + memo builds)
        for fn in (old_q[name], new_q[name]):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        for i in range(n):
            for side, fn, acc in (
                ("old", old_q[name], olds),
                ("new", new_q[name], news),
            ):
                spark.sparkContext.setJobDescription(f"ab:{name}:{side}:{i}")
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                acc.append(round(time.time() - t0, 2))
                spark.catalog.clearCache()
        print(
            f"AB {name}: old={olds} min={min(olds)} med={statistics.median(olds)} | "
            f"new={news} min={min(news)} med={statistics.median(news)}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
