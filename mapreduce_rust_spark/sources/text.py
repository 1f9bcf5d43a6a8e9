"""Text-file sources mirroring the reference's two input models.

Reference behaviors re-expressed Spark-first:

* ``source_scan_wholefile`` — each input file read fully into one
  string (``worker.rs:109-115``); unreadable files skipped with a
  warning, not an error (handled engine-wide via
  ``spark.sql.files.ignoreCorruptFiles`` in session.py).
* ``source_scan_lines`` — the prototype's line model: key = 1-based
  line number as string, value = line content
  (``mr/tests/test.rs:21-32``).
* ``source_list_dir`` — enumerate regular files in a directory
  (``mr/tests/test.rs:54-68``); Spark's readers glob directories
  natively, so this exists only for API parity.

Scale notes: ``wholeTextFiles`` is file-granular (one record per file)
— correct for the reference's semantics but wrong for 100 TB single
huge files; for those, ``spark.read.text`` byte-range splits
(``spark.sql.files.maxPartitionBytes``) and supersedes the reference's
file-granular round-robin split (``coordinator.rs:38-50``,
README.md:36 acknowledges byte-range splitting as unfinished work).
The line-number window below deliberately partitions by file path so
the global-order sort is per-file, not a single-reducer global sort.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def list_input_files(path: str, pattern: str = "*") -> list[str]:
    """Enumerate regular files under ``path`` (parity with
    ``get_files``, ``mr/tests/test.rs:54-68``). Prefer passing globs
    straight to ``spark.read`` — this helper exists for the explicit
    file-list API the reference exposes (``server.rs:4-11``)."""
    return sorted(
        p for p in glob.glob(os.path.join(path, pattern)) if os.path.isfile(p)
    )


def read_whole_files(spark: SparkSession, path_or_paths: str | list[str]) -> DataFrame:
    """One row per file: ``(path string, content string)``.

    Exact analogue of the reference's map-input model
    (``worker.rs:106-115``: the user MapFn receives (filename,
    whole-file contents)).
    """
    paths = (
        ",".join(path_or_paths) if isinstance(path_or_paths, list) else path_or_paths
    )
    rdd = spark.sparkContext.wholeTextFiles(paths)
    return rdd.toDF(["path", "content"])


def read_lines_numbered(spark: SparkSession, path_or_paths: str | list[str]) -> DataFrame:
    """One row per line: ``(path, line_no bigint 1-based, line)``.

    Analogue of the prototype's ``read_input`` (``mr/tests/
    test.rs:21-32``), which keys each line by its 1-based line number.
    Implemented as text scan + row_number windowed per file so the
    sort never becomes a single global reducer.
    """
    df = spark.read.text(path_or_paths).select(
        F.col("value").alias("line"),
        F.input_file_name().alias("path"),
    )
    w = Window.partitionBy("path").orderBy(F.monotonically_increasing_id())
    return df.select(
        "path", F.row_number().over(w).cast("bigint").alias("line_no"), "line"
    )
