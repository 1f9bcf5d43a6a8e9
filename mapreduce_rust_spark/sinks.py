"""Sinks: the reference writes one JSON file per reduce task
(``worker.rs:138-143``) — provided for parity in
``MapReduceJob.write`` — plus the formats a 100 TB deployment
actually needs:

* **partitioned parquet** — hive-style directory partitioning so
  downstream readers get partition pruning for free;
* **bucketed tables** — pre-shuffled storage: two tables bucketed on
  the same key join with ZERO exchange (verified by plan assertion in
  tests/test_scale.py). At 100 TB this converts every recurring join
  on the bucket key from a full shuffle into a local merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Hive-partitioned parquet. ``partition_cols`` should be
    low-cardinality (date, region, …): one directory per value.
    ``max_records_per_file`` caps file size for stable downstream
    task sizing."""
    w = df.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Joins/aggregations on ``bucket_col`` between tables with the same
    bucketing skip the shuffle entirely."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table, format="parquet")


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
