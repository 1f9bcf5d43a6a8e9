"""File-format connectors beyond parquet: csv, json(lines), orc.

The reference's entire format surface is text-in / JSON-array-out
(``worker.rs:110``, ``worker.rs:199-208``); SURVEY.md §2c lists the
format families Spark's sources give the new engine. Each round-trip
registry query below writes a real table out through the format's
writer and reads it back through its reader (explicit schema, so csv/
json don't depend on inference), proving BOTH directions against the
parquet-derived oracle.

Scale notes: every writer here emits one file per partition with no
global coordination (the same property the reference gets from
one-file-per-reduce-task), so sink parallelism equals partition
count. csv/json are row formats with no column pruning or predicate
pushdown — the docstring-level guidance is: interchange only;
anything queried repeatedly belongs in parquet/orc (columnar,
compressed, statistics).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_rust_spark.sources.tables import load_table

ORACLE: dict[str, str] = {}

# stringify the timestamp at the edge so the comparison is exact and
# timezone-convention-free across Spark/DuckDB/pandas
_ORDERS_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus,
       o_totalprice,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
       o_orderpriority
FROM orders
"""


def _orders_stringified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_orderdate"),
        "o_orderpriority",
    )


def roundtrip(df: DataFrame, fmt: str, **writer_options: str) -> DataFrame:
    """Write ``df`` in ``fmt`` to a temp dir and read it back with the
    original schema (no inference)."""
    out = os.path.join(tempfile.mkdtemp(prefix=f"mrs_{fmt}_"), "data")
    df.write.mode("overwrite").format(fmt).options(**writer_options).save(out)
    reader = df.sparkSession.read.format(fmt).schema(df.schema).options(**writer_options)
    return reader.load(out)


def format_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return roundtrip(_orders_stringified(spark, sf_dir), "csv", header="true")


def format_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return roundtrip(_orders_stringified(spark, sf_dir), "json")


def format_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return roundtrip(_orders_stringified(spark, sf_dir), "orc")


ORACLE["format_csv_roundtrip"] = _ORDERS_ORACLE
ORACLE["format_json_roundtrip"] = _ORDERS_ORACLE
ORACLE["format_orc_roundtrip"] = _ORDERS_ORACLE

QUERIES = {
    "format_csv_roundtrip": format_csv_roundtrip,
    "format_json_roundtrip": format_json_roundtrip,
    "format_orc_roundtrip": format_orc_roundtrip,
}
