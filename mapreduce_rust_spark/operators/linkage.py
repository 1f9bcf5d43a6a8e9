"""Record linkage / fuzzy entity matching: blocked candidate
generation + edit-distance verification.

The entity-resolution shape every large-scale data pipeline needs
(supplier/customer/product catalogs, author disambiguation, near-dup
entity merge before training-data attribution). Not in the reference
(it has no joins at all — SURVEY.md §2c); built per the north star as
first-class engine surface.

Design, 100 TB-first:

* **Never all-pairs.** Candidates come from equality on a BLOCKING
  KEY (here brand + size; in production: phonetic code, sorted
  token prefix, LSH bucket). The self-join shuffles on the block key,
  so pair cost is Σ_b |b|² over block sizes — the same bounded shape
  as the banded-LSH dedup family, and the block key is checked by the
  same max-df logic if blocks can run hot.
* **Verify inside the join.** The edit-distance predicate runs
  JVM-side (``F.levenshtein``) during the joined projection — no
  Python, no second pass, no materialized candidate table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_rust_spark.sources.tables import fan_out, load_table

ORACLE: dict[str, str] = {}


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    max_dist: int,
) -> DataFrame:
    """(block..., id1, id2, name1, name2, edit_dist) for every
    within-block pair with levenshtein(name1, name2) <= max_dist and
    id1 < id2. One shuffle keyed on the block columns."""
    a = df.select(
        *block_cols,
        F.col(id_col).alias("id1"),
        F.col(name_col).alias("name1"),
    )
    b = df.select(
        *block_cols,
        F.col(id_col).alias("id2"),
        F.col(name_col).alias("name2"),
    )
    dist = F.levenshtein("name1", "name2").cast("int")
    return (
        a.join(b, block_cols)
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("edit_dist", dist)
        .filter(F.col("edit_dist") <= max_dist)
    )


def entity_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part names within (brand, size) blocks at
    edit distance <= 12 — the catalog-dedup screen. Block sizes at
    TPC-H geometry are |parts| / (25 brands x 50 sizes), so the
    per-block pair count stays quadratic-in-tiny."""
    # fan_out: the probe side carries the levenshtein evaluation — on
    # single-row-group local parquet the scan is ONE partition and the
    # whole edit-distance pass would run single-threaded
    part = fan_out(load_table(spark, sf_dir, "part"))
    return blocked_fuzzy_pairs(
        part, "p_partkey", "p_name", ["p_brand", "p_size"], max_dist=12
    ).select(
        "p_brand", "p_size", "id1", "id2", "edit_dist"
    ).orderBy("p_brand", "p_size", "id1", "id2")


ORACLE["entity_match_blocked"] = """
SELECT a.p_brand, a.p_size,
       a.p_partkey AS id1, b.p_partkey AS id2,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
FROM part a
JOIN part b
  ON a.p_brand = b.p_brand
 AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 12
ORDER BY a.p_brand, a.p_size, id1, id2
"""


QUERIES = {
    "entity_match_blocked": entity_match_blocked,
}
