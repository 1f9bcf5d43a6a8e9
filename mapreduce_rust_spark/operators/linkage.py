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

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_rust_spark.functions.numeric import fround, fround_sql
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


# Fellegi-Sunter field parameters: m = P(agree | match),
# u = P(agree | non-match). Policy constants; the log2 weights both
# engines score with are DERIVED from these in Python, so a retune
# reaches Spark and the oracle through one definition.
FS_M = {"name": 0.95, "type": 0.80, "price": 0.70}
FS_U = {"name": 0.05, "type": 0.025, "price": 0.10}
FS_NAME_MAXDIST = 7  # levenshtein agreement threshold (block p50 lev = 8)
FS_PRICE_TOL = 25.0  # absolute retail-price closeness (block p50 pd ~29)
FS_UPPER = 4.0  # total weight >= this -> link
FS_LOWER = 0.0  # in [lower, upper) -> possible (clerical review)


def _fs_weights() -> dict[str, tuple[float, float]]:
    return {
        f: (
            math.log2(FS_M[f] / FS_U[f]),
            math.log2((1.0 - FS_M[f]) / (1.0 - FS_U[f])),
        )
        for f in FS_M
    }


def linkage_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage (the 1969 decision
    model behind every production matcher): blocked candidate pairs
    score sum(log2(m/u)) over agreeing fields + sum(log2((1-m)/(1-u)))
    over disagreeing ones, then classify link / possible / non-link
    by the two thresholds. Fields on part pairs within (brand, size)
    blocks: name (levenshtein <= {nd}), type equality, retail
    price within {pt}. Output: the decision census (pair counts,
    mean score, per-field agreement rates) — the report a linkage
    run is tuned from. Plan: ONE block-keyed self-join (never
    all-pairs, the ``entity_match_blocked`` shape) with all field
    comparisons and the additive score evaluated JVM-side inside the
    joined projection; the census aggregates to three rows."""
    part = fan_out(load_table(spark, sf_dir, "part"))
    a = part.select(
        "p_brand", "p_size",
        F.col("p_partkey").alias("id1"), F.col("p_name").alias("n1"),
        F.col("p_type").alias("c1"), F.col("p_retailprice").alias("r1"),
    )
    b = part.select(
        "p_brand", "p_size",
        F.col("p_partkey").alias("id2"), F.col("p_name").alias("n2"),
        F.col("p_type").alias("c2"), F.col("p_retailprice").alias("r2"),
    )
    w = _fs_weights()
    agree = {
        "name": F.levenshtein("n1", "n2") <= FS_NAME_MAXDIST,
        "type": F.col("c1") == F.col("c2"),
        "price": F.abs(F.col("r1") - F.col("r2")) <= FS_PRICE_TOL,
    }
    score = sum(
        F.when(agree[f], F.lit(w[f][0])).otherwise(F.lit(w[f][1]))
        for f in sorted(w)
    )
    pairs = (
        a.join(b, ["p_brand", "p_size"])
        .filter(F.col("id1") < F.col("id2"))
        .select(
            score.alias("score"),
            *[agree[f].cast("int").alias(f"ag_{f}") for f in sorted(w)],
        )
        .withColumn(
            "decision",
            F.when(F.col("score") >= FS_UPPER, "link")
            .when(F.col("score") >= FS_LOWER, "possible")
            .otherwise("nonlink"),
        )
    )
    return (
        pairs.groupBy("decision")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            fround(F.avg("score"), 4).alias("avg_score"),
            fround(F.avg("ag_name"), 4).alias("name_agree_rate"),
            fround(F.avg("ag_type"), 4).alias("type_agree_rate"),
            fround(F.avg("ag_price"), 4).alias("price_agree_rate"),
        )
        .orderBy("decision")
    )


def _fs_oracle() -> str:
    w = _fs_weights()
    conds = {
        "name": f"levenshtein(a.p_name, b.p_name) <= {FS_NAME_MAXDIST}",
        "type": "a.p_type = b.p_type",
        "price": f"abs(a.p_retailprice - b.p_retailprice) <= {FS_PRICE_TOL}",
    }
    score = " + ".join(
        f"CASE WHEN {conds[f]} THEN {w[f][0]!r} ELSE {w[f][1]!r} END"
        for f in sorted(w)
    )
    ag_cols = ",\n         ".join(
        f"CASE WHEN {conds[f]} THEN 1 ELSE 0 END AS ag_{f}" for f in sorted(w)
    )
    return f"""
WITH pairs AS (
  SELECT {score} AS score,
         {ag_cols}
  FROM part a JOIN part b
    ON a.p_brand = b.p_brand AND a.p_size = b.p_size
   AND a.p_partkey < b.p_partkey
),
d AS (
  SELECT CASE WHEN score >= {FS_UPPER} THEN 'link'
              WHEN score >= {FS_LOWER} THEN 'possible'
              ELSE 'nonlink' END AS decision,
         score, ag_name, ag_type, ag_price
  FROM pairs
)
SELECT decision, CAST(count(*) AS BIGINT) AS n_pairs,
       {fround_sql("avg(score)", 4)} AS avg_score,
       {fround_sql("avg(ag_name)", 4)} AS name_agree_rate,
       {fround_sql("avg(ag_type)", 4)} AS type_agree_rate,
       {fround_sql("avg(ag_price)", 4)} AS price_agree_rate
FROM d GROUP BY decision ORDER BY decision
"""


ORACLE["linkage_fellegi_sunter"] = _fs_oracle()


QUERIES = {
    "linkage_fellegi_sunter": linkage_fellegi_sunter,
    "entity_match_blocked": entity_match_blocked,
}
