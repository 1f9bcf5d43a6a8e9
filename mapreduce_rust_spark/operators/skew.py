"""Skew mitigation for hot keys.

The reference's reducer is a single in-memory HashMap per task
(``worker.rs:126-131``) — one hot key OOMs one worker; nothing
redistributes it. The engine handles skew at three levels:

1. **Partial aggregation** (automatic): algebraic aggregates compact
   to one row per key per map partition before the shuffle, so
   groupBy skew mostly disappears for sum/count/min/max.
2. **AQE skew-join splitting** (on in session.py): runtime splits
   oversized join partitions.
3. **Explicit salted join** (here): for deterministic plans or
   engines/versions without AQE, replicate the build side S ways and
   scatter the probe side by a content-derived salt — the hot key's
   rows spread across S partitions instead of one.

``salted_join`` is semantically identical to ``left.join(right, on,
"inner")`` (verified by equivalence test on a skewed dataset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join on ``on``.

    Probe side (left, the big/skewed one): salt derived from a hash
    of the whole row (deterministic, uniform). Build side (right):
    replicated once per salt value via an exploded literal range. The
    shuffle key becomes (key, salt) — a hot key now occupies n_salt
    partitions. Build-side cost: n_salt× replication, so keep the
    build side the smaller input (same discipline as broadcast)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salt))
    l_salted = left.withColumn("_salt", salt)
    r_replicated = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = l_salted.join(r_replicated, [on, "_salt"], how)
    return out.drop("_salt")


def top_hot_keys(df: DataFrame, key_col: str, k: int = 10) -> DataFrame:
    """Diagnostic: the k heaviest keys and their share of rows — run
    this before choosing a partitioning/salting strategy."""
    total = df.count()
    return (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("share", F.col("cnt") / F.lit(float(total)))
        .orderBy(F.col("cnt").desc())
        .limit(k)
    )
