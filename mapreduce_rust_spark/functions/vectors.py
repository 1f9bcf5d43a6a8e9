"""Vector column expressions over ``array<float/double>`` embeddings.

Built on ``F.zip_with``/``F.aggregate`` higher-order functions — these
run inside the JVM on the array values directly (no Arrow transfer, no
Python), which is the right default for the 100 TB path. A Pandas-UDF
matrix variant exists in ``operators/similarity.py`` for the top-k
kernel where BLAS-style batching wins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of an array column."""
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            ca,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two array columns (NULL-safe on zero norms)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    denom = l2_norm(ca) * l2_norm(cb)
    return F.when(denom == 0, F.lit(None)).otherwise(dot(ca, cb) / denom)


def cosine_from_norms(
    a: Column | str, b: Column | str, norm_a: Column | str, norm_b: Column | str
) -> Column:
    """Cosine similarity with PRE-COMPUTED norms — bit-identical to
    :func:`cosine_similarity` (same dot, same norm product, same
    division) but the norm aggregates run once per ROW instead of once
    per PAIR. In a |q|×N scoring join that removes two of the three
    array passes from the hot inner loop."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    na = F.col(norm_a) if isinstance(norm_a, str) else norm_a
    nb = F.col(norm_b) if isinstance(norm_b, str) else norm_b
    denom = na * nb
    return F.when(denom == 0, F.lit(None)).otherwise(dot(ca, cb) / denom)
