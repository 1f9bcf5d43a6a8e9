"""Numeric helpers shared by queries and oracles.

``fround`` — cross-engine-deterministic decimal truncation:
``floor(round(x, scale+4) * 10^scale) / 10^scale``. Used instead of
``round()`` in BOTH the Spark queries and the DuckDB oracle SQL
because the two engines round differently on identical doubles
(Spark: HALF_UP on the shortest decimal repr via BigDecimal; DuckDB:
half-away-from-zero on ``x*100``) — e.g. the same double
7563745.88499... rounds to .89 in Spark and .88 in DuckDB.
floor+scale is a pure IEEE-754 expression, so identical inputs give
bit-identical outputs everywhere.

The inner ``round(x, scale+4)`` absorbs summation-order noise: two
plans summing the same doubles in different orders (partial vs salted
two-phase aggregation) can differ by ~1 ulp, and when the true value
sits exactly ON a 10^-scale boundary (common for synthetic data),
floor alone flips between engines (observed: 101951.0 vs
101950.99999...). Rounding 4 extra decimals first snaps both to the
boundary; both engines round doubles half-away-from-zero, and a
genuine tie at scale+4 decimals cannot be represented in binary, so
the pre-round itself is deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F


def fround(col: Column | str, scale: int = 2) -> Column:
    """Deterministic truncation to ``scale`` decimals (see module doc)."""
    c = F.col(col) if isinstance(col, str) else col
    factor = 10 ** scale
    return F.floor(F.round(c, scale + 4) * factor) / factor


def fround_sql(expr: str, scale: int = 2) -> str:
    """The DuckDB-side twin of :func:`fround`."""
    factor = 10 ** scale
    return f"floor(round(({expr}), {scale + 4}) * {factor}) / {factor}"


def single_partition(df, *, by=None):
    """Prepare a PROVABLY-BOUNDED frame for a global window without the
    ``WindowExec: No Partition Defined`` anti-pattern.

    A partitionless window is Spark's signal that data-sized input may
    collapse onto one task. When the frame is bounded by construction
    (a band list, a decile histogram, a calendar-day spine), a single
    partition IS the intended plan — but a literal partition key
    (``partitionBy(lit(0))``) gets constant-folded away by Catalyst
    and still trips the warn. The honest spelling: ``repartition(1)``
    (explicit exchange, upstream stays parallel — NOT ``coalesce(1)``,
    which would collapse upstream parallelism into the single task)
    then partition the window by ``spark_partition_id()``, which is
    non-foldable and constant (0) on the one partition. Returns
    ``(df1, window_spec)``; pass ``by=[col, ...]`` for the ORDER BY.
    """
    w = Window.partitionBy(F.spark_partition_id())
    if by is not None:
        w = w.orderBy(*by)
    return df.repartition(1), w
