"""Numeric helpers shared by queries and oracles.

``fround`` — cross-engine-deterministic decimal truncation:
``floor(x * 10^scale) / 10^scale``. Used instead of ``round()`` in
BOTH the Spark queries and the DuckDB oracle SQL because the two
engines round differently on identical doubles (Spark: HALF_UP on the
shortest decimal repr via BigDecimal; DuckDB: half-away-from-zero on
``x*100``) — e.g. the same double 7563745.88499... rounds to .89 in
Spark and .88 in DuckDB. floor+scale is a pure IEEE-754 expression,
so identical inputs give bit-identical outputs everywhere. The only
residual risk is inputs that differ across engines by summation order
AND sit within one ulp of a 10^-scale boundary (~1e-14 probability).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fround(col: Column | str, scale: int = 2) -> Column:
    """Deterministic truncation to ``scale`` decimals (see module doc)."""
    c = F.col(col) if isinstance(col, str) else col
    factor = 10 ** scale
    return F.floor(c * factor) / factor


def fround_sql(expr: str, scale: int = 2) -> str:
    """The DuckDB-side twin of :func:`fround`."""
    factor = 10 ** scale
    return f"floor(({expr}) * {factor}) / {factor}"
