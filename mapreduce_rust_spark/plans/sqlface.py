"""The SQL face of the engine: queries expressed as ``spark.sql``
strings over the registered table views.

The reference has no query language at all — a "query" is a pair of
Rust function pointers compiled into the worker binary
(``worker.rs:23-24``, SURVEY.md §3). Spark SQL gives the new engine a
full declarative surface over the *same* Catalyst plans the DataFrame
API builds: identical pushdown, pruning, broadcast and AQE behavior,
verified by the same oracle gate as every DataFrame query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce_rust_spark.sources.tables import register_views

ORACLE: dict[str, str] = {}


def sql_top_months_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL query: for each order priority, the 3 busiest months
    by order count (integer ordering + month tie-break, so the window
    rank is engine-independent). CTE → aggregate → window → filter,
    all parsed by Spark SQL, all optimized by Catalyst."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH m AS (
          SELECT o_orderpriority,
                 date_format(o_orderdate, 'yyyy-MM') AS month,
                 count(*) AS n_orders,
                 floor(round(sum(o_totalprice), 6) * 100) / 100 AS total_value
          FROM orders
          GROUP BY 1, 2
        )
        SELECT o_orderpriority, month, n_orders, total_value, rnk
        FROM (
          SELECT *,
                 row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY n_orders DESC, month
                 ) AS rnk
          FROM m
        )
        WHERE rnk <= 3
        """
    )


ORACLE["sql_top_months_per_priority"] = """
WITH m AS (
  SELECT o_orderpriority,
         strftime(o_orderdate, '%Y-%m') AS month,
         count(*) AS n_orders,
         floor(round(sum(o_totalprice), 6) * 100) / 100 AS total_value
  FROM orders
  GROUP BY 1, 2
)
SELECT o_orderpriority, month, n_orders, total_value, rnk
FROM (
  SELECT *,
         row_number() OVER (
           PARTITION BY o_orderpriority
           ORDER BY n_orders DESC, month
         ) AS rnk
  FROM m
) t
WHERE rnk <= 3
"""

QUERIES = {"sql_top_months_per_priority": sql_top_months_per_priority}
