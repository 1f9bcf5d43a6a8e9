"""TPC-H-derived analytics suite (q1 lives in analytics.py; here:
q6/q7/q8/q10/q13/q14/q15/q17/q18/q19/q22 shapes).

The reference has NO join, filter, or aggregate operators (SURVEY.md
§2c) — its whole query surface is map→group→reduce. This module is
engine extension surface: the classic decision-support shapes a user
of a general analytics engine runs daily, adapted to the driver
testdata's TPC-H subset (no partsupp table, no commit/receipt dates —
q2/q4/q12 are not expressible and are intentionally absent).

Every query is declarative DataFrame composition: filters sit
directly on the scans (Catalyst pushes them into the parquet reader —
verified `PushedFilters` in .explain), only needed columns are
selected (column pruning), dimension sides are broadcast so the
lineitem fact table never shuffles for a dim join. At 100 TB the fact
scans dominate; each query shuffles the fact side at most once (for
its group-by), which is the minimum the semantics allow.

Floating-point: all emitted aggregates go through ``fround`` /
``fround_sql`` (see functions/numeric.py) so Spark and DuckDB
truncate identically. Ordered+limited results always carry a unique
tie-break key so LIMIT is deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_rust_spark.functions.numeric import fround, fround_sql
from mapreduce_rust_spark.sources.tables import load_table

ORACLE: dict[str, str] = {}

_REVENUE = "l_extendedprice * (1 - l_discount)"


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: revenue increase from eliminating small discounts — a pure
    scan-filter-aggregate. All three predicates push to parquet
    row-group pruning; no shuffle at all (single global sum)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 25)
        )
        .agg(fround(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))
    )


ORACLE["q6_forecast_revenue"] = f"""
SELECT {fround_sql("sum(l_extendedprice * l_discount)")} AS revenue
FROM lineitem
WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 25
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: shipping volume between two nations by year. Two
    independent dimension chains (supplier-nation, customer-nation via
    orders) meet at the lineitem fact; both chains are broadcast, so
    the only shuffle is the final (nation, nation, year) aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    flip = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair | flip)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(fround(F.sum(F.expr(_REVENUE))).alias("revenue"))
    )


ORACLE["q7_volume_shipping"] = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {fround_sql(f"sum({_REVENUE})")} AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: top 20 customers by lost revenue on returned items in one
    quarter. Fact filtered before the join; customer/nation broadcast;
    one shuffle for the per-customer aggregate; deterministic LIMIT
    via (revenue DESC, c_custkey) tie-break."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(fround(F.sum(F.expr(_REVENUE))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", fround("c_acctbal").alias("c_acctbal"), "n_name")
    )


ORACLE["q10_returned_items"] = f"""
SELECT c_custkey, c_name, revenue,
       {fround_sql("c_acctbal")} AS c_acctbal, n_name
FROM (
  SELECT c_custkey, c_name, c_acctbal, n_name,
         {fround_sql(f"sum({_REVENUE})")} AS revenue
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= '1997-01-01' AND o_orderdate < '1997-04-01'
  GROUP BY 1, 2, 3, 4
) t
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promo revenue share for one month — conditional aggregate
    over a broadcast part join. The CASE folds into the same single
    aggregation pass; no second scan for the denominator."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.expr(_REVENUE)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            fround(F.lit(100.0) * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue_pct")
        )
    )


ORACLE["q14_promo_revenue"] = f"""
SELECT {fround_sql(f"100.0 * sum(CASE WHEN p_type = 'PROMO' THEN {_REVENUE} ELSE 0.0 END) / sum({_REVENUE})", 4)}
       AS promo_revenue_pct
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= '1997-09-01' AND l_shipdate < '1997-10-01'
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: customers with orders totalling > 250 units. The HAVING
    subquery aggregates the fact once, keyed on l_orderkey; the
    surviving (tiny) keyset joins back broadcast so neither orders nor
    lineitem reshuffles. Deterministic order by (totalprice DESC,
    o_orderkey)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            fround("o_totalprice").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


ORACLE["q18_large_orders"] = f"""
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       {fround_sql("o_totalprice")} AS o_totalprice, total_qty
FROM orders
JOIN (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250
) big ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: revenue from three disjunctive brand/size/quantity
    specs — the classic OR-of-ANDs predicate the optimizer must keep
    as a residual join filter while still pushing the common partkey
    equi-join down to a broadcast hash join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    spec1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 10))
        & (F.col("l_quantity").between(1, 15))
    )
    spec2 = (
        (F.col("p_brand") == "Brand#12")
        & (F.col("p_size").between(5, 20))
        & (F.col("l_quantity").between(10, 25))
    )
    spec3 = (
        (F.col("p_brand") == "Brand#24")
        & (F.col("p_size").between(10, 30))
        & (F.col("l_quantity").between(20, 35))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(spec1 | spec2 | spec3)
        .agg(fround(F.sum(F.expr(_REVENUE))).alias("revenue"))
    )


ORACLE["q19_discounted_revenue"] = f"""
SELECT {fround_sql(f"sum({_REVENUE})")} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 10  AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 5 AND 20  AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 20 AND 35)
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: one nation's share of revenue inside one region's market,
    by order year — a conditional-aggregate ratio over a two-chain
    star join (supplier nation for the share numerator, customer
    nation→region for the market filter). All dims broadcast; one
    fact shuffle for the year rollup."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n_cust = nation.join(
        region, nation["n_regionkey"] == region["r_regionkey"]
    ).filter(F.col("r_name") == "EUROPE").select(
        F.col("n_nationkey").alias("cn_key")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.expr(_REVENUE)
    target = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(fround(F.sum(target) / F.sum(rev), 6).alias("mkt_share"))
    )


ORACLE["q8_market_share"] = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {fround_sql(f"sum(CASE WHEN n2.n_name = 'NATION_3' THEN {_REVENUE} ELSE 0.0 END) / sum({_REVENUE})", 6)}
       AS mkt_share
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = c_nationkey
JOIN region ON r_regionkey = n1.n_regionkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n2 ON n2.n_nationkey = s_nationkey
WHERE r_name = 'EUROPE'
GROUP BY 1
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: distribution of customers by order count, including
    zero-order customers — LEFT join then two stacked aggregations
    (count per customer, then customers per count)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


ORACLE["q13_customer_distribution"] = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with maximum revenue in a quarter — an
    aggregate feeding a scalar-subquery max (expressed as a broadcast
    join against the 1-row max frame, the plan a WHERE = (SELECT max)
    decorrelates to)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (
        li.groupBy("l_suppkey")
        .agg(fround(F.sum(F.expr(_REVENUE))).alias("total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(max_rev), rev["total_revenue"] == max_rev["mx"])
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


ORACLE["q15_top_supplier"] = f"""
WITH rev AS (
  SELECT l_suppkey, {fround_sql(f"sum({_REVENUE})")} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue lost to small-quantity orders for one brand/type —
    the classic correlated scalar subquery (per-part average quantity),
    decorrelated into an aggregate-then-join-back. The tiny qualifying
    part list broadcasts into the fact scan FIRST so both the average
    and the final filter touch only matching rows; the per-part
    threshold frame (≤ |matching parts| rows) then broadcasts back, so
    the fact never shuffles. Recomputing the filtered scan on the
    second branch is deliberate: at 100 TB a pushed-down parquet scan
    is cheaper than caching the branch. The threshold is ``fround``-ed
    before comparison so Spark and DuckDB agree on boundary rows.

    (Adapted to the driver testdata: p_type stands in for TPC-H's
    p_container, which this part table lacks; reference has no joins
    or subqueries at all — SURVEY.md §2c.)"""
    part_f = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#1") & (F.col("p_type") == "PROMO"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    li_f = li.join(F.broadcast(part_f), F.col("l_partkey") == F.col("p_partkey"))
    thresh = (
        li_f.groupBy("l_partkey")
        .agg(fround(F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh"))
        .select(F.col("l_partkey").alias("t_partkey"), "qty_thresh")
    )
    return (
        li_f.join(F.broadcast(thresh), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(fround(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


ORACLE["q17_small_qty_revenue"] = f"""
SELECT {fround_sql("sum(l_extendedprice) / 7.0")} AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1' AND p_type = 'PROMO'
  AND l_quantity < (
    SELECT {fround_sql("0.2 * avg(l_quantity)")}
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22: well-funded customers gone dormant — above-average account
    balance (scalar subquery, a 1-row broadcast nested-loop), in target
    segments, with NO order since 2001 (anti join). The anti join is
    deliberately NOT broadcast-hinted: the recent-orders side is a
    date-filtered fact projection that can be large at 100 TB, so the
    correct plan is a key-shuffled anti join (AQE downgrades it to
    broadcast when the window is small). Threshold ``fround``-ed before
    comparison so both engines agree on boundary rows.

    (Adapted to the driver testdata: c_mktsegment stands in for TPC-H's
    phone country code, and "dormant since 2001" for "no orders ever" —
    every customer here has at least one order.)"""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    thresh = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(fround(F.avg("c_acctbal")).alias("avg_bal"))
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2001-01-01")
        .select("o_custkey")
    )
    return (
        cust.filter(
            F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING", "MACHINERY")
        )
        .join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            fround(F.sum("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE["q22_dormant_customers"] = f"""
SELECT c_mktsegment, count(*) AS numcust,
       {fround_sql("sum(c_acctbal)")} AS totacctbal
FROM customer c
WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
  AND c_acctbal > (
    SELECT {fround_sql("avg(c_acctbal)")} FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= '2001-01-01'
  )
GROUP BY 1
ORDER BY 1
"""


QUERIES = {
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q10_returned_items": q10_returned_items,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q22_dormant_customers": q22_dormant_customers,
}
