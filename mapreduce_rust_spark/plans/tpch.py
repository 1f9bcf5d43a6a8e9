"""TPC-H-derived analytics suite — all 22 query shapes (q1/q3/q5 live
in analytics.py; the rest here).

The reference has NO join, filter, or aggregate operators (SURVEY.md
§2c) — its whole query surface is map→group→reduce. This module is
engine extension surface: the classic decision-support shapes a user
of a general analytics engine runs daily, adapted to the driver
testdata's TPC-H subset. The testdata lacks partsupp, commit/receipt
dates, and shipmode, so q2/q4/q9/q11/q12/q16/q20/q21 keep their PLAN
SHAPE (correlated min-subquery, EXISTS semi join, star join,
threshold HAVING, conditional agg, NOT-IN anti join, nested-IN chain,
double EXISTS/NOT-EXISTS) on stand-in columns, documented per query.

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


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each qualifying part, the best supplier within a
    region — the classic correlated min-subquery, decorrelated into a
    per-part min + equality join-back. Supplier "cost" stands in as
    ``s_acctbal`` (the testdata has no partsupp table; supplier-part
    relationships come from distinct lineitem pairs). All dims
    broadcast; the only fact-side work is the distinct pair projection,
    which prunes lineitem to two int columns at scan time.

    (Reference has no joins/subqueries at all — SURVEY.md §2c.)"""
    part_f = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_name")
    )
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    supp_r = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(load_table(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = pairs.join(
        F.broadcast(part_f), F.col("l_partkey") == F.col("p_partkey")
    ).join(F.broadcast(supp_r), F.col("l_suppkey") == F.col("s_suppkey"))
    min_bal = cand.groupBy(F.col("p_partkey").alias("m_partkey")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        cand.join(
            F.broadcast(min_bal),
            (F.col("p_partkey") == F.col("m_partkey"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .select(
            fround("s_acctbal").alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
        )
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_name")
        .limit(100)
    )


ORACLE["q2_min_cost_supplier"] = f"""
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
cand AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
  FROM pairs
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
)
SELECT {fround_sql("s_acctbal")} AS s_acctbal, s_name, n_name, p_partkey, p_name
FROM cand c
WHERE s_acctbal = (SELECT min(s_acctbal) FROM cand c2 WHERE c2.p_partkey = c.p_partkey)
ORDER BY s_acctbal DESC, p_partkey, s_name
LIMIT 100
"""


def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: order count per priority where EXISTS a qualifying
    lineitem — a left-semi join (the testdata lacks commit/receipt
    dates, so "late line" stands in as a returned line). The semi join
    shuffles on orderkey once; at 100 TB AQE picks shuffled-hash vs
    broadcast by the filtered fact size."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-07-01") & (F.col("o_orderdate") < "1997-10-01")
    )
    late = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(late, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORACLE["q4_priority_check"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= '1997-07-01' AND o_orderdate < '1997-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  )
GROUP BY 1
ORDER BY 1
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit by supplier nation and order year over a
    name-filtered part set — the biggest star join in the suite
    (lineitem ⋈ part ⋈ supplier ⋈ nation ⋈ orders). Part cost stands
    in as ``p_retailprice`` (no partsupp in the testdata). Dims all
    broadcast; the fact shuffles once for the (nation, year) rollup."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    part_f = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("blue"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = F.expr(_REVENUE) - F.col("p_retailprice") * F.col("l_quantity") / 100.0
    return (
        li.join(F.broadcast(part_f), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(fround(F.sum(profit)).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


ORACLE["q9_product_profit"] = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {fround_sql(f"sum({_REVENUE} - p_retailprice * l_quantity / 100.0)")} AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '%blue%'
GROUP BY 1, 2
ORDER BY 1, 2 DESC
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose shipped value (by one nation's
    suppliers) exceeds a fraction of that nation's total — per-group
    aggregate HAVING > scalar-subquery threshold, decorrelated into a
    1-row broadcast. Value is shipped revenue (no partsupp availqty in
    the testdata). Both branches reuse one nation-filtered frame; the
    threshold is fround-ed so boundary rows agree across engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    supp_n = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name") == "NATION_5")
        .select("s_suppkey")
    )
    li_n = li.join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
    per_part = li_n.groupBy("l_partkey").agg(
        F.sum("l_extendedprice").alias("raw_value")
    )
    thresh = per_part.agg(
        fround(F.sum("raw_value") * 0.002).alias("cutoff")
    )
    return (
        per_part.join(F.broadcast(thresh))
        .filter(F.col("raw_value") > F.col("cutoff"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            fround("raw_value").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


ORACLE["q11_important_parts"] = f"""
WITH li_n AS (
  SELECT l_partkey, l_extendedprice
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_5'
),
per_part AS (
  SELECT l_partkey, sum(l_extendedprice) AS raw_value
  FROM li_n GROUP BY 1
)
SELECT l_partkey AS p_partkey, {fround_sql("raw_value")} AS part_value
FROM per_part
WHERE raw_value > (SELECT {fround_sql("sum(raw_value) * 0.002")} FROM per_part)
ORDER BY part_value DESC, p_partkey
"""


def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: per line-class, how many high- vs low-priority
    orders shipped in a year — join + conditional aggregation.
    ``l_returnflag`` stands in for shipmode (testdata has none); the
    CASE pair folds into one aggregation pass over a single
    orderkey-shuffled join (AQE may broadcast the filtered fact)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_returnflag").isin("A", "R"))
        & (F.col("l_shipdate") >= "1998-01-01")
        & (F.col("l_shipdate") < "1999-01-01")
    ).select("l_orderkey", "l_returnflag")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


ORACLE["q12_priority_lines"] = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_returnflag IN ('A', 'R')
  AND l_shipdate >= '1998-01-01' AND l_shipdate < '1999-01-01'
GROUP BY 1
ORDER BY 1
"""


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct supplier count per part attribute group,
    excluding a blocklisted supplier set — NOT-IN anti join + distinct
    aggregation. Supplier-part pairs come from lineitem (no partsupp);
    "complaint" suppliers stand in as negative-balance ones. The anti
    join is a 100-row broadcast; countDistinct shuffles once on the
    attribute group."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part_f = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#13")
            & (~F.col("p_type").isin("PROMO"))
            & (F.col("p_size").isin(1, 9, 15, 22, 30, 38, 44, 50))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        pairs.join(F.broadcast(part_f), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


ORACLE["q16_supplier_count"] = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 15, 22, 30, 38, 44, 50)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers in one nation who shipped a significant
    volume of a name-filtered part set in one year — nested IN
    subqueries decorrelated into aggregate → semi-join chain. The
    per-(supplier, part) volume aggregate shuffles the filtered fact
    once; everything else is broadcast."""
    part_f = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    heavy = (
        li.join(F.broadcast(part_f), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name") == "NATION_2")
    )
    return (
        supp.join(F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", fround("s_acctbal").alias("s_acctbal"))
        .orderBy("s_suppkey")
    )


ORACLE["q20_promo_suppliers"] = f"""
SELECT s_suppkey, s_name, {fround_sql("s_acctbal")} AS s_acctbal
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name = 'NATION_2'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 50
  )
ORDER BY s_suppkey
"""


def q21_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the SOLE faulty supplier on a
    multi-supplier order — the double correlated EXISTS / NOT EXISTS,
    decorrelated into one per-order aggregate ("how many distinct
    suppliers, how many distinct faulty suppliers") joined back to the
    faulty lines. One pass over the fact computes both counts — versus
    the naive plan's two extra self-joins of lineitem, the decisive
    rewrite at 100 TB. "Faulty" stands in as returnflag='R' (no
    receipt/commit dates in the testdata)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_order = li.groupBy(F.col("l_orderkey").alias("g_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_fail_supp"),
    )
    faulty = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    supp_n = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name") == "NATION_1")
        .select("s_suppkey", "s_name")
    )
    return (
        faulty.join(
            per_order,
            (F.col("l_orderkey") == F.col("g_orderkey"))
            & (F.col("n_supp") > 1)
            & (F.col("n_fail_supp") == 1),
        )
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


ORACLE["q21_suppliers_waiting"] = """
SELECT s_name, count(*) AS numwait
FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R') l1
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name = 'NATION_1'
  AND EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT 100
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
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q4_priority_check": q4_priority_check,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q12_priority_lines": q12_priority_lines,
    "q16_supplier_count": q16_supplier_count,
    "q20_promo_suppliers": q20_promo_suppliers,
    "q21_suppliers_waiting": q21_suppliers_waiting,
}
