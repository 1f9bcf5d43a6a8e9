"""Analytics breadth queries (SURVEY.md §2c — capabilities the
reference lacks entirely, provided by the Spark engine as first-class
surface): joins of every flavor, window functions, rollup/pivot,
set ops, date/JSON functions, sessionization.

Scale notes applied throughout:

* Dimension sides (region/nation/supplier/customer) are broadcast —
  at 100 TB the fact tables (lineitem/orders/events) must never
  shuffle for a dim join. ``F.broadcast`` hints make that explicit
  rather than relying on the autoBroadcast threshold.
* Window partitions are keyed on high-cardinality columns (suppkey,
  user_id) so no single partition approaches executor memory.
* Sort+limit top-k uses Spark's TakeOrderedAndProject (no global
  sort materialization).
* All float aggregates are rounded in BOTH engines so the driver's
  value-hash comparison is stable across summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreduce_rust_spark.functions.numeric import fround, fround_sql, single_partition
from mapreduce_rust_spark.sources.tables import load_table

ORACLE: dict[str, str] = {}

def _revenue():
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) adapted to the testdata date
    range. Single scan → partial+final hash aggregate; the filter and
    the 7-column projection push down to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fround(F.sum("l_quantity")).alias("sum_qty"),
            fround(F.sum("l_extendedprice")).alias("sum_base_price"),
            fround(F.sum(_revenue())).alias("sum_disc_price"),
            fround(F.sum(_revenue() * (1 + F.col("l_tax")))).alias("sum_charge"),
            fround(F.avg("l_quantity"), 4).alias("avg_qty"),
            fround(F.avg("l_extendedprice"), 4).alias("avg_price"),
            fround(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE["q1_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       floor(round((sum(l_quantity)), 6) * 100) / 100 AS sum_qty,
       floor(round((sum(l_extendedprice)), 6) * 100) / 100 AS sum_base_price,
       floor(round((sum(l_extendedprice * (1 - l_discount))), 6) * 100) / 100 AS sum_disc_price,
       floor(round((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))), 6) * 100) / 100 AS sum_charge,
       floor(round((avg(l_quantity)), 8) * 10000) / 10000 AS avg_qty,
       floor(round((avg(l_extendedprice)), 8) * 10000) / 10000 AS avg_price,
       floor(round((avg(l_discount)), 8) * 10000) / 10000 AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: join customer⋈orders⋈lineitem, top-10 open orders by
    revenue. Customer (filtered) broadcasts; orders⋈lineitem shuffles
    on the join key. Deterministic under ties via orderkey."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-30").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-30").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(fround(F.sum(_revenue())).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


ORACLE["q3_shipping_priority"] = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       floor(round((sum(l_extendedprice * (1 - l_discount))), 6) * 100) / 100 AS revenue
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-30'
  AND l_shipdate > TIMESTAMP '1998-06-30'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-table join, revenue by nation within one region.
    region/nation/supplier broadcast (constant or near-constant size
    at any SF); only lineitem⋈orders shuffles."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(fround(F.sum(_revenue())).alias("revenue"))
    )


ORACLE["q5_local_supplier"] = """
SELECT n_name, floor(round((sum(l_extendedprice * (1 - l_discount))), 6) * 100) / 100 AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY n_name
"""


def top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by total price within each order priority —
    rank-over-window, the canonical top-k-per-group. Partition key is
    low-cardinality here but bounded; at scale prefer a pre-filter
    (approximate per-group threshold) before the window."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_orderpriority",
            "rn",
            "o_orderkey",
            fround("o_totalprice").alias("price"),
        )
    )


ORACLE["top_k_per_group"] = """
SELECT o_orderpriority, rn, o_orderkey, floor(round((o_totalprice), 6) * 100) / 100 AS price
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per supplier in ship order, accumulated in
    integer cents. Floating-point window sums are NOT cross-engine
    comparable even with a deterministic ORDER BY (DuckDB accumulates
    window frames via a segment tree, i.e. a different summation
    order), so each row's revenue is truncated to exact cents first —
    integer addition is order-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(_revenue() * 100).cast("bigint")
    # (l_orderkey, l_linenumber) is NOT unique in the testdata (true
    # duplicate key rows exist at sf0.1), so the cents value itself is
    # the final tie-break: rows that still tie are identical in the
    # summand and any residual order is cumsum-invariant. Without this
    # the two engines pick different prefix orders on tied keys and
    # one intermediate running value differs.
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", cents)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.sum(cents).over(w) / 100).alias("running_revenue"),
    )


ORACLE["window_running_sum"] = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) OVER (
         PARTITION BY l_suppkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber,
                  CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100 AS running_revenue
FROM lineitem
"""


def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over returnflag × linestatus: subtotal + grand-total
    rows. Spark plans this as a single Expand+aggregate — one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        fround(F.sum("l_quantity")).alias("sum_qty"),
    )


def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over returnflag × linestatus: every subtotal combination
    including per-linestatus-only rows ROLLUP omits. Same single
    Expand+aggregate pass, 4 grouping sets instead of 3."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        fround(F.sum("l_quantity")).alias("sum_qty"),
    )


ORACLE["cube_agg"] = """
SELECT l_returnflag, l_linestatus, count(*) AS cnt,
       floor(round(sum(l_quantity), 6) * 100) / 100 AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT — Spark plans TakeOrderedAndProject:
    each partition keeps its local top-k and the driver merges k×P
    rows, so there is NO global sort shuffle (plan-asserted in
    tests/test_scale.py). The 100 TB-safe form of "give me the top
    100"."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            fround("l_extendedprice").alias("price"),
        )
        .orderBy(F.col("price").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


ORACLE["global_topk"] = """
SELECT l_orderkey, l_linenumber,
       floor(round(l_extendedprice, 6) * 100) / 100 AS price
FROM lineitem
ORDER BY price DESC, l_orderkey, l_linenumber
LIMIT 100
"""


ORACLE["rollup_agg"] = """
SELECT l_returnflag, l_linestatus, count(*) AS cnt,
       floor(round((sum(l_quantity)), 6) * 100) / 100 AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (explicit value list so the plan
    needs no extra discovery pass — required at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(fround(F.sum("l_quantity")))
    )
    return out.select(
        "l_returnflag",
        F.col("F").alias("qty_F"),
        F.col("O").alias("qty_O"),
    )


ORACLE["pivot_agg"] = """
SELECT l_returnflag,
       floor(round((sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END)), 6) * 100) / 100 AS qty_F,
       floor(round((sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END)), 6) * 100) / 100 AS qty_O
FROM lineitem GROUP BY l_returnflag
"""


def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS): customers having at least one high-value
    order. The probe side streams; no row multiplication."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


ORACLE["semi_join"] = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
"""


def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI (NOT EXISTS): customers with no very-high-value order
    (threshold chosen so the result is non-empty at every SF)."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


ORACLE["anti_join"] = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT DISTINCT: (user, day) pairs with a click but no purchase
    (day granularity keeps the result non-empty at every SF)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", day)
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id", day)
    return clicks.subtract(buys)


ORACLE["set_except"] = """
SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
FROM events WHERE event_type = 'purchase'
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT DISTINCT: users who both clicked and purchased."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys)


ORACLE["set_intersect"] = """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function aggregation: monthly order volume and value."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"), "o_totalprice"
        )
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            fround(F.sum("o_totalprice")).alias("total_value"),
        )
    )


ORACLE["orders_by_month"] = """
SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n_orders,
       floor(round((sum(o_totalprice)), 6) * 100) / 100 AS total_value
FROM orders GROUP BY 1
"""


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: extract an int field from the JSON
    ``props`` column (Spark: get_json_object — JVM-side JSON path)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.get_json_object("props", "$.k").cast("bigint").alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


ORACLE["events_json_extract"] = r"""
SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k,
       count(*) AS cnt
FROM events GROUP BY 1
"""


def variant_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the Spark 4 VARIANT type:
    ``parse_json`` encodes ``props`` once into the binary variant
    form, then typed path extraction (``try_variant_get``) and
    ``schema_of_variant`` run against that encoding — the
    parse-once / extract-many layout that replaces per-path JSON
    string re-parsing (``events_json_extract`` is the string-path
    twin) and is the engine's answer to open schemas at 100 TB.
    try_variant_get's null-on-mismatch matches the oracle's TRY_CAST
    semantics; the per-type rollup checks count, sum, min/max of the
    extracted field plus the inferred variant schema."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"), F.schema_of_variant(v).alias("vschema"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.min("vschema").alias("variant_schema"),
        )
        .orderBy("event_type")
    )


ORACLE["variant_json_suite"] = """
SELECT event_type, count(*) AS cnt,
       CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       min(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       'OBJECT<k: BIGINT>' AS variant_schema
FROM events
GROUP BY 1 ORDER BY 1
"""


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag window +
    cumulative flags — the batch analogue of a session window. The
    streaming variant lives in ``streaming/``."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    # exact integer microseconds: unix_timestamp() truncates to whole
    # seconds, which disagrees with the oracle's exact INTERVAL
    # comparison for gaps within a second of the 30-min boundary (the
    # events table has sub-second timestamps and such gaps exist)
    new_sess = F.when(
        prev.isNull()
        | (F.unix_micros("ts") - F.unix_micros(prev) > 1_800_000_000),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("new_sess", new_sess)
        .groupBy("user_id")
        .agg(
            F.sum("new_sess").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


ORACLE["sessionize"] = """
SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
) GROUP BY user_id
"""


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (1 h) in batch form — mirrors the
    streaming windowed aggregation in ``streaming/``."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
            "event_type",
            "value",
        )
        .groupBy("hour", "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            fround(F.sum("value")).alias("sum_value"),
        )
    )


ORACLE["events_hourly"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
       event_type, count(*) AS cnt, floor(round((sum(value)), 6) * 100) / 100 AS sum_value
FROM events GROUP BY 1, 2
"""


def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape with Spark's native ``unpivot`` (melt): the
    inverse of ``pivot_agg``. Part's numeric attributes become
    (attribute, value) rows — a pure per-row narrow transform, no
    shuffle except the final presentation sort; at scale this is a
    zero-shuffle map over the scan."""
    part = load_table(spark, sf_dir, "part")
    melted = part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    ).unpivot("p_partkey", ["size", "retailprice"], "attribute", "val")
    return (
        melted.groupBy("attribute")
        .agg(
            F.count(F.lit(1)).alias("n"),
            fround(F.avg("val"), 4).alias("avg_val"),
            fround(F.max("val")).alias("max_val"),
        )
        .orderBy("attribute")
    )


ORACLE["unpivot_melt"] = """
WITH melted AS (
  SELECT p_partkey, 'size' AS attribute, CAST(p_size AS DOUBLE) AS val FROM part
  UNION ALL
  SELECT p_partkey, 'retailprice', p_retailprice FROM part
)
SELECT attribute, count(*) AS n,
       floor(round(avg(val), 8) * 10000) / 10000 AS avg_val,
       floor(round((max(val)), 6) * 100) / 100 AS max_val
FROM melted GROUP BY 1 ORDER BY 1
"""


def cdc_upsert_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert semantics (apply a change batch to a snapshot)
    composed from a full-outer join — what a lakehouse MERGE INTO
    compiles to when the engine lacks a native one. Change batch:
    every customer with an order after 2001-06 gets its account
    balance bumped by its recent spend (update); synthetic new
    customers (key + 10000) are inserts. Survivors = untouched +
    updated + inserted, summarized per segment so the result is
    compact at any scale."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2001-06-01")
        .groupBy(F.col("o_custkey").alias("u_key"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend"))
    )
    updates = recent.select(
        "u_key",
        F.lit(None).cast("string").alias("u_segment"),
        F.col("spend").cast("double").alias("delta"),
    )
    inserts = recent.select(
        (F.col("u_key") + 10000).alias("u_key"),
        F.lit("NEW").alias("u_segment"),
        F.col("spend").cast("double").alias("delta"),
    )
    changes = updates.unionByName(inserts)
    merged = (
        cust.join(changes, cust["c_custkey"] == changes["u_key"], "full_outer")
        .select(
            F.coalesce("c_custkey", "u_key").alias("custkey"),
            F.coalesce("u_segment", "c_mktsegment").alias("segment"),
            (
                F.coalesce(F.col("c_acctbal").cast("decimal(18,2)"), F.lit(0))
                + F.coalesce(F.col("delta").cast("decimal(18,2)"), F.lit(0))
            ).alias("balance"),
        )
    )
    return (
        merged.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("balance").cast("double").alias("total_balance"),
        )
        .orderBy("segment")
    )


ORACLE["cdc_upsert_apply"] = """
WITH recent AS (
  SELECT o_custkey AS u_key, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
  FROM orders WHERE o_orderdate >= '2001-06-01' GROUP BY 1
),
changes AS (
  SELECT u_key, NULL AS u_segment, CAST(spend AS DOUBLE) AS delta FROM recent
  UNION ALL
  SELECT u_key + 10000, 'NEW', CAST(spend AS DOUBLE) FROM recent
),
merged AS (
  SELECT coalesce(c_custkey, u_key) AS custkey,
         coalesce(u_segment, c_mktsegment) AS segment,
         coalesce(CAST(c_acctbal AS DECIMAL(18,2)), 0)
           + coalesce(CAST(delta AS DECIMAL(18,2)), 0) AS balance
  FROM customer FULL OUTER JOIN changes ON c_custkey = u_key
)
SELECT segment, count(*) AS n_rows,
       CAST(sum(balance) AS DOUBLE) AS total_balance
FROM merged GROUP BY 1 ORDER BY 1
"""


def complex_types_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-type surface in one pass: collect each order's
    quantities into a sorted array, then drive the array
    higher-order functions (aggregate-fold, filter, transform, slice)
    entirely JVM-side — the nested-data shape (array columns per
    entity) every feature store and training-example assembler needs.
    One shuffle on the (high-cardinality) order key; every derived
    column computes per-row on the collected array. Quantities are
    integer-valued in the data, cast to bigint so the folds are exact
    integer arithmetic in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = (
        li.filter(F.col("l_orderkey") % 20 == 0)
        .select("l_orderkey", F.col("l_quantity").cast("bigint").alias("q"))
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("q")).alias("qs"))
    )
    return per_order.select(
        "l_orderkey",
        F.size("qs").alias("n_items"),
        F.aggregate("qs", F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias(
            "total_qty"
        ),
        F.array_max("qs").alias("max_qty"),
        F.size(F.filter("qs", lambda x: x < 10)).alias("n_small"),
        F.concat_ws(
            ",", F.transform(F.slice("qs", 1, 3), lambda x: x.cast("string"))
        ).alias("first3"),
    )


ORACLE["complex_types_suite"] = """
WITH per_order AS (
  SELECT l_orderkey, list(CAST(l_quantity AS BIGINT) ORDER BY CAST(l_quantity AS BIGINT)) AS qs
  FROM lineitem
  WHERE l_orderkey % 20 = 0
  GROUP BY l_orderkey
)
SELECT l_orderkey,
       len(qs) AS n_items,
       CAST(list_sum(qs) AS BIGINT) AS total_qty,
       list_max(qs) AS max_qty,
       len(list_filter(qs, x -> x < 10)) AS n_small,
       array_to_string(list_transform(qs[1:3], x -> CAST(x AS VARCHAR)), ',') AS first3
FROM per_order
"""


def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer Recency (days since last
    order), Frequency (order count), Monetary (total spend), each
    scored into quartiles 0-3 against exact interpolated quartile
    boundaries — the classic marketing/value segmentation, built
    scale-first: one fact aggregation to the per-customer frame, one
    tiny boundary aggregate broadcast back, NO global sort (same
    trick as quantile_bins; an ntile() formulation would range-sort
    every customer through one partition). Output: one row per
    (r_score, f_score, m_score) cell with counts.

    Recency is measured against the dataset's own max order date
    (integer day diff) so the query is deterministic, not
    wall-clock-dependent."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.sum("o_totalprice").alias("raw_monetary"),
    )
    anchor = orders.agg(F.max("o_orderdate").alias("anchor"))
    base = per_cust.join(F.broadcast(anchor)).select(
        "o_custkey",
        F.datediff("anchor", "last_order").cast("double").alias("recency_days"),
        F.col("freq").cast("double").alias("freq"),
        # grid-snap the float sum: partial-agg order differs between
        # engines, and an ulp of noise on a value lying exactly on a
        # quartile boundary would flip its score
        F.expr(fround_sql("cast(raw_monetary as double)", 4)).alias("monetary"),
    )
    # snap interpolated boundaries to the same 1e-4 grid as
    # quantile_bin_counts — Spark and DuckDB interpolate quantiles
    # with different arithmetic (see that function's doc)
    _snap = f"x -> {fround_sql('x', 4)}"
    bnds = base.agg(
        F.expr(f"transform(percentile(recency_days, array(0.25, 0.5, 0.75)), {_snap})").alias("rb"),
        F.expr(f"transform(percentile(freq, array(0.25, 0.5, 0.75)), {_snap})").alias("fb"),
        F.expr(f"transform(percentile(monetary, array(0.25, 0.5, 0.75)), {_snap})").alias("mb"),
    )
    scored = base.join(F.broadcast(bnds)).select(
        # low recency_days = GOOD: invert so 3 is best, like f/m
        (3 - F.size(F.filter("rb", lambda b: b <= F.col("recency_days"))))
        .cast("bigint")
        .alias("r_score"),
        F.size(F.filter("fb", lambda b: b <= F.col("freq"))).cast("bigint").alias("f_score"),
        F.size(F.filter("mb", lambda b: b <= F.col("monetary"))).cast("bigint").alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("r_score", "f_score", "m_score")
    )


ORACLE["customer_rfm"] = f"""
WITH per_cust AS (
  SELECT o_custkey, max(o_orderdate) AS last_order,
         count(*) AS freq, sum(o_totalprice) AS raw_monetary
  FROM orders GROUP BY 1
),
anchor AS (SELECT max(o_orderdate) AS anchor FROM orders),
base AS (
  SELECT o_custkey,
         CAST(datediff('day', last_order, anchor) AS DOUBLE) AS recency_days,
         CAST(freq AS DOUBLE) AS freq,
         {fround_sql("CAST(raw_monetary AS DOUBLE)", 4)} AS monetary
  FROM per_cust CROSS JOIN anchor
),
bnds AS (
  SELECT list_transform(quantile_cont(recency_days, [0.25, 0.5, 0.75]),
                        x -> {fround_sql("x", 4)}) AS rb,
         list_transform(quantile_cont(freq, [0.25, 0.5, 0.75]),
                        x -> {fround_sql("x", 4)}) AS fb,
         list_transform(quantile_cont(monetary, [0.25, 0.5, 0.75]),
                        x -> {fround_sql("x", 4)}) AS mb
  FROM base
),
scored AS (
  SELECT 3 - len(list_filter(rb, x -> x <= recency_days)) AS r_score,
         len(list_filter(fb, x -> x <= freq)) AS f_score,
         len(list_filter(mb, x -> x <= monetary)) AS m_score
  FROM base CROSS JOIN bnds
)
SELECT r_score, f_score, m_score, count(*) AS n_customers
FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the 20 part pairs most often
    ordered together. The pair explosion happens per order from the
    collected part array (bounded: an order of n lines yields
    n·(n−1)/2 pairs, n ≤ 7 in TPC-H geometry), so the shuffle keys
    are (part, part) pair ids — never an unbounded self-join of the
    fact against itself. Distinct parts per order first: duplicate
    lines of the same part must not inflate the pair count."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        _basket_pair_counts(li)
        .orderBy(F.col("n_orders").desc(), "p1", "p2")
        .limit(20)
    )


def _basket_pair_counts(
    li: DataFrame, baskets: DataFrame | None = None
) -> DataFrame:
    """(p1, p2, n_orders) co-occurrence counts with p1 < p2, via the
    bounded per-order array explosion (shared by the top-pairs and
    association-rule slugs). Pass a pre-built (persisted) distinct
    basket frame to share the scan with other branches."""
    if baskets is None:
        baskets = li.select("l_orderkey", "l_partkey").distinct()
    baskets = baskets.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_partkey")).alias("parts")
    )
    pairs = baskets.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        F.col("parts"),
                        lambda a: F.transform(F.col("parts"), lambda b: F.struct(a.alias("p1"), b.alias("p2"))),
                    )
                ),
                lambda st: st["p1"] < st["p2"],
            )
        ).alias("pair")
    ).select(F.col("pair.p1").alias("p1"), F.col("pair.p2").alias("p2"))
    return pairs.groupBy("p1", "p2").agg(F.count(F.lit(1)).alias("n_orders"))


ORACLE["basket_part_pairs"] = """
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_orders
FROM baskets a JOIN baskets b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, p1, p2
LIMIT 20
"""


def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASSOCIATION RULES over the basket pairs: support, directional
    confidence, and lift per co-ordered part pair — the metric layer
    that turns raw co-occurrence counts into 'customers who bought X
    also buy Y'. All inputs are exact integers (pair count, per-item
    basket counts, total baskets), so every ratio is one IEEE division
    — bit-identical across engines, no rounding gymnastics. The item
    frame is part-dimension-sized (broadcast); the total is a 1-row
    aggregate cross-joined in. Top 20 by lift among pairs seen ≥ 2×."""
    li = load_table(spark, sf_dir, "lineitem")
    # the distinct basket frame feeds three branches; deliberately NOT
    # persisted — a cache boundary materializes at the session's full
    # shuffle-partition count and blocks AQE coalescing (measured 6.8 s
    # cached vs 3.1 s recomputed at sf0.1), and the parquet scan it
    # would save is the cheap part
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    pair_counts = _basket_pair_counts(li, baskets=baskets).filter(
        F.col("n_orders") >= 2
    )
    item = baskets.groupBy(F.col("l_partkey").alias("p")).agg(
        F.count(F.lit(1)).alias("n_item")
    )
    total = baskets.agg(F.countDistinct("l_orderkey").alias("n_total"))
    joined = (
        pair_counts.join(
            F.broadcast(item.select(F.col("p").alias("p1"), F.col("n_item").alias("n1"))),
            "p1",
        )
        .join(
            F.broadcast(item.select(F.col("p").alias("p2"), F.col("n_item").alias("n2"))),
            "p2",
        )
        .crossJoin(F.broadcast(total))
    )
    return (
        joined.select(
            "p1",
            "p2",
            "n_orders",
            (F.col("n_orders") / F.col("n_total")).alias("support"),
            (F.col("n_orders") / F.col("n1")).alias("conf_p1_to_p2"),
            (F.col("n_orders") / F.col("n2")).alias("conf_p2_to_p1"),
            (
                F.col("n_orders") * F.col("n_total") / (F.col("n1") * F.col("n2"))
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "p1", "p2")
        .limit(20)
    )


ORACLE["basket_association_rules"] = """
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_orders
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
item AS (SELECT l_partkey AS p, count(*) AS n_item FROM baskets GROUP BY 1),
total AS (SELECT count(DISTINCT l_orderkey) AS n_total FROM baskets)
SELECT p1, p2, n_orders,
       CAST(n_orders AS DOUBLE) / n_total AS support,
       CAST(n_orders AS DOUBLE) / i1.n_item AS conf_p1_to_p2,
       CAST(n_orders AS DOUBLE) / i2.n_item AS conf_p2_to_p1,
       CAST(n_orders * n_total AS DOUBLE) / (i1.n_item * i2.n_item) AS lift
FROM pairs
JOIN item i1 ON i1.p = p1
JOIN item i2 ON i2.p = p2
CROSS JOIN total
ORDER BY lift DESC, p1, p2
LIMIT 20
"""


def json_key_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema profiling: census of the JSON keys in
    the events ``props`` column — per key: rows carrying it, distinct
    values, numeric min/max. The schema-inference report a pipeline
    runs before promoting a free-form JSON blob to real columns.
    ``from_json`` to a map + ``explode`` keeps parsing JVM-side; the
    aggregation keys on the (tiny) key space. (Duplicate keys within
    one object diverge by design between engines — Spark's map is
    last-wins, the oracle's unnest sees each occurrence — valid JSON
    from any sane producer has unique keys.)"""
    ev = load_table(spark, sf_dir, "events")
    kv = ev.select(
        F.explode(F.from_json("props", "map<string,string>")).alias("k", "v")
    )
    return (
        kv.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("v").alias("n_distinct"),
            # try_cast, not cast: Spark 4 runs ANSI mode by default, so
            # a plain cast CRASHES on non-numeric values while the
            # oracle's TRY_CAST yields NULL — current testdata is all-
            # numeric but the layout varies per round
            fround(F.min(F.col("v").try_cast("double")), 4).alias("min_num"),
            fround(F.max(F.col("v").try_cast("double")), 4).alias("max_num"),
        )
        .orderBy("k")
    )


ORACLE["json_key_census"] = f"""
WITH kv AS (
  SELECT u.k, json_extract_string(e.props, '$.\"' || u.k || '\"') AS v
  FROM events e, unnest(json_keys(e.props)) AS u(k)
)
SELECT k, count(*) AS n_rows,
       count(DISTINCT v) AS n_distinct,
       {fround_sql("min(TRY_CAST(v AS DOUBLE))", 4)} AS min_num,
       {fround_sql("max(TRY_CAST(v AS DOUBLE))", 4)} AS max_num
FROM kv
GROUP BY k
ORDER BY k
"""


_ABC_BAND = 100_000.0  # revenue band width for the distributed prefix-sum


def abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC inventory classification: parts ranked by revenue,
    classified A (first 80% of cumulative revenue), B (next 15%), C
    (tail 5%) — the 80/20 report behind stocking and curation
    decisions. The cumulative sum over the revenue-DESC order is
    DISTRIBUTED: parts bucket into fixed-width revenue bands (band
    order ≡ revenue order, band count bounded by max part revenue /
    width — independent of part count), per-band totals prefix-sum
    over the tiny band list, and each part adds its within-band
    running sum — no part-count-sized single-partition window, the
    same two-phase shape as ``late_data_audit``'s prefix-max. Per-part
    revenue is fround-snapped BEFORE ranking so both engines order
    identically; ties break on partkey. Output is the 3-row class
    census."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        fround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "rev"
        )
    )
    banded = rev.withColumn(
        "bkt", (-F.floor(F.col("rev") / _ABC_BAND)).cast("bigint")
    )
    bsum = banded.groupBy("bkt").agg(F.sum("rev").alias("bsum"))
    bsum1, w0 = single_partition(bsum, by=["bkt"])
    w_prev = w0.rowsBetween(W.unboundedPreceding, -1)
    prev = bsum1.select(
        "bkt", F.coalesce(F.sum("bsum").over(w_prev), F.lit(0.0)).alias("prev")
    )
    total = rev.agg(F.sum("rev").alias("total"))
    w_run = (
        W.partitionBy("bkt")
        .orderBy(F.col("rev").desc(), "partkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = (
        banded.join(F.broadcast(prev), "bkt")
        .join(F.broadcast(total))
        .select(
            "partkey",
            "rev",
            fround(
                (F.col("prev") + F.sum("rev").over(w_run)) / F.col("total"), 6
            ).alias("cum_share"),
        )
    )
    cls = F.when(F.col("cum_share") <= 0.80, "A").when(
        F.col("cum_share") <= 0.95, "B"
    ).otherwise("C")
    return (
        cum.groupBy(cls.alias("abc_class"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            fround(F.sum("rev"), 2).alias("revenue"),
        )
        .join(F.broadcast(total))
        .select(
            "abc_class",
            "n_parts",
            "revenue",
            fround(F.col("revenue") / F.col("total"), 6).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


ORACLE["abc_analysis"] = f"""
WITH rev AS (
  SELECT l_partkey AS partkey,
         {fround_sql("sum(l_extendedprice * (1 - l_discount))", 4)} AS rev
  FROM lineitem GROUP BY 1
),
total AS (SELECT sum(rev) AS total FROM rev),
cum AS (
  SELECT partkey, rev,
         {fround_sql(
             "sum(rev) OVER (ORDER BY rev DESC, partkey"
             " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / total", 6)}
           AS cum_share
  FROM rev CROSS JOIN total
),
classed AS (
  SELECT CASE WHEN cum_share <= 0.80 THEN 'A'
              WHEN cum_share <= 0.95 THEN 'B'
              ELSE 'C' END AS abc_class,
         rev
  FROM cum
)
SELECT abc_class, count(*) AS n_parts,
       {fround_sql("sum(rev)", 2)} AS revenue,
       {fround_sql("sum(rev) / any_value(total)", 6)} AS revenue_share
FROM classed CROSS JOIN total
GROUP BY 1
ORDER BY 1
"""


def customer_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration report per nation: exact Gini
    coefficient and top-20 %-customer revenue share — the
    "how 80/20 is this market" readout. Gini uses the rank closed
    form G = 2·Σ(rank·x)/(n·Σx) − (n+1)/n over customers sorted by
    spend WITHIN EACH NATION — a hash-partitioned window (local sort
    per nation after one key shuffle), never a global range exchange;
    tied spends are rank-order invariant in the formula (equal x make
    Σ rank·x independent of intra-tie order). Per-customer rollup is
    the one data-sized aggregation; the nation dimension join
    broadcasts."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nationkey"),
    )
    spend = (
        orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("x"))
        .join(F.broadcast(cust), "o_custkey")
    )
    wa = W.partitionBy("nationkey").orderBy("x", "o_custkey")
    wd = W.partitionBy("nationkey").orderBy(
        F.col("x").desc(), F.col("o_custkey").desc()
    )
    ranked = spend.select(
        "nationkey",
        "x",
        F.row_number().over(wa).alias("r_asc"),
        F.row_number().over(wd).alias("r_desc"),
        F.count(F.lit(1)).over(W.partitionBy("nationkey")).alias("n"),
    )
    return (
        ranked.groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            fround(
                F.lit(2.0) * F.sum(F.col("r_asc") * F.col("x"))
                / (F.count(F.lit(1)) * F.sum("x"))
                - (F.count(F.lit(1)) + F.lit(1.0)) / F.count(F.lit(1)),
                6,
            ).alias("gini"),
            fround(
                F.sum(
                    F.when(
                        F.col("r_desc") <= F.floor(F.col("n") * 0.2),
                        F.col("x"),
                    ).otherwise(F.lit(0.0))
                )
                / F.sum("x"),
                6,
            ).alias("top20_share"),
        )
        .orderBy("nationkey")
    )


ORACLE["customer_gini_concentration"] = f"""
WITH spend AS (
  SELECT o.o_custkey, c.c_nationkey AS nationkey, sum(o.o_totalprice) AS x
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT nationkey, x, o_custkey,
         row_number() OVER (PARTITION BY nationkey
                            ORDER BY x, o_custkey) AS r_asc,
         row_number() OVER (PARTITION BY nationkey
                            ORDER BY x DESC, o_custkey DESC) AS r_desc,
         count(*) OVER (PARTITION BY nationkey) AS n
  FROM spend
)
SELECT nationkey,
       count(*) AS n_customers,
       {fround_sql("2.0 * sum(r_asc * x) / (count(*) * sum(x)) - (count(*) + 1.0) / count(*)", 6)} AS gini,
       {fround_sql("sum(CASE WHEN r_desc <= floor(n * 0.2) THEN x ELSE 0.0 END) / sum(x)", 6)} AS top20_share
FROM ranked GROUP BY nationkey
ORDER BY nationkey
"""


def customer_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-migration (flow) matrix — the report behind every
    "are we upgrading or churning customers" review: classify each
    customer's spend in the FIRST and SECOND half of the order
    history (split at the floor'd midpoint date — integer floor on
    both engines, the ab_cuped lesson) as high (above that period's
    mean), low (active, below mean), or none (inactive), and count
    every (from, to) transition. ``customer_rfm`` scores one period;
    this is the between-period derivative. Plan shape: ONE orders
    scan → per-customer conditional sums (the only data-sized
    shuffle, keyed on custkey), period means via a broadcast 1-row
    frame, then a ≤9-row census. At 100 TB: one partial agg, one
    broadcast, nothing else."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.floor(
            (
                F.unix_timestamp(F.min("o_orderdate"))
                + F.unix_timestamp(F.max("o_orderdate"))
            )
            / 2
        )
        .cast("bigint")
        .alias("mid")
    )
    per_cust = (
        orders.crossJoin(F.broadcast(bounds))
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(
                    F.unix_timestamp("o_orderdate") < F.col("mid"),
                    F.col("o_totalprice"),
                ).otherwise(F.lit(0.0))
            ).alias("s1"),
            F.sum(
                F.when(
                    F.unix_timestamp("o_orderdate") >= F.col("mid"),
                    F.col("o_totalprice"),
                ).otherwise(F.lit(0.0))
            ).alias("s2"),
        )
    )
    means = per_cust.agg(
        F.avg(F.when(F.col("s1") > 0, F.col("s1"))).alias("m1"),
        F.avg(F.when(F.col("s2") > 0, F.col("s2"))).alias("m2"),
    )
    seg = lambda s, m: (  # noqa: E731 — tiny column factory
        F.when(F.col(s) == 0, "none")
        .when(F.col(s) > F.col(m), "high")
        .otherwise("low")
    )
    return (
        per_cust.crossJoin(F.broadcast(means))
        .groupBy(
            seg("s1", "m1").alias("seg_from"),
            seg("s2", "m2").alias("seg_to"),
        )
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("seg_from", "seg_to")
    )


ORACLE["customer_segment_migration"] = """
WITH bounds AS (
  SELECT CAST(floor((epoch(min(o_orderdate)) + epoch(max(o_orderdate))) / 2) AS BIGINT) AS mid
  FROM orders
),
per_cust AS (
  SELECT o_custkey,
         sum(CASE WHEN epoch(o_orderdate) < b.mid THEN o_totalprice ELSE 0.0 END) AS s1,
         sum(CASE WHEN epoch(o_orderdate) >= b.mid THEN o_totalprice ELSE 0.0 END) AS s2
  FROM orders CROSS JOIN bounds b
  GROUP BY 1
),
means AS (
  SELECT avg(CASE WHEN s1 > 0 THEN s1 END) AS m1,
         avg(CASE WHEN s2 > 0 THEN s2 END) AS m2
  FROM per_cust
)
SELECT CASE WHEN s1 = 0 THEN 'none' WHEN s1 > m.m1 THEN 'high' ELSE 'low' END AS seg_from,
       CASE WHEN s2 = 0 THEN 'none' WHEN s2 > m.m2 THEN 'high' ELSE 'low' END AS seg_to,
       count(*) AS n_customers
FROM per_cust CROSS JOIN means m
GROUP BY 1, 2
ORDER BY 1, 2
"""


SKYLINE_BUCKETS = 32  # local-skyline pruning fan-out


def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) operator over part — minimize
    p_retailprice, maximize p_size: the points no other part beats on
    both axes (Börzsönyi et al., ICDE 2001). Spark has no SKYLINE
    clause; the scalable composition is the classic two-phase
    distributed skyline: (1) collapse to distinct (price, size)
    points with counts (one hash aggregation), (2) LOCAL skyline per
    hash bucket — any partition of the point set preserves every true
    skyline point, so bucket-local pruning is safe — via the
    two-level trick that avoids fragile range frames on doubles: max
    size per (bucket, price), then a rows-frame running max over the
    per-price maxima gives "best size among strictly cheaper points";
    a point survives iff it is its price's max AND beats that running
    max, (3) the tiny candidate union (≤ one survivor per distinct
    price per bucket; on this corpus ~dozens) gets the exact same
    filter once more on a ``single_partition`` frame — provably
    bounded, so the global pass is legitimate. At 100 TB phases 1-2
    are partial-aggregated shuffles on point keys; only candidates
    ever see a single task. Oracle: the textbook NOT EXISTS dominance
    predicate."""
    part = load_table(spark, sf_dir, "part")
    pts = (
        part.groupBy(
            F.col("p_retailprice").alias("price"),
            F.col("p_size").alias("psize"),
        )
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .withColumn("bkt", F.pmod(F.hash("price", "psize"), SKYLINE_BUCKETS))
    )

    def skyline_pass(points: DataFrame, w_price, w_run) -> DataFrame:
        """One dominance-filter pass; windows supplied by the caller
        (bucket-partitioned locally, single-partition globally)."""
        return (
            points.withColumn("pmax", F.max("psize").over(w_price))
            .withColumn("m1", F.max("pmax").over(w_run))
            .filter(
                (F.col("psize") == F.col("pmax"))
                & (F.col("m1").isNull() | (F.col("psize") > F.col("m1")))
            )
            .drop("pmax", "m1")
        )

    w_price_local = W.partitionBy("bkt", "price")
    w_run_local = (
        W.partitionBy("bkt")
        .orderBy("price")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    # rows-frame is exact here ONLY because m1 runs over per-price
    # maxima: dedupe to one row per (bkt, price) first
    local = skyline_pass(
        pts.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("bkt", "price").orderBy(F.desc("psize"))
            ),
        ).filter(F.col("rn") == 1).drop("rn"),
        w_price_local,
        w_run_local,
    )
    # each surviving row keeps its OWN n_parts (the per-price dedupe
    # only drops dominated same-price points), so candidates carry
    # counts without a join-back
    cand1, w_global = single_partition(
        local.select("price", "psize", "n_parts"), by=["price"]
    )
    w_price_g = w_global.partitionBy(F.spark_partition_id(), "price")
    w_run_g = (
        w_global.orderBy("price").rowsBetween(W.unboundedPreceding, -1)
    )
    sky = skyline_pass(
        cand1.withColumn(
            "rn",
            F.row_number().over(
                w_global.partitionBy(
                    F.spark_partition_id(), "price"
                ).orderBy(F.desc("psize"))
            ),
        ).filter(F.col("rn") == 1).drop("rn"),
        w_price_g,
        w_run_g,
    )
    return sky.select(
        fround("price", 2).alias("price"), "psize", "n_parts"
    ).orderBy("price")


ORACLE["skyline_pareto"] = f"""
WITH pts AS (
  SELECT p_retailprice AS price, p_size AS psize, count(*) AS n_parts
  FROM part GROUP BY 1, 2
),
sky AS (
  SELECT * FROM pts a
  WHERE NOT EXISTS (
    SELECT 1 FROM pts b
    WHERE b.price <= a.price AND b.psize >= a.psize
      AND (b.price < a.price OR b.psize > a.psize)
  )
)
SELECT {fround_sql("price", 2)} AS price, psize, n_parts
FROM sky ORDER BY price
"""


QUERIES = {
    "customer_segment_migration": customer_segment_migration,
    "skyline_pareto": skyline_pareto,
    "customer_gini_concentration": customer_gini_concentration,
    "json_key_census": json_key_census,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "top_k_per_group": top_k_per_group,
    "window_running_sum": window_running_sum,
    "rollup_agg": rollup_agg,
    "cube_agg": cube_agg,
    "global_topk": global_topk,
    "pivot_agg": pivot_agg,
    "semi_join": semi_join,
    "anti_join": anti_join,
    "set_except": set_except,
    "set_intersect": set_intersect,
    "orders_by_month": orders_by_month,
    "events_json_extract": events_json_extract,
    "variant_json_suite": variant_json_suite,
    "sessionize": sessionize,
    "events_hourly": events_hourly,
    "unpivot_melt": unpivot_melt,
    "cdc_upsert_apply": cdc_upsert_apply,
    "complex_types_suite": complex_types_suite,
    "customer_rfm": customer_rfm,
    "abc_analysis": abc_analysis,
    "basket_part_pairs": basket_part_pairs,
    "basket_association_rules": basket_association_rules,
}
