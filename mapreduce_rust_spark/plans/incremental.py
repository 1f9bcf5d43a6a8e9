"""Incremental-maintenance plans: delta aggregation, snapshot diffing,
and SCD2 point-in-time lookup.

These are the shapes a 100 TB pipeline runs DAILY: never rescan the
full fact table when a partial-state merge over yesterday's aggregate
plus today's delta gives the same answer (incremental materialized
views), never re-export a full table when a key-level diff of two
snapshots yields the change feed, and resolve "what was the dimension
worth when this fact happened" with a point-in-time join against the
SCD2 history instead of snapshotting dimensions per day.

The reference (RaldLukka/MapReduce-Rust) has no incremental story at
all — every job rereads its full input file list
(`/root/reference/mr/src/coordinator.rs:38-50` slices the complete
input set every run); these plans are the Spark-first upgrade path.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreduce_rust_spark.functions.numeric import fround, fround_sql, single_partition
from mapreduce_rust_spark.sources.tables import load_table

ORACLE: dict[str, str] = {}

# last week of the fixed 30-day events window is "today's delta"
_CUTOFF = "2024-01-24 00:00:00"


def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the daily rollup is
    computed as yesterday's PARTIAL STATE merged with the delta's
    partial state, never by rescanning history. Every aggregate here
    is algebraic — (count, sum, min, max) merge with (sum, sum, min,
    max) and avg derives as sum/count — so the merged result is
    bit-identical to a full recompute, which is exactly what the
    oracle asserts. At 100 TB this is the difference between an
    O(delta) nightly job and an O(history) one; the two partial aggs
    also shuffle on the same (event_type, day) key, so the final merge
    is a cheap re-aggregation of two tiny state frames."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", day).agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("sum_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )

    base = partial(ev.filter(F.col("ts") < _CUTOFF))
    delta = partial(ev.filter(F.col("ts") >= _CUTOFF))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type", "day")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )
    return merged.select(
        "event_type",
        "day",
        "cnt",
        fround("sum_v", 2).alias("sum_value"),
        fround("min_v", 4).alias("min_value"),
        fround("max_v", 4).alias("max_value"),
        fround(F.col("sum_v") / F.col("cnt"), 4).alias("avg_value"),
    )


# the oracle is the FULL recompute — merged partial state must equal it
ORACLE["incremental_agg_merge"] = f"""
SELECT event_type,
       strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       count(*) AS cnt,
       {fround_sql("sum(value)", 2)} AS sum_value,
       {fround_sql("min(value)", 4)} AS min_value,
       {fround_sql("max(value)", 4)} AS max_value,
       {fround_sql("sum(value) / count(*)", 4)} AS avg_value
FROM events
GROUP BY event_type, day
"""


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-level snapshot diff — the change-data feed between two table
    versions, derived (deterministically, from orders) as: the old
    snapshot drops every 10th key, the new snapshot drops every 7th
    and reprices every 3rd. One full-outer join on the snapshot key
    classifies every key as insert / delete / update (unchanged rows
    are dropped before the rollup); the output is the per-class count
    plus the net value drift. At scale both snapshots shuffle once on
    the same key (or read pre-bucketed, zero-exchange) — never a
    row-by-row export compare."""
    o = load_table(spark, sf_dir, "orders")
    # all price arithmetic in integer CENTS: a +10% reprice computed
    # as doubles rounds differently at half-cent boundaries across
    # engines, while (cents * 11) DIV 10 is exact everywhere
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    old = o.filter(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey", cents.alias("price_old")
    )
    new = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, (cents * 11 / 10).cast("bigint"))
        .otherwise(cents)
        .alias("price_new"),
    )
    j = old.join(new, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("price_old").isNull(), F.lit("insert"))
        .when(F.col("price_new").isNull(), F.lit("delete"))
        .when(F.col("price_old") != F.col("price_new"), F.lit("update"))
    )
    return (
        j.select(change.alias("change_type"), "price_old", "price_new")
        .filter(F.col("change_type").isNotNull())
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            # exact integer sum — a float sum of ~1e8-magnitude deltas
            # drifts in its last ulp and flips the hundredths digit
            F.sum(
                F.coalesce("price_new", F.lit(0)) - F.coalesce("price_old", F.lit(0))
            ).alias("net_delta_cents"),
        )
        .orderBy("change_type")
    )


ORACLE["snapshot_diff"] = """
WITH cents AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
),
old AS (
  SELECT o_orderkey, c AS price_old FROM cents WHERE o_orderkey % 10 != 0
),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN (c * 11) // 10 ELSE c END AS price_new
  FROM cents WHERE o_orderkey % 7 != 0
),
diff AS (
  SELECT CASE WHEN price_old IS NULL THEN 'insert'
              WHEN price_new IS NULL THEN 'delete'
              WHEN price_old != price_new THEN 'update' END AS change_type,
         price_old, price_new
  FROM old FULL OUTER JOIN new USING (o_orderkey)
)
SELECT change_type, count(*) AS n_keys,
       CAST(sum(coalesce(price_new, 0) - coalesce(price_old, 0)) AS BIGINT)
         AS net_delta_cents
FROM diff WHERE change_type IS NOT NULL
GROUP BY change_type
ORDER BY change_type
"""


def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against an SCD2 history: purchases are
    resolved to the state (run of consecutive identical non-purchase
    event types, as in ``scd2_compress_states``) that was VALID at the
    purchase's timestamp — the "what plan was the user on when they
    bought" join. Intervals tile each user's timeline (valid_to =
    next run's start, open-ended for the last run), so each purchase
    matches at most one state. The join is an EQUI-join on user_id
    (high-cardinality, one shuffle) with the interval predicate
    evaluated inside each user's handful of runs — never a blind
    theta-join of facts against intervals. Purchases before the
    user's first state surface as state 'none' rather than being
    silently dropped."""
    ev = load_table(spark, sf_dir, "events")
    states = ev.filter(F.col("event_type") != "purchase")
    w_all = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    runs = (
        states.select(
            "user_id",
            "event_type",
            "ts",
            (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias(
                "island"
            ),
        )
        .groupBy("user_id", "event_type", "island")
        .agg(F.min("ts").alias("valid_from"))
    )
    w_user = W.partitionBy("user_id").orderBy("valid_from")
    intervals = runs.select(
        "user_id",
        F.col("event_type").alias("state"),
        "valid_from",
        F.lead("valid_from").over(w_user).alias("valid_to"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    matched = purchases.join(
        intervals,
        (purchases.user_id == intervals.user_id)
        & (intervals.valid_from <= purchases.ts)
        & (intervals.valid_to.isNull() | (purchases.ts < intervals.valid_to)),
        "left",
    )
    return (
        matched.select(F.coalesce("state", F.lit("none")).alias("state"))
        .groupBy("state")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
        .orderBy("state")
    )


ORACLE["scd2_point_in_time"] = """
WITH runs AS (
  SELECT user_id, event_type, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         - row_number() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS island
  FROM events WHERE event_type != 'purchase'
),
starts AS (
  SELECT user_id, event_type AS state, min(ts) AS valid_from
  FROM runs GROUP BY user_id, event_type, island
),
intervals AS (
  SELECT user_id, state, valid_from,
         lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
           AS valid_to
  FROM starts
)
SELECT coalesce(i.state, 'none') AS state, count(*) AS n_purchases
FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
LEFT JOIN intervals i
  ON i.user_id = p.user_id AND i.valid_from <= p.ts
 AND (i.valid_to IS NULL OR p.ts < i.valid_to)
GROUP BY 1
ORDER BY 1
"""


def scd2_apply_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 MERGE/APPLY — the nightly dimension-maintenance job every
    warehouse runs: fold a new day's snapshot into slowly-changing
    history. Unchanged keys carry their open row; changed keys close
    the old version (valid_to = day 2) and open a new one; new keys
    insert; vanished keys soft-delete (close without successor).
    Uses the same deterministic orders-derived old/new snapshots as
    ``snapshot_diff`` (day 1 = old, day 2 = new) and all-integer
    cents arithmetic, so every branch is exactly checkable. One
    full-outer join on the business key builds every branch —
    at scale both sides shuffle once on that key (or read
    pre-bucketed); history is never rewritten, only appended + the
    closed rows' valid_to updated (the delta the MERGE emits).
    Output: the resulting history's shape — row counts and price
    checksums per (valid_from, open/closed) stratum."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    old = o.filter(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey", cents.alias("p_old")
    )
    new = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, (cents * 11 / 10).cast("bigint"))
        .otherwise(cents)
        .alias("p_new"),
    )
    j = old.join(new, "o_orderkey", "full_outer")
    # one joined row emits its 1-2 history rows as an array→explode,
    # so the MERGE is ONE full-outer join and one scan pair — the
    # three-branch union form re-planned the join per branch (6 joins
    # / 12 scans in the physical plan)
    row = lambda vf, vt, price: F.struct(
        F.lit(vf).alias("valid_from"),
        (F.lit(vt) if vt is not None else F.lit(None)).cast("int").alias("valid_to"),
        price.alias("price"),
    )
    carried = F.when(
        F.col("p_old").isNotNull()
        & F.col("p_new").isNotNull()
        & (F.col("p_old") == F.col("p_new")),
        row(1, None, F.col("p_old")),
    )
    closed = F.when(
        F.col("p_old").isNotNull()
        & (F.col("p_new").isNull() | (F.col("p_old") != F.col("p_new"))),
        row(1, 2, F.col("p_old")),
    )
    opened = F.when(
        F.col("p_new").isNotNull()
        & (F.col("p_old").isNull() | (F.col("p_old") != F.col("p_new"))),
        row(2, None, F.col("p_new")),
    )
    hist = j.select(
        F.explode(
            F.filter(F.array(carried, closed, opened), lambda x: x.isNotNull())
        ).alias("r")
    ).select("r.*")
    return (
        hist.groupBy("valid_from", "valid_to")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price").alias("price_cents_sum"),
        )
        .orderBy("valid_from", "valid_to")
    )


ORACLE["scd2_apply_snapshot"] = """
WITH cents AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
),
old AS (
  SELECT o_orderkey, c AS p_old FROM cents WHERE o_orderkey % 10 != 0
),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN (c * 11) // 10 ELSE c END AS p_new
  FROM cents WHERE o_orderkey % 7 != 0
),
j AS (SELECT * FROM old FULL OUTER JOIN new USING (o_orderkey)),
hist AS (
  SELECT 1 AS valid_from, CAST(NULL AS INT) AS valid_to, p_old AS price
  FROM j WHERE p_old IS NOT NULL AND p_new IS NOT NULL AND p_old = p_new
  UNION ALL
  SELECT 1, 2, p_old
  FROM j WHERE p_old IS NOT NULL AND (p_new IS NULL OR p_old != p_new)
  UNION ALL
  SELECT 2, CAST(NULL AS INT), p_new
  FROM j WHERE p_new IS NOT NULL AND (p_old IS NULL OR p_old != p_new)
)
SELECT valid_from, valid_to, count(*) AS n_rows,
       CAST(sum(price) AS BIGINT) AS price_cents_sum
FROM hist
GROUP BY valid_from, valid_to
ORDER BY valid_from, valid_to
"""


def incremental_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-maintained JOIN — the other half of incremental view
    maintenance next to ``incremental_agg_merge``'s aggregates: with
    yesterday's join already materialized, today's update is the
    classic three delta terms

        Δ(O ⋈ L) = ΔO ⋈ L_old  ∪  O_old ⋈ ΔL  ∪  ΔO ⋈ ΔL

    — each term joins a (small) delta against a base or the other
    delta, so daily cost is O(|Δ|·match-rate), never a full-fact
    rescan. Bases/deltas are hash-split (md5 of the orderkey, the
    same deterministic split the snapshot slugs use). The maintained
    union is value-checked against the direct full join via a
    per-priority census with an exact integer-cents revenue sum —
    equality here IS the algebraic identity holding on real data."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o_new = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1) < "4"
    l_new = (
        F.substring(F.md5(F.concat(F.lit("L"), F.col("l_orderkey").cast("string"))), 1, 1)
        < "4"
    )
    o_old, o_delta = orders.filter(~o_new), orders.filter(o_new)
    l_old, l_delta = li.filter(~l_new), li.filter(l_new)
    maintained = (
        o_delta.join(l_old, o_delta["o_orderkey"] == l_old["l_orderkey"])
        .unionAll(
            o_old.join(l_delta, o_old["o_orderkey"] == l_delta["l_orderkey"])
        )
        .unionAll(
            o_delta.join(l_delta, o_delta["o_orderkey"] == l_delta["l_orderkey"])
        )
        .unionAll(o_old.join(l_old, o_old["o_orderkey"] == l_old["l_orderkey"]))
    )
    return (
        maintained.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "revenue_cents"
            ),
        )
        .orderBy("o_orderpriority")
    )


# oracle = the DIRECT full join: the delta decomposition must be
# indistinguishable from recomputing from scratch
ORACLE["incremental_join_delta"] = """
SELECT o_orderpriority, count(*) AS n_rows,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1 ORDER BY 1
"""




def _scd2_runs(ev: DataFrame) -> DataFrame:
    """Maximal same-type runs per user (the ``scd2_compress_states``
    gaps-and-islands) with raw-timestamp bounds kept for stitching."""
    w_all = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    runs = ev.select(
        "user_id",
        "event_type",
        "ts",
        (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias(
            "island"
        ),
    )
    return (
        runs.groupBy("user_id", "event_type", "island")
        .agg(
            F.min("ts").alias("vf"),
            F.max("ts").alias("vt"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("island")
    )


def incremental_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance — apply a change-stream DELTA to
    an existing type-2 dimension WITHOUT rebuilding history: the only
    rows the merge may touch are each delta-user's LAST stored run
    and the delta's FIRST run (same state spanning the batch boundary
    must stitch into ONE validity interval — the correctness trap a
    naive append ships: a user whose state didn't change across the
    boundary would grow a duplicate row). Base = runs over events
    before {cutoff!r}, delta = runs over events after; stitch by a
    user-keyed join of (last base run, first delta run) on equal
    state, keep everything else verbatim. The DuckDB oracle builds
    the SCD2 from FULL history — equality IS the proof that maximal
    runs compose across the boundary (only the boundary pair can be
    same-type adjacent, because base and delta are each internally
    maximal). Scale shape: user-keyed windows and joins throughout
    (high-cardinality, evenly spread); per-user state touched is two
    rows regardless of history depth — the warehouse MERGE pattern."""
    ev = load_table(spark, sf_dir, "events")
    base = _scd2_runs(ev.filter(F.col("ts") < _CUTOFF))
    delta = _scd2_runs(ev.filter(F.col("ts") >= _CUTOFF))
    w_last = W.partitionBy("user_id").orderBy(F.col("vf").desc())
    w_first = W.partitionBy("user_id").orderBy("vf")
    base_r = base.withColumn("is_last", F.row_number().over(w_last) == 1)
    delta_r = delta.withColumn("is_first", F.row_number().over(w_first) == 1)
    lb = base_r.filter("is_last").select(
        "user_id",
        F.col("event_type").alias("t1"),
        F.col("vf").alias("vf1"),
        F.col("vt").alias("vt1"),
        F.col("n_events").alias("n1"),
    )
    fd = delta_r.filter("is_first").select(
        "user_id",
        F.col("event_type").alias("t2"),
        F.col("vf").alias("vf2"),
        F.col("vt").alias("vt2"),
        F.col("n_events").alias("n2"),
    )
    stitched = lb.join(fd, "user_id").filter(F.col("t1") == F.col("t2")).select(
        "user_id",
        F.col("t1").alias("event_type"),
        F.col("vf1").alias("vf"),
        F.col("vt2").alias("vt"),
        (F.col("n1") + F.col("n2")).alias("n_events"),
    )
    skey = stitched.select("user_id", F.col("event_type").alias("st_type"))
    keep_base = base_r.join(
        skey,
        (base_r["user_id"] == skey["user_id"])
        & (base_r["event_type"] == skey["st_type"])
        & base_r["is_last"],
        "left_anti",
    ).select("user_id", "event_type", "vf", "vt", "n_events")
    keep_delta = delta_r.join(
        skey,
        (delta_r["user_id"] == skey["user_id"])
        & (delta_r["event_type"] == skey["st_type"])
        & delta_r["is_first"],
        "left_anti",
    ).select("user_id", "event_type", "vf", "vt", "n_events")
    return keep_base.unionByName(keep_delta).unionByName(stitched).select(
        "user_id",
        "event_type",
        F.date_format("vf", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("vt", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        "n_events",
    )


incremental_scd2_apply.__doc__ = incremental_scd2_apply.__doc__.format(
    cutoff=_CUTOFF
)


# full-history SCD2 — equality proves the boundary stitch is exact
ORACLE["incremental_scd2_apply"] = """
WITH runs AS (
  SELECT user_id, event_type, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         - row_number() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS island
  FROM events
)
SELECT user_id, event_type,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS valid_to,
       count(*) AS n_events
FROM runs
GROUP BY user_id, event_type, island
"""


TOPK_DAYS = 10  # maintained leaderboard size


def incremental_topk_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained top-k leaderboard (busiest days by
    event volume): the new batch's top-k merges with the stored top-k
    — ``topk(topk(base) ∪ topk(delta))`` — WITHOUT rescanning history.
    The docstring-level contract matters more than the code: this
    merge is EXACT only because the leaderboard key (day) is DISJOINT
    across the time split — a day lives entirely in one batch, so any
    day in the true combined top-k is in its own batch's top-k. For
    non-disjoint keys (per-customer sums spanning batches) top-k
    lists are NOT mergeable and you must maintain the full partial
    aggregate instead (``incremental_agg_merge``) — shipping that
    distinction as an oracle-checked operator is the point. Scale
    shape: each batch aggregates map-side to day grain, keeps k rows;
    the merge touches 2k rows. The oracle computes the full-history
    top-k directly — equality IS the mergeability proof, re-checked
    on every run."""
    ev = load_table(spark, sf_dir, "events")

    def topk(df: DataFrame, rank_name: str) -> DataFrame:
        days = df.groupBy(
            F.date_trunc("day", "ts").alias("day")
        ).agg(F.count(F.lit(1)).alias("n"))
        # batch frames are day-grain (calendar-bounded): the global
        # rank runs on a provably-bounded sliver via single_partition
        days1, w = single_partition(days, by=[F.desc("n"), "day"])
        return (
            days1.withColumn(rank_name, F.row_number().over(w))
            .filter(F.col(rank_name) <= TOPK_DAYS)
        )

    # the merge below is exact ONLY if day-grain keys are batch-
    # disjoint, which requires the split boundary to be midnight-
    # aligned; assert the invariant so a future _CUTOFF edit cannot
    # silently produce partial-count days
    cutoff_dt = datetime.strptime(_CUTOFF, "%Y-%m-%d %H:%M:%S")
    assert cutoff_dt == cutoff_dt.replace(hour=0, minute=0, second=0), (
        f"_CUTOFF {_CUTOFF!r} is not midnight-aligned: day-grain keys "
        "would span batches and the top-k merge would be inexact"
    )
    base = topk(ev.filter(F.col("ts") < _CUTOFF), "r")
    delta = topk(ev.filter(F.col("ts") >= _CUTOFF), "r")
    merged = base.unionByName(delta).drop("r")
    return (
        topk_frame_rank(merged)
        .filter(F.col("rank") <= TOPK_DAYS)
        .select("rank", "day", "n")
        .orderBy("rank")
    )


def topk_frame_rank(merged: DataFrame) -> DataFrame:
    """Rank the ≤2k merged leaderboard rows (bounded by construction)."""
    m1, w = single_partition(merged, by=[F.desc("n"), "day"])
    return m1.withColumn("rank", F.row_number().over(w))


ORACLE["incremental_topk_maintain"] = f"""
WITH days AS (
  SELECT date_trunc('day', ts) AS day, count(*) AS n
  FROM events GROUP BY 1
),
ranked AS (
  SELECT day, n,
         row_number() OVER (ORDER BY n DESC, day) AS rank
  FROM days
)
SELECT rank, day, n FROM ranked
WHERE rank <= {TOPK_DAYS} ORDER BY rank
"""


QUERIES = {
    "incremental_scd2_apply": incremental_scd2_apply,
    "incremental_topk_maintain": incremental_topk_maintain,
    "incremental_join_delta": incremental_join_delta,
    "incremental_agg_merge": incremental_agg_merge,
    "snapshot_diff": snapshot_diff,
    "scd2_point_in_time": scd2_point_in_time,
    "scd2_apply_snapshot": scd2_apply_snapshot,
}
