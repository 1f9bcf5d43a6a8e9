"""Property-based tests (hypothesis): engine results must agree with
plain-Python models on arbitrary inputs, not just fixtures.

These pin the semantic contracts that golden tests can't sweep:
tokenizer edge cases (unicode whitespace runs, empty strings),
MapReduceJob vs DataFrame wordcount equivalence, and salted-aggregate
vs plain groupBy equality on adversarial key skews.
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# visible-ASCII + common whitespace; the reference tokenizer is
# whitespace-split with case/punctuation preserved
_texts = st.lists(
    st.text(
        alphabet=st.one_of(
            st.characters(codec="ascii", min_codepoint=32, max_codepoint=126),
            st.sampled_from(list(" \t\n")),
        ),
        max_size=60,
    ),
    min_size=1,
    max_size=12,
)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(texts=_texts)
@_settings
def test_wordcount_matches_python_model(spark, texts):
    from mapreduce_rust_spark.plans.wordcount import wordcount

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {r["word"]: r["cnt"] for r in wordcount(df, "text").collect()}
    expect = Counter(w for t in texts for w in t.split())
    assert got == dict(expect)


@given(texts=_texts)
@_settings
def test_mapreduce_job_equals_dataframe_wordcount(spark, texts):
    """The user-function API and the declarative plan must agree on
    arbitrary input (reference MapFn/ReduceFn semantics)."""
    from mapreduce_rust_spark.operators.mapreduce import MapReduceJob, wordcount_fns

    kv = spark.createDataFrame(
        [(f"f{i}", t) for i, t in enumerate(texts)], "key string, value string"
    )
    job = MapReduceJob(*wordcount_fns())
    got = {r["key"]: int(r["value"]) for r in job.run_on(kv).collect()}
    expect = Counter(w for t in texts for w in t.split())
    assert got == dict(expect)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-1000, 1000)),
        min_size=1,
        max_size=60,
    )
)
@_settings
def test_salted_aggregate_equals_plain_groupby(spark, rows):
    """Two-phase salted aggregation == single-phase GROUP BY for any
    key distribution (including everything on one key)."""
    from pyspark.sql import functions as F

    from mapreduce_rust_spark.operators.skew import salted_aggregate

    df = spark.createDataFrame(rows, "k int, v long")
    got = {
        r["k"]: (r["cnt"], r["sum_v"])
        for r in salted_aggregate(
            df, ["k"], ["v"], salt_col=F.xxhash64("v"), n_salt=4
        ).collect()
    }
    expect: dict[int, list[int]] = {}
    for k, v in rows:
        c = expect.setdefault(k, [0, 0])
        c[0] += 1
        c[1] += v
    assert got == {k: (c, s) for k, (c, s) in expect.items()}


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=1,
        max_size=40,
    )
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_connected_components_matches_union_find(spark, edges):
    """Iterative min-label propagation == classic union-find on random
    graphs (self-loops and duplicate edges included)."""
    from mapreduce_rust_spark.operators.graph import connected_components

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    expect = {}
    roots: dict[int, int] = {}
    for n in parent:
        r = find(n)
        roots.setdefault(r, n)
        roots[r] = min(roots[r], n)
    for n in parent:
        expect[n] = roots[find(n)]

    df = spark.createDataFrame(edges, "d1 long, d2 long")
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert got == expect


@given(
    lefts=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=20),
    rights=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=0, max_size=20),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_join_matches_bruteforce_model(spark, lefts, rights):
    """asof_join == per-row max(right ts <= left ts) within key,
    including ties (>= semantics) and keys with no right rows."""
    import datetime

    from mapreduce_rust_spark.plans.advanced import asof_join

    def ts(n: int) -> datetime.datetime:
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=n)

    left = spark.createDataFrame(
        [(k, ts(t), i) for i, (k, t) in enumerate(lefts)],
        "user_id int, ts timestamp, row_id long",
    )
    right = spark.createDataFrame(
        [(k, ts(t)) for k, t in rights] or [(99, ts(0))],
        "user_id int, ts timestamp",
    )
    got = {
        r["row_id"]: r["asof_ts"] for r in asof_join(left, right, on="user_id").collect()
    }
    for i, (k, t) in enumerate(lefts):
        cands = [ts(rt) for rk, rt in rights if rk == k and rt <= t]
        expect = max(cands) if cands else None
        assert got[i] == expect, (i, k, t, got[i], expect)


@given(
    sizes=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=30),
    budget=st.integers(min_value=1, max_value=300),
)
@_settings
def test_pack_shards_model_equivalence(spark, sizes, budget):
    """Shard assignment must equal the sequential greedy model: row i
    starts shard floor(sum(sizes[:i]) / budget); totals are preserved
    and shard ids are monotone non-decreasing in walk order."""
    from mapreduce_rust_spark.operators.corpus import pack_shards

    df = spark.createDataFrame(
        [("g", i, s) for i, s in enumerate(sizes)], "src string, id long, sz long"
    )
    got = {
        r["id"]: r["shard_id"]
        for r in pack_shards(df, "src", "id", "sz", budget).collect()
    }
    run = 0
    for i, s in enumerate(sizes):
        assert got[i] == run // budget
        run += s


@given(
    vals=st.lists(
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, width=32),
        min_size=1,
        max_size=40,
    )
)
@_settings
def test_ewma_closed_form_vs_sequential_model(spark, vals):
    """The closed-form window EWMA must match the sequential recursion
    y_t = (1-a)y_{t-1} + a x_t to float precision on arbitrary runs."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    alpha, r = 0.2, 0.8
    df = spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate(vals)], "u long, i long, value double"
    )
    rn = F.row_number().over(W.partitionBy("u").orderBy("i"))
    base = df.select("u", "i", "value", rn.alias("rn"))
    wsum = W.partitionBy("u").orderBy("rn").rowsBetween(W.unboundedPreceding, 0)
    scaled = F.when(
        F.col("rn") >= 2, F.col("value") * F.pow(F.lit(r), -F.col("rn"))
    ).otherwise(0.0)
    ewma = F.first("value").over(wsum) * F.pow(F.lit(r), F.col("rn") - 1) + F.lit(
        alpha
    ) * F.pow(F.lit(r), F.col("rn")) * F.sum(scaled).over(wsum)
    got = [r_["e"] for r_ in base.select("i", ewma.alias("e")).orderBy("i").collect()]
    y = None
    for i, x in enumerate(vals):
        y = x if y is None else (1 - alpha) * y + alpha * x
        assert got[i] == pytest.approx(y, rel=1e-9, abs=1e-9)


@given(
    sizes=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=30),
    budget=st.integers(min_value=1, max_value=300),
)
@_settings
def test_budget_select_model_equivalence(spark, sizes, budget):
    """Budget selection must equal the sequential model: walking rows
    in selection order (descending quality here encoded as descending
    id), a row is kept iff the PRECEDING kept total is under budget —
    the crossing row is kept, everything after is dropped."""
    from mapreduce_rust_spark.operators.corpus import budget_select_per_source

    rows = [("g", i, float(len(sizes) - i), s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "src string, doc_id long, q double, sz long")
    kept = {
        r["doc_id"]
        for r in budget_select_per_source(df, "src", "q", "sz", budget).collect()
    }
    run = 0
    expect = set()
    for i, s in enumerate(sizes):  # q is descending in i, ties impossible
        if run < budget:
            expect.add(i)
        run += s
    assert kept == expect


@given(
    corpus_texts=st.lists(st.text(alphabet="abc ", max_size=8), min_size=0, max_size=12),
    batch_texts=st.lists(st.text(alphabet="abc ", max_size=8), min_size=1, max_size=12),
)
@_settings
def test_incremental_dedup_model(spark, corpus_texts, batch_texts):
    """Batch survivors = first occurrence (lowest id) of each content
    not already present in the corpus."""
    from mapreduce_rust_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)] or [(0, "<sentinel>")],
        "doc_id long, text string",
    )
    if not corpus_texts:
        corpus = corpus.filter("doc_id < 0")  # empty corpus case
    batch = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(batch_texts)], "doc_id long, text string"
    )
    got = {r["doc_id"] for r in incremental_dedup(corpus, batch, "doc_id", "text").collect()}
    seen = set(corpus_texts)
    expect = set()
    for i, t in enumerate(batch_texts):
        if t not in seen:
            expect.add(100 + i)
            seen.add(t)
    assert got == expect


@given(
    n_bytes=st.integers(min_value=1, max_value=900),
)
@_settings
def test_chunk_payloads_covers_every_byte(spark, n_bytes):
    """Window bookkeeping: chunks start every hop bytes, the first
    window starts at 0, consecutive windows overlap by win-hop, and
    every payload byte falls inside at least one window."""
    from mapreduce_rust_spark.operators.multimodal import (
        CHUNK_HOP,
        CHUNK_WIN,
        chunk_payloads,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, b"x" * n_bytes)], "media_id long, payload binary")
    media = df.select(
        "media_id", "payload", F.octet_length("payload").cast("bigint").alias("n_bytes")
    )
    rows = sorted(
        (r["chunk_id"], r["start_byte"], r["chunk_bytes"])
        for r in chunk_payloads(media).collect()
    )
    assert rows[0][1] == 0
    covered = 0
    for cid, start, nb in rows:
        assert start == cid * CHUNK_HOP
        assert nb <= CHUNK_WIN
        assert start <= covered  # no gap
        covered = max(covered, start + nb)
    assert covered == n_bytes


@given(
    purchases=st.lists(
        st.tuples(st.integers(min_value=0, max_value=3000), st.integers(min_value=1, max_value=3)),
        min_size=1, max_size=8,
    ),
    clicks=st.lists(
        st.tuples(st.integers(min_value=0, max_value=3000), st.integers(min_value=1, max_value=3)),
        min_size=0, max_size=8,
    ),
)
@_settings
def test_asof_nearest_matches_bruteforce(spark, purchases, clicks):
    """The one-shuffle nearest-as-of must equal the brute-force pick:
    closest SAME-USER click within 600 s, ties to the earlier click.
    Multiple users so cross-user leakage (a dropped partitionBy) fails
    the test rather than only the sf0.1 gate."""
    import datetime as dt

    from mapreduce_rust_spark.plans import advanced

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=s), u, "purchase", 0.0, "{}")
        for i, (s, u) in enumerate(purchases)
    ] + [
        (100 + i, base + dt.timedelta(seconds=s), u, "click", 0.0, "{}")
        for i, (s, u) in enumerate(clicks)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    import unittest.mock as mock

    with mock.patch.object(advanced, "load_table", lambda s, d, n: ev):
        out = advanced.asof_join_nearest(spark, "unused").collect()
    got = {
        r["event_id"]: (r["dist_sec"], r["click_ts"], r["direction"]) for r in out
    }
    assert len(out) == len(got)  # exactly one row per matched purchase
    for i, (p, u) in enumerate(purchases):
        in_tol = [c for c, cu in clicks if cu == u and abs(c - p) <= 600]
        if not in_tol:
            assert i not in got
            continue
        best = min(in_tol, key=lambda c: (abs(c - p), c))
        dist, ts_str, direction = got[i]
        assert dist == abs(best - p)
        assert ts_str == (base + dt.timedelta(seconds=best)).strftime("%Y-%m-%d %H:%M:%S")
        assert direction == ("back" if best <= p else "fwd")


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6 * 3600),
            st.integers(min_value=1, max_value=2),
        ),
        min_size=1,
        max_size=12,
    ),
)
@_settings
def test_interval_overlap_matches_bruteforce(spark, events):
    """Hourly live-session counts must equal the brute-force model:
    per-user sessions are maximal 30-min-gap runs; a session is live
    in every hour slot overlapping its CLOSED [first, last] span
    (single-event sessions on an hour boundary count exactly once).
    Two users so a dropped per-user partitioning fails here."""
    import datetime as dt

    from mapreduce_rust_spark.plans import advanced

    base = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (i, base + dt.timedelta(seconds=s), u, "view", 0.0, "{}")
        for i, (s, u) in enumerate(sorted(events))
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    import unittest.mock as mock

    with mock.patch.object(advanced, "load_table", lambda s, d, n: ev):
        got = {
            r["hour"]: r["n_live_sessions"]
            for r in advanced.interval_overlap_join(spark, "unused").collect()
        }
    # model: per user, split sorted offsets into sessions on >30min gaps
    sessions = []
    for u in {u for _, u in events}:
        ss = sorted(s for s, eu in events if eu == u)
        start = prev = ss[0]
        for s in ss[1:]:
            if s - prev > 1800:
                sessions.append((start, prev))
                start = s
            prev = s
        sessions.append((start, prev))
    all_s = sorted(s for s, _ in events)
    lo = (base + dt.timedelta(seconds=all_s[0])).replace(minute=0, second=0)
    hi = (base + dt.timedelta(seconds=all_s[-1])).replace(minute=0, second=0)
    expect = {}
    cur = lo
    while cur <= hi:
        h0 = (cur - base).total_seconds()
        # exact predicate: hour_start <= s_end AND s_start < hour_start + 1h
        n = sum(1 for a, b in sessions if h0 <= b and a < h0 + 3600)
        if n:
            expect[cur.strftime("%Y-%m-%d %H:00")] = n
        cur += dt.timedelta(hours=1)
    assert got == expect


@pytest.mark.parametrize(
    "vals",
    [
        [float(i) for i in range(101)],  # deciles land EXACTLY on data points
        [i / 7 for i in range(100)],  # non-representable sevenths stress interpolation
        [1.0] * 40 + [2.0] * 30 + [3.0] * 31,  # heavy ties: many boundaries coincide
    ],
    ids=["on-point", "sevenths", "ties"],
)
def test_quantile_bins_boundary_values_match_duckdb(spark, vals):
    """Boundary-value property for equal-frequency binning: when a
    value sits exactly ON an interpolated quantile boundary, a 1-ulp
    interpolation difference between Spark's percentile() and DuckDB's
    quantile_cont() would flip its bin — the grid-snap (fround at 1e-4
    on the boundary array in BOTH engines) must make the bin
    assignment identical. Exercises exact-hit, irrational-fraction,
    and tied-boundary layouts."""
    import duckdb

    from mapreduce_rust_spark.functions.numeric import fround_sql
    from mapreduce_rust_spark.operators.profiling import quantile_bin_counts

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {
        r["bin"]: (r["n"], r["lo"], r["hi"])
        for r in quantile_bin_counts(df, "x", 10).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    qs = [i / 10 for i in range(1, 10)]
    oracle = f"""
    WITH b AS (
      SELECT list_transform(quantile_cont(x, {qs}), v -> {fround_sql('v', 4)}) AS bnds
      FROM t
    ),
    binned AS (
      SELECT x AS v, len(list_filter(bnds, e -> e <= x)) AS bin
      FROM t CROSS JOIN b
    )
    SELECT bin, count(*) AS n,
           {fround_sql("min(v)", 4)} AS lo,
           {fround_sql("max(v)", 4)} AS hi
    FROM binned GROUP BY bin ORDER BY bin
    """
    expect = {
        int(bin_): (int(n), lo, hi)
        for bin_, n, lo, hi in con.execute(oracle).fetchall()
    }
    assert got == expect


@given(
    dup_idx=st.lists(st.integers(min_value=0, max_value=19), max_size=8),
    fresh=st.lists(
        st.text(
            alphabet=st.characters(codec="ascii", min_codepoint=33, max_codepoint=126),
            min_size=1,
            max_size=20,
        ),
        max_size=8,
        unique=True,
    ),
)
@_settings
def test_bloom_prefilter_never_drops_a_true_dup(spark, dup_idx, fresh):
    """Bloom's one-sided error, fuzzed: whatever the batch mix of
    verbatim corpus duplicates and arbitrary fresh strings, every true
    duplicate hits all k bits (false negatives are impossible) and
    is_true_dup agrees with exact membership."""
    from mapreduce_rust_spark.operators.dedup import bloom_prefilter

    corpus_texts = [f"corpus row {i}" for i in range(20)]
    corpus = spark.createDataFrame(
        list(enumerate(corpus_texts)), "doc_id bigint, text string"
    )
    batch_rows = [(100 + j, corpus_texts[i]) for j, i in enumerate(dup_idx)] + [
        (200 + j, t) for j, t in enumerate(fresh)
    ]
    if not batch_rows:
        return
    batch = spark.createDataFrame(batch_rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r
        for r in bloom_prefilter(corpus, batch, "doc_id", "text").collect()
    }
    for did, text in batch_rows:
        r = out[did]
        truly = text in corpus_texts
        assert r["is_true_dup"] == int(truly)
        if truly:
            assert r["bloom_candidate"] == 1 and r["n_hit"] == 2


@given(
    values=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=2,
        max_size=12,
    )
)
@_settings
def test_time_weighted_avg_equals_plain_avg_on_regular_grid(spark, values):
    """On a REGULAR sampling grid every LOCF segment has the same
    duration, so the time-weighted average must equal the plain
    average of the same segments — the invariant separating the
    weighting logic from the windowing."""
    import datetime as dt

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    base = dt.datetime(2026, 1, 1)
    ev = spark.createDataFrame(
        [
            (i, base + dt.timedelta(seconds=10 * i), "t", float(v))
            for i, v in enumerate(values)
        ],
        "event_id bigint, ts timestamp, event_type string, value double",
    )
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    dur = (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).cast("double")
    seg = ev.select("event_type", "value", dur.alias("dur_us")).filter(
        F.col("dur_us").isNotNull()
    )
    row = (
        seg.groupBy("event_type")
        .agg(
            (F.sum(F.col("value") * F.col("dur_us")) / F.sum("dur_us")).alias("twa"),
            F.avg("value").alias("plain"),
        )
        .collect()[0]
    )
    assert abs(row["twa"] - row["plain"]) < 1e-9 * max(1.0, abs(row["plain"]))


@given(
    n_toks=st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=6)
)
@_settings
def test_chunker_covers_every_token_and_respects_geometry(spark, n_toks):
    """Chunk-overlap geometry contract on arbitrary doc lengths:
    every token index is covered by at least one chunk, the first
    chunk always exists, and chunk starts follow the stride except
    where the short-tail rule folds the tail."""
    from mapreduce_rust_spark.operators.corpus import (
        CHUNK_MIN_TAIL,
        CHUNK_SIZE,
        CHUNK_STRIDE,
    )

    for n in n_toks:
        starts = [
            s
            for s in range(0, n, CHUNK_STRIDE)
            if s == 0 or n - s >= CHUNK_MIN_TAIL
        ]
        assert starts[0] == 0
        covered = set()
        for s in starts:
            covered.update(range(s, min(n, s + CHUNK_SIZE)))
        assert covered == set(range(n)), (n, starts)


@given(
    keys=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
                  max_size=60, unique=True)
)
@_settings
def test_consistent_hashing_elasticity_property(spark, keys):
    """For ARBITRARY key sets: growing the ring N→N+1 moves keys only
    to the new shard (Python model of the same md5 ring — the Spark
    twin is pinned by its own test; this sweeps the ring math)."""
    import hashlib

    from mapreduce_rust_spark.operators.skew import RING_SHARDS, RING_VNODES

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def ring(n):
        return sorted(
            (h64(f"ring:{s}:{v}"), s)
            for s in range(n)
            for v in range(RING_VNODES)
        )

    def assign(k, r):
        hd = h64(f"doc:{k}")
        for vh, s in r:
            if vh >= hd:
                return s
        return r[0][1]

    r8, r9 = ring(RING_SHARDS), ring(RING_SHARDS + 1)
    for k in keys:
        a, b = assign(k, r8), assign(k, r9)
        if a != b:
            assert b == RING_SHARDS, (k, a, b)


@given(
    weights=st.lists(st.integers(min_value=1, max_value=10**6), min_size=1,
                     max_size=40)
)
@_settings
def test_aes_rank_key_monotone_in_weight(spark, weights):
    """A-ES invariant: for a FIXED uniform draw u, the rank key
    ln(u)/w strictly increases with w (heavier items rank better,
    all else equal) — the property that makes the scheme 'weighted'."""
    import math

    u = 0.37
    keys = [math.log(u) / w for w in weights]
    for w1, k1 in zip(weights, keys):
        for w2, k2 in zip(weights, keys):
            if w1 < w2:
                assert k1 < k2
