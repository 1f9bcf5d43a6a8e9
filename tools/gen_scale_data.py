"""Deterministic synthetic-data generator for scale sweeps BEYOND the
driver-provided testdata (which tops out at sf0.1 and is read-only).

Mirrors the driver tables' schemas and empirical distributions
(probed from /root/testdata/sf0.1 — categorical vocabularies, value
ranges, lines-per-order shape, event arrival rate, document word-salad
vocab, unit-norm embeddings with weak label structure) so registry
queries stay meaningfully selective at any sf. Correctness at the
generated scale is still oracle-gated: tools/check_correctness.py runs
Spark and DuckDB on the SAME generated files.

Scaling model (matching sf0.1 = the driver's 10% scale):
  lineitem ~6M rows/sf, orders 1.5M, customer 150k, part 200k,
  supplier 10k, events 1M (same 30-day span — rate scales, window
  semantics don't), documents 50k, embeddings 20k; region/nation fixed.

Usage: python tools/gen_scale_data.py <out_dir> [sf]   (default sf=1)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260815

# empirical vocabularies probed from the driver's sf0.1 tables
DOC_VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window"
).split()
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
P_ADJ = "blue old cold red small new large hot".split()
P_NOUN = "gizmo widget ring gear bolt plate rod anvil".split()
P_TYPES = ["ECONOMY", "LARGE", "STANDARD", "SMALL", "MEDIUM", "PROMO"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
# lines-per-order empirical pmf at sf0.1 (1..17, ~Poisson(4)+1 shape)
LPO = np.array(
    [11016, 21814, 29500, 29097, 23631, 15625, 8941, 4407, 1959, 818, 292, 93, 29, 10, 1, 2, 1],
    dtype=np.float64,
)
LPO /= LPO.sum()

DAY_US = 86_400_000_000


def _ts_us(base: str, offset_us: np.ndarray) -> pa.Array:
    base_us = np.datetime64(base, "us").astype("int64")
    return pa.array(
        (base_us + offset_us.astype("int64")).view("datetime64[us]"),
        type=pa.timestamp("us"),
    )


def _round2(x: np.ndarray) -> np.ndarray:
    return np.round(x, 2)


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def generate(out_dir: str, sf: float = 1.0) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_events = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_docs = int(50_000 * sf)
    n_vecs = int(20_000 * sf)

    _write(
        out_dir,
        "region",
        pa.table(
            {"r_regionkey": pa.array(range(5), pa.int32()), "r_name": REGIONS}
        ),
    )
    _write(
        out_dir,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
    )
    _write(
        out_dir,
        "customer",
        pa.table(
            {
                "c_custkey": np.arange(n_cust, dtype=np.int64),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
                "c_acctbal": _round2(rng.uniform(-999.99, 9999.99, n_cust)),
                "c_mktsegment": pa.array(rng.choice(SEGMENTS, n_cust)),
            }
        ),
    )
    _write(
        out_dir,
        "supplier",
        pa.table(
            {
                "s_suppkey": np.arange(n_supp, dtype=np.int64),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
                "s_acctbal": _round2(rng.uniform(-999.99, 9999.99, n_supp)),
            }
        ),
    )
    pk = np.arange(n_part, dtype=np.int64)
    _write(
        out_dir,
        "part",
        pa.table(
            {
                "p_partkey": pk,
                "p_name": [
                    f"{P_ADJ[a]} {P_NOUN[b]}"
                    for a, b in zip(
                        rng.integers(0, len(P_ADJ), n_part),
                        rng.integers(0, len(P_NOUN), n_part),
                    )
                ],
                "p_brand": pa.array(
                    [f"Brand#{b}" for b in rng.integers(1, 26, n_part)]
                ),
                "p_type": pa.array(rng.choice(P_TYPES, n_part)),
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": _round2(900.0 + (pk % 1000) / 10.0),
            }
        ),
    )

    span_orders = int(
        (np.datetime64("2001-08-01") - np.datetime64("1995-01-01"))
        / np.timedelta64(1, "D")
    )
    odate_day = rng.integers(0, span_orders + 1, n_orders)
    _write(
        out_dir,
        "orders",
        pa.table(
            {
                "o_orderkey": np.arange(n_orders, dtype=np.int64),
                "o_custkey": rng.integers(0, n_cust, n_orders),
                "o_orderstatus": pa.array(rng.choice(["F", "O", "P"], n_orders)),
                "o_totalprice": _round2(rng.uniform(1000.0, 500000.0, n_orders)),
                "o_orderdate": _ts_us("1995-01-01", odate_day * DAY_US),
                "o_orderpriority": pa.array(rng.choice(PRIORITIES, n_orders)),
            }
        ),
    )

    lines = rng.choice(np.arange(1, 18), n_orders, p=LPO)
    okeys = np.repeat(np.arange(n_orders, dtype=np.int64), lines)
    n_li = len(okeys)
    perm = rng.permutation(n_li)  # driver lineitem is row-shuffled
    span_ship = int(
        (np.datetime64("2001-11-04") - np.datetime64("1995-01-01"))
        / np.timedelta64(1, "D")
    )
    _write(
        out_dir,
        "lineitem",
        pa.table(
            {
                "l_orderkey": okeys[perm],
                "l_partkey": rng.integers(0, n_part, n_li),
                "l_suppkey": rng.integers(0, n_supp, n_li),
                "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
                "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
                "l_extendedprice": _round2(rng.uniform(900.68, 104999.91, n_li)),
                "l_discount": _round2(rng.integers(0, 11, n_li) / 100.0),
                "l_tax": _round2(rng.integers(0, 9, n_li) / 100.0),
                "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li)),
                "l_linestatus": pa.array(rng.choice(["F", "O"], n_li)),
                "l_shipdate": _ts_us(
                    "1995-01-01", rng.integers(1, span_ship + 1, n_li) * DAY_US
                ),
            }
        ),
    )

    # events: Poisson arrivals over the SAME 30-day span at every sf —
    # volume scales, window/session semantics don't
    span_us = 30 * DAY_US
    gaps = rng.exponential(span_us / n_events, n_events)
    ts_off = np.cumsum(gaps)
    ts_off = (ts_off / ts_off[-1] * (span_us - 1)).astype("int64")
    _write(
        out_dir,
        "events",
        pa.table(
            {
                "event_id": np.arange(n_events, dtype=np.int64),
                "ts": _ts_us("2024-01-01", ts_off),
                "user_id": rng.integers(0, n_users, n_events),
                "event_type": pa.array(rng.choice(EVENT_TYPES, n_events)),
                "value": _round2(
                    np.minimum(rng.exponential(50.0, n_events), 560.21)
                ),
                "props": [
                    json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_events)
                ],
            }
        ),
    )

    # documents: word-salad over the driver vocab, 10..100 tokens,
    # ~0.2% injected exact dups + ~0.5% near-dups (1-2 word edits) so
    # the dedup/LSH families have real work at scale
    vocab = np.array(DOC_VOCAB)
    doc_lens = rng.integers(10, 101, n_docs)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in doc_lens
    ]
    for i in rng.choice(n_docs, max(1, n_docs // 500), replace=False):
        if i > 0:
            texts[i] = texts[rng.integers(0, i)]
    for i in rng.choice(n_docs, max(1, n_docs // 200), replace=False):
        if i > 0:
            words = texts[rng.integers(0, i)].split()
            for _ in range(int(rng.integers(1, 3))):
                words[rng.integers(0, len(words))] = vocab[
                    rng.integers(0, len(vocab))
                ]
            texts[i] = " ".join(words)
    _write(
        out_dir,
        "documents",
        pa.table(
            {
                "doc_id": np.arange(n_docs, dtype=np.int64),
                "text": texts,
                "lang": pa.array(rng.choice(LANGS, n_docs, p=LANG_P)),
                "source": pa.array(
                    [f"src{s}" for s in rng.integers(0, 20, n_docs)]
                ),
                "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
            }
        ),
    )

    # embeddings: unit-norm float32 with weak label-centroid structure
    # (driver data: within-dispersion ~1.0, centroid norm ~0.07)
    labels = rng.integers(0, 10, n_vecs)
    cents = rng.standard_normal((10, 64))
    cents = 0.07 * cents / np.linalg.norm(cents, axis=1, keepdims=True)
    vecs = rng.standard_normal((n_vecs, 64)) / 8.0 + cents[labels]
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(
        np.float32
    )
    _write(
        out_dir,
        "embeddings",
        pa.table(
            {
                "vec_id": np.arange(n_vecs, dtype=np.int64),
                "embedding": pa.array(
                    list(vecs), pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
    )


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scaledata/sf1"
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    print(f"generating sf={sf} into {out}")
    generate(out, sf)
