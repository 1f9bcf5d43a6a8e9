"""Unit tests for the LLM-pipeline operator families (dedup,
similarity, text analysis, multimodal) on small controlled frames —
semantics pinned independently of the oracle comparison."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------- dedup ----------


def test_exact_duplicate_groups(spark):
    from mapreduce_rust_spark.operators.dedup import exact_duplicate_groups

    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "id long, t string"
    )
    got = {
        r["keep_id"]: r["n_copies"]
        for r in exact_duplicate_groups(df, "id", "t").collect()
    }
    assert got == {1: 2, 3: 1}


def test_jaccard_pairs_identical_docs(spark):
    from mapreduce_rust_spark.operators.dedup import jaccard_pairs

    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d e f"),       # identical → jaccard 1.0
            (3, "z y x w v u"),       # disjoint
        ],
        "id long, t string",
    )
    rows = jaccard_pairs(df, "id", "t", k=3, threshold=0.5).collect()
    assert [(r["d1"], r["d2"], r["jaccard"]) for r in rows] == [(1, 2, 1.0)]


def test_minhash_identical_docs_share_all_bands(spark):
    from mapreduce_rust_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over"), (2, "the quick brown fox jumps over"),
         (3, "completely different words entirely here now")],
        "id long, t string",
    )
    sigs = minhash_signatures(df, "id", "t")
    pairs = lsh_candidate_pairs(sigs, "id").collect()
    assert [(r["d1"], r["d2"], r["est_sim"]) for r in pairs] == [(1, 2, 1.0)]


def test_simhash_identical_zero_hamming(spark):
    from mapreduce_rust_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_pairs,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "id long, t string",
    )
    fp = simhash_fingerprints(df, "id", "t")
    [pair] = simhash_pairs(fp, "id", max_hamming=0).collect()
    assert (pair["d1"], pair["d2"], pair["hamming"]) == (1, 2, 0)


def test_embedding_near_dup_pairs(spark):
    from mapreduce_rust_spark.operators.dedup import embedding_near_dup_pairs

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.0]),    # cos=1 with 1
            (3, [0.0, 1.0]),    # orthogonal
        ],
        "id long, v array<double>",
    )
    rows = embedding_near_dup_pairs(df, "id", "v", threshold=0.9).collect()
    assert [(r["d1"], r["d2"], r["cos_sim"]) for r in rows] == [(1, 2, 1.0)]


# ---------- similarity ----------


def test_topk_bruteforce_orders_by_cosine(spark):
    from mapreduce_rust_spark.operators.similarity import topk_bruteforce

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.0, 1.0]),
        ],
        "id long, v array<double>",
    )
    qs = corpus.filter("id = 1")
    rows = topk_bruteforce(qs, corpus, "id", "v", k=2).collect()
    assert [(r["rank"], r["neighbor_id"]) for r in rows] == [(1, 2), (2, 3)]


def test_topk_bucketed_restricts_to_bucket(spark):
    from mapreduce_rust_spark.operators.similarity import sign_bucket, topk_bucketed

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 1.0, 1.0, 1.0]),
            (2, [0.5, 0.5, 0.5, 0.5]),     # same sign bucket as 1
            (3, [-1.0, -1.0, -1.0, -1.0]), # different bucket
        ],
        "id long, v array<double>",
    )
    qs = corpus.filter("id = 1")
    rows = topk_bucketed(qs, corpus, "id", "v", k=5).collect()
    assert [r["neighbor_id"] for r in rows] == [2]  # bucket excluded id 3


# ---------- text analysis ----------


def test_token_stats(spark):
    from mapreduce_rust_spark.operators.text_analysis import token_stats

    df = spark.createDataFrame([(1, "aa bb aa")], "id long, t string")
    [r] = token_stats(df, "id", "t").collect()
    assert (r["n_tokens"], r["n_types"]) == (3, 2)
    assert r["avg_token_len"] == 2.0


def test_language_id_votes(spark):
    from mapreduce_rust_spark.operators.text_analysis import language_id

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "der hund und die katze ist ein tier"),
            (3, "xyzzy plugh qwerty"),
        ],
        "id long, t string",
    )
    got = {r["id"]: r["pred_lang"] for r in language_id(df, "id", "t").collect()}
    assert got == {1: "en", 2: "de", 3: "und"}


def test_fingerprints_normalization_invariance(spark):
    from mapreduce_rust_spark.operators.text_analysis import fingerprints

    df = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello world"), (3, "different")],
        "id long, t string",
    )
    rows = {r["id"]: r["fp_norm_md5"] for r in fingerprints(df, "id", "t").collect()}
    assert rows[1] == rows[2]  # case/punct-invariant
    assert rows[1] != rows[3]


# ---------- multimodal ----------


def test_media_metadata_sniffs_magic_bytes(spark):
    from mapreduce_rust_spark.operators.multimodal import payload_metadata

    df = spark.createDataFrame(
        [
            (1, "image/png", bytearray(b"\x89PNG\r\n rest"), "s", 11),
            (2, "image/jpeg", bytearray(b"\xff\xd8\xff\xe0 rest"), "s", 9),
            (3, "text/plain", bytearray(b"plain"), "s", 5),
        ],
        "media_id long, media_type string, payload binary, src string, n_bytes long",
    )
    got = {
        r["media_id"]: r["container_sniff"] for r in payload_metadata(df).collect()
    }
    assert got == {1: "png", 2: "jpeg", 3: "unknown"}


def test_decode_media_stub_raises_without_fake(spark):
    import importlib.util

    if importlib.util.find_spec("PIL") is not None:
        pytest.skip("PIL present: real-codec escape hatch active instead")
    from mapreduce_rust_spark.operators.multimodal import decode_media

    df = spark.createDataFrame(
        [(1, "image/png", bytearray(b"\x89PNG"), "s", 4)],
        "media_id long, media_type string, payload binary, src string, n_bytes long",
    )
    with pytest.raises(Exception) as exc:
        decode_media(df, fake_decoder=False).collect()
    assert "NotImplementedError" in str(exc.value) or "real media decoding" in str(
        exc.value
    )


def test_decode_and_resize_real_codec_when_pil_present(spark):
    """Escape-hatch coverage (VERDICT r05 ask #9): the day the
    container gains PIL, decode_media/resize_media run real codecs
    with NO code change — this test activates itself via find_spec."""
    import importlib.util

    if importlib.util.find_spec("PIL") is None:
        pytest.skip("PIL not installed in this container (documented limitation)")
    import io

    from PIL import Image

    from mapreduce_rust_spark.operators.multimodal import decode_media, resize_media

    def png(w, h, value):
        buf = io.BytesIO()
        Image.new("L", (w, h), value).save(buf, format="PNG")
        return bytearray(buf.getvalue())

    media = spark.createDataFrame(
        [(1, "image/png", png(40, 20, 0), "s", 0), (2, "image/png", png(8, 8, 255), "s", 0)],
        "media_id long, media_type string, payload binary, src string, n_bytes long",
    )
    decoded = {r["media_id"]: r for r in decode_media(media, fake_decoder=False).collect()}
    assert (decoded[1]["width"], decoded[1]["height"]) == (40, 20)
    assert decoded[1]["feature_norm"] == 0.0 and decoded[2]["feature_norm"] == 1.0
    dims = decode_media(media, fake_decoder=False).select("media_id", "width", "height")
    joined = media.select("media_id", "payload").join(dims, "media_id")
    out = resize_media(joined, target_w=16, target_h=12, fake_resizer=False).collect()
    for r in out:
        with Image.open(io.BytesIO(bytes(r["resized_payload"]))) as im:
            assert (im.width, im.height) == (16, 12)


def test_decode_media_fake_is_deterministic(spark):
    from mapreduce_rust_spark.operators.multimodal import decode_media, frame_sample

    df = spark.createDataFrame(
        [(i, "image/png", bytearray(b"\x89PNG" + bytes([i])), "s", 5) for i in range(4)],
        "media_id long, media_type string, payload binary, src string, n_bytes long",
    )
    d1 = sorted(decode_media(df, fake_decoder=True).collect())
    d2 = sorted(decode_media(df, fake_decoder=True).collect())
    assert d1 == d2
    assert all(r["width"] >= 16 and r["n_frames"] >= 1 for r in d1)
    sampled = frame_sample(decode_media(df, fake_decoder=True), every_nth=2)
    assert all(r["frame_idx"] % 2 == 0 for r in sampled.collect())


def test_resize_media_pipeline(spark):
    """decode -> join dims back to payload -> resize: full multimodal
    pipeline shape with deterministic stub kernels."""
    from mapreduce_rust_spark.operators.multimodal import decode_media, resize_media

    media = spark.createDataFrame(
        [(i, "image/png", bytearray(b"\x89PNG" + bytes([i] * (i + 1))), "s", 5 + i)
         for i in range(4)],
        "media_id long, media_type string, payload binary, src string, n_bytes long",
    )
    dims = decode_media(media, fake_decoder=True).select("media_id", "width", "height")
    joined = media.select("media_id", "payload").join(dims, "media_id")
    out = resize_media(joined, target_w=32, target_h=16, fake_resizer=True).collect()
    assert len(out) == 4
    for r in out:
        assert (r["target_w"], r["target_h"]) == (32, 16)
        assert len(r["resized_payload"]) == (32 * 16) // 8
    # determinism
    out2 = resize_media(joined, target_w=32, target_h=16, fake_resizer=True).collect()
    assert sorted(map(str, out)) == sorted(map(str, out2))


def test_kmeans_centroids_separate_clusters(spark):
    """Three well-separated direction clusters -> k-means assignment
    must be pure (every cluster maps to exactly one centroid), and
    probing via the trained centroids must find in-cluster neighbors."""
    import random

    from pyspark.sql import functions as F

    from mapreduce_rust_spark.operators.similarity import (
        ivf_assign,
        kmeans_centroids,
    )

    rng = random.Random(7)
    base = {0: [10.0, 0.0, 0.0], 1: [0.0, 10.0, 0.0], 2: [0.0, 0.0, 10.0]}
    rows = []
    for i in range(90):
        c = i % 3
        vec = [v + rng.uniform(-0.5, 0.5) for v in base[c]]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = kmeans_centroids(emb, "vec_id", "embedding", k=3, max_iter=4)
    assert cents.count() == 3
    assigned = ivf_assign(emb, cents.select("cid", "cv"), "vec_id", "embedding")
    got = {r["vec_id"]: r["cid"] for r in assigned.collect()}
    # purity: all members of a true cluster share one centroid id
    for c in range(3):
        cids = {got[i] for i in range(90) if i % 3 == c}
        assert len(cids) == 1, (c, cids)


def test_pair_stats_cap_noop_when_not_binding(spark, sf_dir):
    """With max_df above the corpus's true max document frequency the
    stop-shingle filter is the identity: capped pair stats must equal
    the uncapped plan row-for-row (the cap only ever REMOVES
    boilerplate postings, so equality here pins the filter's no-false-
    positive direction)."""
    from mapreduce_rust_spark.operators.dedup import (
        pair_intersection_stats,
        shingle_sets,
    )
    from mapreduce_rust_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    sh = shingle_sets(docs, "doc_id", "text", k=3).persist()
    capped = pair_intersection_stats(sh, "doc_id", max_df=10**9).collect()
    uncapped = pair_intersection_stats(sh, "doc_id", max_df=None).collect()
    key = lambda r: (r["d1"], r["d2"])
    assert sorted(map(tuple, capped), key=lambda t: t[:2]) == sorted(
        map(tuple, uncapped), key=lambda t: t[:2]
    )
    assert len({key(r) for r in capped}) == len(capped)
    sh.unpersist()


def test_pair_stats_cap_bounds_posting_lists(spark):
    """When the cap binds: (a) no shingle with df > cap reaches the
    self-join (the posting-list bound that makes exact pairwise
    100 TB-safe), (b) pairs sharing ONLY boilerplate disappear,
    (c) true duplicate pairs survive with the same score, matching
    the LSH+verification path's output on the same corpus."""
    from pyspark.sql import functions as F

    from mapreduce_rust_spark.operators.dedup import (
        jaccard_pairs,
        lsh_verified_pairs,
        shingle_sets,
        stop_shingle_filter,
    )

    boiler = "common header line shared by every document here"
    rows = [
        (1, boiler + " alpha beta gamma delta epsilon zeta eta theta"),
        (2, boiler + " alpha beta gamma delta epsilon zeta eta theta"),  # dup of 1
        (3, boiler + " one two three four five six seven eight nine"),
        (4, boiler + " ten eleven twelve thirteen fourteen fifteen sixteen"),
        (5, boiler + " completely different tail words appear in this one"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingle_sets(df, "doc_id", "text", k=3).persist()

    cap = 4  # boilerplate shingles have df=5 > cap; unique tails df≤2
    kept = stop_shingle_filter(sh, "doc_id", cap)
    [mx] = kept.groupBy("s").count().agg(F.max("count")).collect()
    assert mx[0] <= cap

    capped_pairs = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in jaccard_pairs(
            df, "doc_id", "text", k=3, threshold=0.5, sh=sh, max_df=cap
        ).collect()
    }
    # only the true duplicate pair survives; boilerplate-only pairs
    # (e.g. 3-4) are gone, and identical docs still score 1.0
    assert capped_pairs == {(1, 2): 1.0}

    verified = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in lsh_verified_pairs(
            df, "doc_id", "text", k=3, threshold=0.5, sh=sh
        ).collect()
    }
    assert (1, 2) in verified and verified[(1, 2)] == 1.0
    sh.unpersist()


def test_embedding_kmeans_numpy_golden(spark, sf_dir):
    """Value-level check for the (non-SQL-expressible) iterative
    k-means: recompute the full Lloyd trace in numpy — deterministic
    init (first k ids), fixed 3 rounds, floored-cosine assignment with
    smaller-cid tie-break — and require the registry query's
    per-cluster summary to match (counts exactly, mean cosine to the
    reported 4-decimal precision)."""
    import numpy as np
    import pyarrow.parquet as pq

    from mapreduce_rust_spark.operators.similarity import embedding_kmeans

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    ids = np.asarray(tbl["vec_id"], dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    # float32 -> float64 is exact, matching the JVM's cast('double')
    V = np.asarray(tbl["embedding"], dtype=np.float32).astype(np.float64)[order]

    def fr(x, scale):
        f = 10.0**scale
        return np.floor(np.round(x, scale + 4) * f) / f

    k = 8
    init_mask = ids < k
    cid_vals = ids[init_mask].astype(int)  # sorted already
    cents = V[init_mask]

    def cos_matrix(c):
        vn = np.linalg.norm(V, axis=1, keepdims=True)
        cn = np.linalg.norm(c, axis=1, keepdims=True)
        return fr(V @ c.T / (vn * cn.T), 6)

    for _ in range(3):
        sim = cos_matrix(cents)
        assign = sim.argmax(axis=1)  # first max == smallest cid wins ties
        assert all((assign == j).any() for j in range(len(cid_vals)))
        cents = np.stack([V[assign == j].mean(axis=0) for j in range(len(cid_vals))])

    sim = cos_matrix(cents)
    assign = sim.argmax(axis=1)
    best = sim[np.arange(len(V)), assign]
    expected = {
        int(cid_vals[j]): (
            int((assign == j).sum()),
            fr(best[assign == j].mean(), 4),
        )
        for j in range(len(cid_vals))
        if (assign == j).any()
    }

    got = {
        r["cid"]: (r["n_assigned"], r["mean_cos"])
        for r in embedding_kmeans(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for cid, (n, mc) in expected.items():
        assert got[cid][0] == n, (cid, got[cid], (n, mc))
        assert abs(got[cid][1] - mc) <= 1e-4, (cid, got[cid], (n, mc))


def test_simhash_banded_equals_bruteforce(spark, sf_dir):
    """Pigeonhole banding must reproduce the n^2 pair scan exactly."""
    from mapreduce_rust_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_pairs,
        simhash_pairs_banded,
    )
    from mapreduce_rust_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    fp = simhash_fingerprints(docs, "doc_id", "text", bits=32)
    brute = sorted(map(tuple, simhash_pairs(fp, "doc_id", 3).collect()))
    banded = sorted(map(tuple, simhash_pairs_banded(fp, "doc_id", 3).collect()))
    assert brute == banded and len(brute) > 0


def test_text_operators_null_and_empty_robust(spark):
    """NULL and empty text must not crash or fabricate rows in any
    text-family operator (100 TB corpora always contain both)."""
    from mapreduce_rust_spark.operators.dedup import (
        exact_duplicate_groups,
        minhash_signatures,
    )
    from mapreduce_rust_spark.operators.text_analysis import (
        fingerprints,
        language_id,
        quality_scores,
        token_stats,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over it"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    # per-row feature ops: survive, and only doc 1 has usable text
    assert token_stats(df, "doc_id", "text").count() == 4
    # empty + NULL filtered; whitespace-only kept: zero tokens gives a
    # NULL mean_word_len (nullif-guarded division — ANSI mode would
    # otherwise hard-fail the whole job on one junk doc) and a junk-low
    # score from the remaining terms
    qrows = {r["doc_id"]: r for r in quality_scores(df, "doc_id", "text").collect()}
    assert set(qrows) == {1, 4}
    assert qrows[4]["mean_word_len"] is None
    assert qrows[4]["quality_score"] is not None
    assert qrows[1]["quality_score"] > qrows[4]["quality_score"]
    assert {r["doc_id"] for r in fingerprints(df, "doc_id", "text").collect()} == {1}
    langs = {r["doc_id"]: r["pred_lang"] for r in language_id(df, "doc_id", "text").collect()}
    assert langs[1] == "en"
    # dedup ops: null text hashes to null group; minhash drops shingle-less docs
    assert exact_duplicate_groups(df, "doc_id", "text").count() >= 2
    sigs = minhash_signatures(df, "doc_id", "text")
    assert {r["doc_id"] for r in sigs.collect()} == {1}


def test_ann_recall_vs_exact_baseline(spark, sf_dir):
    """The approximate ANN paths must actually find true neighbors:
    recall@3 against the exact brute-force baseline, with IVF (probing
    2 of 8 cells) well above the coarse 4-bit sign-LSH. Floors sit
    under measured values (ivf 0.47-0.67, sign-LSH 0.13 across SFs) —
    this test exists to catch a broken index, not to tune recall."""
    from mapreduce_rust_spark.operators.similarity import (
        ann_topk_bruteforce,
        ann_topk_bucketed,
        ann_topk_ivf,
    )

    def pairs(df, k=3):
        return {
            (r["query_id"], r["neighbor_id"]) for r in df.collect() if r["rank"] <= k
        }

    exact = pairs(ann_topk_bruteforce(spark, sf_dir))
    assert exact
    recall_ivf = len(exact & pairs(ann_topk_ivf(spark, sf_dir))) / len(exact)
    recall_lsh = len(exact & pairs(ann_topk_bucketed(spark, sf_dir))) / len(exact)
    assert recall_ivf >= 0.3, recall_ivf
    assert recall_lsh >= 0.05, recall_lsh
    assert recall_ivf > recall_lsh


def test_pack_sequences_spans_chunks(spark):
    """Concat-and-chunk: token offsets and window spans must follow
    the running sum; a doc straddling a 4-token boundary reports
    first_seq < last_seq."""
    from mapreduce_rust_spark.operators.corpus import pack_sequences

    rows = [
        (1, "a b c"),        # start 0, 3 toks -> seq 0..0
        (2, "d e f"),        # start 3, toks 3 -> spans seq 0..1 (tokens 3,4,5)
        (3, "g"),            # start 6 -> seq 1
        (4, "h i j k l m"),  # start 7, 6 toks -> spans 1..3 (7..12)
    ]
    df = spark.createDataFrame([("s", i, t) for i, t in rows], "src string, doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tok"], r["start_tok"], r["first_seq"], r["last_seq"])
        for r in pack_sequences(df, "src", "doc_id", "text", seq_len=4).collect()
    }
    assert got == {
        1: (3, 0, 0, 0),
        2: (3, 3, 0, 1),
        3: (1, 6, 1, 1),
        4: (6, 7, 1, 3),
    }


def test_distributed_row_number_equals_global_window(spark):
    """The two-phase bucketed rank must be IDENTICAL to the naive
    single-partition row_number for any key column."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from mapreduce_rust_spark.operators.corpus import distributed_row_number

    df = spark.range(0, 500).withColumnRenamed("id", "k")
    key = F.md5(F.col("k").cast("string"))
    got = {
        r["k"]: r["pos"]
        for r in distributed_row_number(df, key).collect()
    }
    expect = {
        r["k"]: r["pos"]
        for r in df.withColumn(
            "pos", F.row_number().over(W.orderBy(key.alias("_gk")))
        ).collect()
    }
    assert got == expect


def test_blocked_fuzzy_pairs_hand_data(spark):
    """Pairs only within blocks; edit distance filters across them."""
    from mapreduce_rust_spark.operators.linkage import blocked_fuzzy_pairs

    rows = [
        (1, "blue metal box", "A"),
        (2, "blue metal bax", "A"),   # dist 1 from 1
        (3, "totally other name", "A"),
        (4, "blue metal box", "B"),   # same name, different block
    ]
    df = spark.createDataFrame(rows, "id long, name string, blk string")
    got = {
        (r["id1"], r["id2"]): r["edit_dist"]
        for r in blocked_fuzzy_pairs(df, "id", "name", ["blk"], max_dist=3).collect()
    }
    assert got == {(1, 2): 1}


def test_lsh_star_edges_connectivity_equivalent(spark, sf_dir):
    """Star edges must induce EXACTLY the same connected components as
    the full quadratic LSH candidate-pair set — that equivalence is
    the whole argument for the linear-output variant."""
    from mapreduce_rust_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_star_edges,
        signature_index,
    )
    from mapreduce_rust_spark.operators.graph import connected_components

    sigs = signature_index(spark, sf_dir, k=3)
    pairs = lsh_candidate_pairs(sigs, "doc_id").select("d1", "d2")
    stars = lsh_star_edges(sigs, "doc_id")
    comp_pairs = {
        (r["node"], r["comp"]) for r in connected_components(pairs).collect()
    }
    comp_stars = {
        (r["node"], r["comp"]) for r in connected_components(stars).collect()
    }
    assert comp_pairs == comp_stars
    # and the star edge count is bounded by the pair count
    assert stars.count() <= pairs.count()


def test_bloom_prefilter_no_false_negatives(spark):
    """Bloom's one-sided guarantee: every true duplicate MUST be a
    candidate (no false negatives, whatever the filter size); fresh
    docs are mostly rejected at this corpus/filter ratio."""
    from mapreduce_rust_spark.operators.dedup import bloom_prefilter

    corpus = spark.createDataFrame(
        [(i, f"corpus doc {i}") for i in range(40)], "doc_id bigint, text string"
    )
    batch = spark.createDataFrame(
        [(100 + i, f"corpus doc {i}") for i in range(0, 40, 4)]
        + [(200 + i, f"fresh doc {i}") for i in range(30)],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r
        for r in bloom_prefilter(corpus, batch, "doc_id", "text").collect()
    }
    assert len(out) == 40
    for i in range(0, 40, 4):
        r = out[100 + i]
        assert r["is_true_dup"] == 1 and r["bloom_candidate"] == 1 and r["n_hit"] == 2
    fresh = [out[200 + i] for i in range(30)]
    assert all(r["is_true_dup"] == 0 for r in fresh)
    # 80 set bits of 512 -> ~2% FP rate; allow generous slack
    assert sum(r["bloom_candidate"] for r in fresh) <= 5


def test_triangle_count_known_graph(spark):
    """Two fused triangles plus a dangling edge: counts must match the
    hand-enumerated census and dangling nodes must not appear."""
    from mapreduce_rust_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (5, 6), (6, 7), (5, 7), (7, 8), (6, 8)],
        "d1 bigint, d2 bigint",
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 1, 6: 2, 7: 2, 8: 1}


def test_shingle_novelty_bounds_and_duplicates(spark):
    """A verbatim duplicate of an earlier doc has novelty 0; the first
    doc always has novelty 1; fresh text has novelty 1."""
    from mapreduce_rust_spark.operators.dedup import shingle_novelty, shingle_sets

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "epsilon zeta eta theta"),
            (4, "gamma delta epsilon zeta eta"),
        ],
        "doc_id bigint, text string",
    )
    sh = shingle_sets(docs, "doc_id", "text", k=3)
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty"])
        for r in shingle_novelty(sh, "doc_id").collect()
    }
    assert got[1] == (2, 2, 1.0)
    assert got[2] == (2, 0, 0.0)
    assert got[3] == (2, 2, 1.0)
    # doc 4: 3 shingles, "gamma delta epsilon" and "delta epsilon zeta"
    # are new, "epsilon zeta eta" was first seen in doc 3
    assert got[4] == (3, 2, pytest.approx(2 / 3))


# ---------- round-5 additions ----------


def test_gopher_rules_flags(spark):
    """Rule attribution: a 60-word doc with stopwords passes; a short
    doc fails the word-count rule; a numeric doc fails the alpha
    rule."""
    from mapreduce_rust_spark.operators.text_analysis import gopher_rules

    long_good = " ".join(["the quick brown fox jumps with vigor and"] * 8)  # 64 words
    docs = spark.createDataFrame(
        [
            (1, long_good),
            (2, "too short to keep"),
            (3, " ".join(["12345 67890"] * 30)),  # 60 words, all numeric
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in gopher_rules(docs, "doc_id", "text").collect()}
    assert got[1]["ok_word_count"] == 1
    assert got[1]["ok_stopwords"] == 1
    assert got[1]["keep"] == 1
    assert got[2]["ok_word_count"] == 0 and got[2]["keep"] == 0
    assert got[3]["ok_word_count"] == 1
    assert got[3]["ok_alpha_frac"] == 0 and got[3]["keep"] == 0


def test_winnowing_guarantee(spark):
    """The winnowing guarantee: two docs sharing a run of >= w+k-1
    words share at least one fingerprint; disjoint docs share none.
    Fingerprint count never exceeds shingle count."""
    from mapreduce_rust_spark.operators.text_analysis import (
        WINNOW_K,
        WINNOW_W,
        winnowing_fingerprints,
    )
    from mapreduce_rust_spark.functions.text import hash64, word_shingles

    shared_run = "alpha beta gamma delta epsilon zeta"  # 6 = w+k-1 words
    docs = spark.createDataFrame(
        [
            (1, "pre one two " + shared_run + " post three"),
            (2, shared_run + " completely different tail words here"),
            (3, "nothing in common with the others at all"),
        ],
        "doc_id bigint, text string",
    )
    # fingerprint SETS via the same building blocks
    sh = word_shingles(F.col("text"), WINNOW_K)
    hashes = F.transform(sh, hash64)
    base = docs.select("doc_id", hashes.alias("h"))
    n = F.size("h")
    m = F.greatest(n - F.lit(WINNOW_W - 1), F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(1), m), lambda j: F.array_min(F.slice("h", j, WINNOW_W))
    )
    fps = {r["doc_id"]: set(r["fps"]) for r in base.select(
        "doc_id", F.array_distinct(mins).alias("fps")).collect()}
    assert fps[1] & fps[2], "shared >= w+k-1 word run must share a fingerprint"
    assert not (fps[1] & fps[3])
    summary = {r["doc_id"]: r for r in winnowing_fingerprints(
        docs, "doc_id", "text").collect()}
    for d, row in summary.items():
        assert 0 < row["n_fingerprints"] <= row["n_shingles"]
        assert row["fp_min"] <= row["fp_max"]


def test_bpe_train_merges_golden(spark):
    """3 merge rounds on a controlled corpus, checked against the
    hand-computed BPE trace (pair counts weighted by word frequency,
    greedy left-to-right application)."""
    from mapreduce_rust_spark.operators import text_analysis as ta

    # corpus: "aab" x3, "ab" x2  ->
    # r1: pairs: (a,a):3  (a,b):5 -> merge (a,b) count 5
    # r2: aab -> [a, ab] x3 ; ab -> [ab] x2 -> pairs: (a,ab):3 -> merge (a,ab)
    # r3: aab -> [aab] x3, no pairs left except none -> vocab exhausted
    docs = spark.createDataFrame(
        [(1, "aab aab aab ab ab")], "doc_id bigint, text string"
    )
    import mapreduce_rust_spark.sources.tables as tables

    orig = tables.load_table
    try:
        tables.load_table = lambda spark_, sf_dir, name: docs
        ta.load_table = tables.load_table
        rows = ta.bpe_train_merges(spark, "unused").collect()
    finally:
        tables.load_table = orig
        ta.load_table = orig
    got = [(r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"]) for r in rows]
    assert got[0] == (1, "a", "b", 5)
    assert got[1] == (2, "a", "ab", 3)
    # round 3: only single-symbol words remain -> no pairs; merge table
    # has fewer than 3 rows
    assert len(got) == 2


def test_k_anonymity_class_sizes(spark):
    from mapreduce_rust_spark.operators.profiling import K_ANON_K

    assert K_ANON_K == 5  # oracle SQL hardcodes the same threshold


def test_maxsim_scores_by_hand(spark):
    """MaxSim on axis-aligned vectors where cosines are 0/1: score =
    number of query tokens whose direction exists in the doc."""
    from mapreduce_rust_spark.operators import similarity as sim

    # pseudo-docs of 10: doc 0 = query (vec 0-9), docs 3+ = corpus
    # doc 3 (vec 30-39) contains both e1 and e2; doc 4 only e1.
    def e(i, dim=4):
        v = [0.0] * dim
        v[i] = 1.0
        return v

    rows = [(0, e(1)), (1, e(2))]           # query doc 0: tokens e1, e2
    rows += [(30, e(1)), (31, e(2))]         # doc 3: e1 and e2
    rows += [(40, e(1)), (41, e(1))]         # doc 4: only e1
    emb = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id bigint, embedding array<float>"
    )
    import mapreduce_rust_spark.sources.tables as tables

    orig = sim.load_table
    try:
        sim.load_table = lambda spark_, sf_dir, name: emb
        got = {
            (r["query_doc"], r["doc_id"]): r["score"]
            for r in sim.ann_maxsim_multivector(spark, "unused").collect()
        }
    finally:
        sim.load_table = orig
    # doc 3 matches both query tokens (score 2), doc 4 only e1 (score 1)
    assert got[(0, 3)] == pytest.approx(2.0)
    assert got[(0, 4)] == pytest.approx(1.0)


def test_embedding_lsh_subset_of_bruteforce(spark):
    """Bucketed pairs are a subset of brute-force pairs at the same
    threshold, and every reported pair's cosine is exact."""
    from mapreduce_rust_spark.operators import dedup as dd

    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(30, 8)).astype("float32")
    vecs[1] = vecs[0] * 1.5          # same direction -> cosine 1
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id bigint, embedding array<float>",
    )
    import mapreduce_rust_spark.sources.tables as tables

    orig = dd.load_table
    try:
        dd.load_table = lambda spark_, sf_dir, name: emb
        lsh = {(r["d1"], r["d2"]) for r in dd.dedup_embedding_lsh(spark, "unused").collect()}
        brute = {(r["d1"], r["d2"]) for r in dd.dedup_embedding_cosine(spark, "unused").collect()}
    finally:
        dd.load_table = orig
    assert lsh <= brute
    assert (0, 1) in lsh, "colinear vectors share every sign bucket"


def test_cdc_chunks_edit_locality(spark):
    """The content-defined-chunking property: inserting tokens early
    in a document changes only the chunk(s) around the edit — the
    chunks after the next boundary are IDENTICAL (fixed-width
    windows would shift every downstream chunk)."""
    from mapreduce_rust_spark.operators import corpus as co
    import mapreduce_rust_spark.sources.tables as tables

    base_words = [f"w{i}" for i in range(60)]
    edited = base_words[:3] + ["INSERTED", "TOKENS"] + base_words[3:]
    docs = spark.createDataFrame(
        [(1, " ".join(base_words)), (2, " ".join(edited))],
        "doc_id bigint, text string",
    )
    orig = co.load_table
    try:
        co.load_table = lambda spark_, sf_dir, name: docs
        census = co.corpus_cdc_chunks(spark, "unused").collect()
    finally:
        co.load_table = orig
    # shared chunks (n_docs == 2) must exist: everything after the
    # first boundary past the edit is byte-identical in both docs
    shared = [r for r in census if r["n_docs"] == 2]
    assert shared, "edit-locality: downstream chunks must be shared"


def test_pq_codebook_vectors_self_code(spark):
    """Every codebook vector must encode as itself with zero
    reconstruction error; non-codebook vectors get valid code range."""
    from mapreduce_rust_spark.operators import similarity as sim
    import numpy as np

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(24, 64)).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(24)],
        "vec_id bigint, embedding array<float>",
    )
    orig = sim.load_table
    try:
        sim.load_table = lambda spark_, sf_dir, name: emb
        rows = {r["vec_id"]: r for r in sim.ann_pq_encode(spark, "unused").collect()}
    finally:
        sim.load_table = orig
    for i in range(sim.PQ_K):
        r = rows[i]
        assert r["recon_mse"] == 0.0
        assert all(r[f"c{j}"] == i for j in range(sim.PQ_M))
    for i in range(sim.PQ_K, 24):
        r = rows[i]
        assert r["recon_mse"] > 0
        assert all(0 <= r[f"c{j}"] < sim.PQ_K for j in range(sim.PQ_M))


def test_tokenizer_coverage_golden(spark):
    """On the controlled BPE corpus both learned merges fully compress
    'aab' and 'ab' to single symbols: 13 chars over 5 tokens ->
    5 symbols, chars_per_symbol = 2.6."""
    from mapreduce_rust_spark.operators import text_analysis as ta

    docs = spark.createDataFrame(
        [(1, "aab aab aab ab ab")], "doc_id bigint, text string"
    ).withColumn("source", F.lit("s1"))
    orig = ta.load_table
    try:
        ta.load_table = lambda spark_, sf_dir, name: docs
        [row] = ta.corpus_tokenizer_coverage(spark, "unused").collect()
    finally:
        ta.load_table = orig
    assert row["source"] == "s1"
    assert row["n_tokens"] == 5
    assert row["total_chars"] == 13
    assert row["total_symbols"] == 5
    assert row["chars_per_symbol"] == 2.6


def test_hard_negatives_never_share_query_label(spark):
    """Every mined negative must carry a different label than its
    query — the false-negative guard the operator exists for."""
    from mapreduce_rust_spark.operators.similarity import (
        embedding_hard_negatives,
    )

    rows = embedding_hard_negatives(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    assert all(r["qlabel"] != r["neg_label"] for r in rows)


def test_webdataset_tar_math(spark, monkeypatch):
    """Tar-entry sizes must be header + 512-aligned payload, shard
    totals must respect the budget except for the one boundary-
    spilling entry, and byte totals must reconcile."""
    from mapreduce_rust_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(i, "x" * (100 + 37 * i), "en", "s0", 0) for i in range(40)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    monkeypatch.setattr(mm, "load_table", lambda s, d, n: docs)
    rows = mm.multimodal_webdataset_index(spark, "x").collect()
    assert sum(r["n_items"] for r in rows) == 40
    for r in rows:
        # every tar byte count is a whole number of 512-blocks
        assert r["tar_bytes"] % 512 == 0
        assert r["tar_bytes"] > r["payload_bytes"]
        # a shard never exceeds budget by more than one max entry
        assert r["tar_bytes"] <= mm.WDS_SHARD_BYTES + (512 + 512 * 40)
    # shards are contiguous id ranges
    ids = sorted(rows, key=lambda r: r["shard_id"])
    for a, b in zip(ids, ids[1:]):
        assert a["last_id"] < b["first_id"]


def test_psi_zero_on_identical_halves(spark, monkeypatch):
    """PSI contract: if both slices have identical bin distributions,
    every contribution is exactly 0 (p == q after smoothing)."""
    import datetime as dt

    from mapreduce_rust_spark.operators import profiling as pf

    base = dt.datetime(2024, 1, 1)
    # even/odd event_ids carry the SAME value multiset
    rows = [
        (2 * i + h, base, i % 7, "view", float(i % 10), "{}")
        for i in range(500)
        for h in (0, 1)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(pf, "load_table", lambda s, d, n: ev)
    out = pf.table_drift_psi(spark, "x").collect()
    assert len(out) == pf.PSI_BINS
    assert all(r["psi_term"] == 0.0 for r in out)
    assert all(r["n_ref"] == r["n_cur"] for r in out)


def test_fd_discovery_verdicts_on_synthetic(spark, monkeypatch):
    """A held FD (key → attr) and a violated one (attr → key) must be
    classified correctly with exact violation counts."""
    from mapreduce_rust_spark.operators import profiling as pf

    nation = spark.createDataFrame(
        [(i, f"name{i}", i % 3) for i in range(30)],
        "n_nationkey bigint, n_name string, n_regionkey bigint",
    )
    monkeypatch.setattr(pf, "load_table", lambda s, d, n: nation)
    monkeypatch.setattr(
        pf,
        "_FD_CANDIDATES",
        (
            ("nation", "n_nationkey", "n_name"),
            ("nation", "n_regionkey", "n_name"),
        ),
    )
    rows = {r["candidate"]: r for r in pf.table_fd_discovery(spark, "x").collect()}
    held = rows["n_nationkey->n_name"]
    assert held["fd_holds"] and held["n_violating"] == 0
    broken = rows["n_regionkey->n_name"]
    assert not broken["fd_holds"]
    assert broken["n_violating"] == 3 and broken["max_fanout"] == 10


def test_centroid_drift_zero_on_mirrored_halves(spark, monkeypatch):
    """If even and odd vec_ids carry IDENTICAL vector sets, the
    per-label centroids coincide: cosine 1, L2 gap 0 — the no-drift
    anchor of the canary."""
    from mapreduce_rust_spark.operators import similarity as sim

    vecs = []
    for i in range(20):
        v = [float((i * 7 + j * 3) % 11 - 5) for j in range(64)]
        vecs.append((2 * i, v, i % 4))      # even half
        vecs.append((2 * i + 1, v, i % 4))  # odd half, same vector
    emb = spark.createDataFrame(
        vecs, "vec_id bigint, embedding array<float>, label int"
    )
    monkeypatch.setattr(sim, "load_table", lambda s, d, n: emb)
    rows = sim.embedding_centroid_drift(spark, "x").collect()
    assert len(rows) == 4
    for r in rows:
        assert r["centroid_cosine"] == 1.0
        assert r["l2_gap"] == 0.0


def test_cumulative_uniques_matches_model(spark, monkeypatch):
    """Daily new/cumulative uniques must match a Python model on a
    constructed stream with returning users and a zero-new day."""
    import datetime as dt

    from mapreduce_rust_spark.plans import behavior as bh

    base = dt.datetime(2024, 3, 1)
    events = []
    # day 0: users 1,2,3; day 1: users 2,3 (no new); day 2: users 3,4
    for d, users in ((0, [1, 2, 3]), (1, [2, 3]), (2, [3, 4])):
        for u in users:
            events.append(
                (len(events), base + dt.timedelta(days=d), u, "view", 1.0, "{}")
            )
    ev = spark.createDataFrame(
        events,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(bh, "load_table", lambda s, d, n: ev)
    rows = [
        (r["new_users"], r["cumulative_users"])
        for r in bh.events_cumulative_uniques(spark, "x").collect()
    ]
    assert rows == [(3, 3), (0, 3), (1, 4)]


def test_negative_funnel_classifies_constructed_users(spark, monkeypatch):
    """One user per outcome class, classified exactly."""
    import datetime as dt

    from mapreduce_rust_spark.plans import behavior as bh

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        # u1: clean conversion (view -> purchase, no error between)
        (1, t(0), 1, "view", 0.0, "{}"),
        (2, t(5), 1, "purchase", 0.0, "{}"),
        # u2: blocked (view -> error -> purchase)
        (3, t(0), 2, "view", 0.0, "{}"),
        (4, t(2), 2, "error", 0.0, "{}"),
        (5, t(5), 2, "purchase", 0.0, "{}"),
        # u3: no purchase after view
        (6, t(0), 3, "view", 0.0, "{}"),
        (7, t(3), 3, "click", 0.0, "{}"),
        # u4: never viewed
        (8, t(1), 4, "purchase", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(bh, "load_table", lambda s, d, n: ev)
    got = {
        r["status"]: r["n_users"]
        for r in bh.funnel_negative_pattern(spark, "x").collect()
    }
    assert got == {
        "converted_clean": 1,
        "blocked_by_error": 1,
        "no_purchase_after_view": 1,
        "no_view": 1,
    }


def test_bbit_estimate_bounded_and_exact_on_identical_sigs(spark):
    """b-bit contract on the real corpus: est_bbit is a corrected
    match rate, so it lives in [-C/(1-C), 1]; whenever the full
    estimate is 1 (identical signatures), the b-bit one must be 1
    too (low bits of equal values are equal)."""
    from mapreduce_rust_spark.operators.dedup import (
        B_BITS,
        dedup_minhash_bbit_eval,
    )

    rows = dedup_minhash_bbit_eval(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    floor = -(1.0 / (1 << B_BITS)) / (1 - 1.0 / (1 << B_BITS)) - 1e-9
    for r in rows:
        assert floor <= r["est_bbit"] <= 1.0 + 1e-9
        if r["est_full"] == 1.0:
            assert r["est_bbit"] == 1.0
