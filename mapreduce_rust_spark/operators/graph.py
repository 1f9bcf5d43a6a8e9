"""Iterative graph operators: connected components for duplicate
clustering.

A dedup pipeline's pair output (``dedup_minhash_lsh``,
``dedup_simhash``, …) is an edge list; choosing survivors requires the
duplicate *clusters*, i.e. connected components. Components are
inherently iterative — no fixed-depth SQL expresses them — so this is
the engine's iterative-algorithm surface, implemented as min-label
propagation on DataFrames (the standard "small-star" style loop):

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated until a fixpoint, which takes O(diameter) rounds. Each round
is one shuffle (groupBy node); the loop runs on the driver but every
data operation is distributed — no collect of nodes or edges. At
100 TB scale this is the textbook Spark components loop (GraphX/
GraphFrames use the same alternation); convergence is checked with a
cheap aggregate per round rather than materializing differences.

The oracle is DuckDB's recursive-CTE transitive closure — exact same
semantics, tractable at oracle scale (sf0.01), infeasible at cluster
scale (closure blowup), which is precisely why the engine runs label
propagation instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_rust_spark.functions.numeric import fround, fround_sql


ORACLE: dict[str, str] = {}


def connected_components(
    edges: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component = min node id reachable. Undirected.

    Each iteration: propagate every node's current label across all
    edges (both directions), take the min per node, stop when no label
    changed (checked via a single count of improved labels). Labels
    monotonically decrease and are bounded below, so termination is
    guaranteed; rounds ≈ graph diameter ≤ ``max_iter``."""
    # undirected: both orientations, once. localCheckpoint (not mere
    # persist) is load-bearing in iterative loops: it TRUNCATES the
    # logical plan, otherwise every round re-analyzes a lineage tree
    # that grows with the iteration count and driver-side planning
    # time swamps the job (measured 33 s → 12 s at sf0.1, with the
    # loop itself dropping to ~0.4 s/round). On a multi-node cluster
    # use rdd.checkpoint()/write-to-parquet for fault-tolerant
    # truncation instead of executor-local blocks.
    # LAZY checkpoints (eager=False) fold materialization into the
    # convergence aggregate: each round runs exactly ONE job — the
    # Σcomp collect — which computes the propagated labels, caches the
    # truncation blocks as a side effect, and returns the convergence
    # scalar. The eager form cost 2 blocking driver round-trips per
    # round (checkpoint job + collect job); halving them halves the
    # loop's sensitivity to driver/scheduler latency (the r04 bench
    # outlier was exactly this latency under host load).
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # identity-label init FUSED with the first propagation round: a
    # node's round-1 label is min(self, neighbors), which one grouped
    # aggregation over the edge list computes directly — saves the
    # separate distinct-nodes shuffle, one full join+groupBy round,
    # and one convergence job (A/B measured ~20% off the loop).
    labels = (
        e.groupBy(F.col("a").alias("node"))
        .agg(F.least(F.min("b"), F.min("a")).alias("comp"))
        .localCheckpoint(eager=False)
    )
    # labels only ever decrease, so Σcomp is a strictly decreasing
    # potential until the fixpoint — one cheap aggregate per round
    # detects convergence with no old-vs-new join.
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]
    for _ in range(max_iter):
        # candidate labels arriving over edges, merged with own label
        prop = (
            e.join(labels, e["a"] == labels["node"])
            .select(F.col("b").alias("node"), F.col("comp"))
            .union(labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        new_sum = prop.agg(F.sum("comp")).collect()[0][0]
        labels = prop
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters from MinHash-LSH candidate pairs: every doc
    participating in a near-dup pair, labeled with its component's min
    doc_id (the canonical survivor). Downstream: keep rows where
    node == comp, drop the rest.

    Memoized per session like the signature index: the component
    labeling is the third shared dedup artifact (survivor selection,
    cluster stats, and reporting all consume it), so the LSH pair
    generation + propagation loop runs once per dataset, not once per
    consuming query."""
    from mapreduce_rust_spark.operators.dedup import (
        _SIG_INDEX,
        _memoized,
        candidate_pairs_index,
    )

    def build():
        pairs = candidate_pairs_index(spark, sf_dir, threshold=0.5, k=3)
        return connected_components(pairs, "d1", "d2").select("node", "comp")

    return _memoized(_SIG_INDEX, (sf_dir, "components-0.5"), build)


def _components_oracle() -> str:
    from mapreduce_rust_spark.operators.dedup import _minhash_oracle

    return f"""
WITH RECURSIVE pairs AS (
  SELECT d1, d2 FROM ({_minhash_oracle()}) WHERE est_sim >= 0.5
),
edges AS (
  SELECT d1 AS a, d2 AS b FROM pairs
  UNION
  SELECT d2 AS a, d1 AS b FROM pairs
),
reach(node, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
)
SELECT node, min(lbl) AS comp FROM reach GROUP BY node
"""


ORACLE["dedup_components"] = _components_oracle()


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor selection over duplicate clusters: within each
    connected component of near-dup pairs, keep the LONGEST document
    (min doc_id on ties) instead of the arbitrary min-id — the policy
    real pipelines want ("drop the truncated copies"). Composes the
    components loop with a per-component ranking window; the window
    shuffles only the clustered docs (a tiny fraction of the corpus),
    never the full table."""
    from pyspark.sql import Window as W

    from mapreduce_rust_spark.sources.tables import load_table

    comps = dedup_components(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    members = comps.join(docs, comps["node"] == docs["doc_id"]).select(
        "comp", "node", "n_chars"
    )
    w = W.partitionBy("comp").orderBy(F.col("n_chars").desc(), F.col("node"))
    ranked = members.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("comp")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("node"))).alias("survivor"),
            F.max(F.when(F.col("rk") == 1, F.col("n_chars"))).alias("survivor_chars"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .orderBy("comp")
    )


def _keep_best_oracle() -> str:
    return f"""
WITH comps AS ({_components_oracle()}),
ranked AS (
  SELECT c.comp, c.node, d.n_chars,
         row_number() OVER (PARTITION BY c.comp
                            ORDER BY d.n_chars DESC, c.node) AS rk
  FROM comps c JOIN documents d ON d.doc_id = c.node
)
SELECT comp,
       max(CASE WHEN rk = 1 THEN node END) AS survivor,
       max(CASE WHEN rk = 1 THEN n_chars END) AS survivor_chars,
       count(*) AS n_members
FROM ranked GROUP BY comp ORDER BY comp
"""


ORACLE["dedup_keep_best"] = _keep_best_oracle()

LPA_ROUNDS = 2  # fixed, synchronous — keeps the oracle unrollable


def label_propagation(
    edges: DataFrame, src: str, dst: str, rounds: int = LPA_ROUNDS
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over an
    undirected edge list: every node starts labeled with itself; each
    round it adopts the MODE of its neighbors' labels (count desc,
    min label on ties). Unlike min-label components this finds
    communities, not reachability classes — a bridge edge between two
    dense dup clusters doesn't merge them.

    A FIXED round count (not convergence) keeps the operator
    deterministic AND value-oracle-able: the DuckDB twin unrolls the
    same {LPA_ROUNDS} rounds as CTEs (the ``embedding_kmeans``
    trick). Each round is one join + one (node, label) count + one
    argmax window partitioned by node — all keyed shuffles on node
    ids, no global ordering anywhere."""
    from pyspark.sql import Window as W

    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = und.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    w = W.partitionBy("node").orderBy(F.col("c").desc(), F.col("lbl"))
    for _ in range(rounds):
        labels = (
            und.join(labels.withColumnRenamed("node", "a"), "a")
            .select(F.col("b").alias("node"), "lbl")
            .groupBy("node", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "lbl")
            .localCheckpoint(eager=False)
        )
    return labels


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community sizes after {LPA_ROUNDS} LPA rounds over the LSH
    near-dup candidate graph — the community-detection view of the
    dup graph (vs ``dedup_components``' reachability view). Output is
    one row per surviving community label."""
    from mapreduce_rust_spark.operators.dedup import candidate_pairs_index

    pairs = candidate_pairs_index(spark, sf_dir, threshold=0.5, k=3)
    final = label_propagation(pairs, "d1", "d2")
    return (
        final.groupBy(F.col("lbl").alias("label"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("label")
    )


def _lpa_oracle() -> str:
    from mapreduce_rust_spark.operators.dedup import _minhash_oracle

    rounds = []
    prev = "l0"
    for i in range(1, LPA_ROUNDS + 1):
        rounds.append(
            f"""r{i} AS (
  SELECT node, lbl FROM (
    SELECT e.b AS node, l.lbl, count(*) AS c,
           row_number() OVER (PARTITION BY e.b
                              ORDER BY count(*) DESC, l.lbl) AS rn
    FROM edges e JOIN {prev} l ON l.node = e.a
    GROUP BY e.b, l.lbl
  ) WHERE rn = 1
)"""
        )
        prev = f"r{i}"
    # MATERIALIZED (kcore-oracle precedent): each round references
    # edges again — without it DuckDB re-inlines the whole MinHash
    # signature derivation per round and spills to disk at sf1
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT d1, d2 FROM ({_minhash_oracle()}) WHERE est_sim >= 0.5
),
edges AS MATERIALIZED (
  SELECT d1 AS a, d2 AS b FROM pairs
  UNION
  SELECT d2 AS a, d1 AS b FROM pairs
),
l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM edges),
{", ".join(rounds)}
SELECT lbl AS label, count(*) AS n_nodes
FROM {prev} GROUP BY 1 ORDER BY 1
"""


ORACLE["graph_label_propagation"] = _lpa_oracle()


def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the LPA communities — the number that
    says whether the detected communities are REAL structure:
    Q = Σ_c (e_c/m − (D_c/2m)²), e_c = intra-community edges, D_c =
    total degree in c; Q ≈ 0 means no better than random, Q ≳ 0.3
    means solid structure. The quality gate one runs before trusting
    community-based dedup survivors. Plan: labels come from the same
    fixed-round LPA (shared semantics with graph_label_propagation);
    classifying every edge as intra/inter is two node-keyed label
    joins; the Σ runs over the |communities|-row frame. One global Q
    row plus the per-community decomposition, all bounded
    aggregates."""
    from mapreduce_rust_spark.operators.dedup import candidate_pairs_index

    pairs = candidate_pairs_index(spark, sf_dir, threshold=0.5, k=3)
    labels = label_propagation(pairs, "d1", "d2")
    und = (
        pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
        .union(pairs.select(F.col("d2").alias("a"), F.col("d1").alias("b")))
        .distinct()
    )
    m2 = und.count()  # 2m: each undirected edge counted both ways
    la = labels.select(F.col("node").alias("a"), F.col("lbl").alias("ca"))
    lb = labels.select(F.col("node").alias("b"), F.col("lbl").alias("cb"))
    tagged = und.join(la, "a").join(lb, "b")
    intra = (
        tagged.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg((F.count(F.lit(1)) / 2).cast("bigint").alias("e_in"))
    )
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    dtot = (
        labels.join(deg.withColumnRenamed("a", "node"), "node")
        .groupBy(F.col("lbl").alias("community"))
        .agg(F.sum("deg").alias("d_tot"))
    )
    per_c = dtot.join(intra, "community", "left").select(
        "community",
        F.coalesce("e_in", F.lit(0)).alias("e_in"),
        "d_tot",
        (
            F.coalesce("e_in", F.lit(0)) / F.lit(m2 / 2.0)
            - (F.col("d_tot") / F.lit(float(m2)))
            * (F.col("d_tot") / F.lit(float(m2)))
        ).alias("q_c"),
    )
    return per_c.select(
        "community",
        "e_in",
        "d_tot",
        fround("q_c", 6).alias("q_contrib"),
    ).orderBy("community")


def _modularity_oracle() -> str:
    from mapreduce_rust_spark.operators.dedup import _minhash_oracle

    rounds = []
    prev = "l0"
    for i in range(1, LPA_ROUNDS + 1):
        rounds.append(
            f"""r{i} AS (
  SELECT node, lbl FROM (
    SELECT e.b AS node, l.lbl, count(*) AS c,
           row_number() OVER (PARTITION BY e.b
                              ORDER BY count(*) DESC, l.lbl) AS rn
    FROM edges e JOIN {prev} l ON l.node = e.a
    GROUP BY e.b, l.lbl
  ) WHERE rn = 1
)"""
        )
        prev = f"r{i}"
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT d1, d2 FROM ({_minhash_oracle()}) WHERE est_sim >= 0.5
),
edges AS MATERIALIZED (
  SELECT d1 AS a, d2 AS b FROM pairs
  UNION
  SELECT d2 AS a, d1 AS b FROM pairs
),
l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM edges),
{", ".join(rounds)},
labels AS MATERIALIZED (SELECT node, lbl FROM {prev}),
m2 AS (SELECT count(*) AS m2 FROM edges),
tagged AS (
  SELECT la.lbl AS ca, lb.lbl AS cb
  FROM edges e
  JOIN labels la ON la.node = e.a
  JOIN labels lb ON lb.node = e.b
),
intra AS (
  SELECT ca AS community, CAST(count(*) / 2 AS BIGINT) AS e_in
  FROM tagged WHERE ca = cb GROUP BY 1
),
deg AS (SELECT a, count(*) AS deg FROM edges GROUP BY 1),
dtot AS (
  SELECT l.lbl AS community, sum(d.deg) AS d_tot
  FROM labels l JOIN deg d ON d.a = l.node
  GROUP BY 1
)
SELECT d.community,
       CAST(coalesce(i.e_in, 0) AS BIGINT) AS e_in,
       CAST(d.d_tot AS BIGINT) AS d_tot,
       {fround_sql("coalesce(i.e_in, 0) / (any_value(m2.m2) / 2.0) - (d.d_tot / CAST(any_value(m2.m2) AS DOUBLE)) * (d.d_tot / CAST(any_value(m2.m2) AS DOUBLE))", 6)} AS q_contrib
FROM dtot d
LEFT JOIN intra i ON i.community = d.community
CROSS JOIN m2
GROUP BY d.community, i.e_in, d.d_tot
ORDER BY d.community
"""


ORACLE["graph_modularity"] = _modularity_oracle()


def graph_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-community CONDUCTANCE of the LPA communities — the cut
    quality metric modularity doesn't give you: phi(c) = cut(c) /
    min(vol(c), 2m - vol(c)), where cut = edge endpoints leaving the
    community and vol = total degree inside. Low phi = a community
    that barely touches the rest of the dup graph (safe to dedup as a
    unit); phi near 1 = an LSH-bridge artifact. Same shared
    artifacts as ``graph_modularity`` (memoized candidate pairs +
    fixed-round LPA labels), two node-keyed label joins, and the
    readout runs on the |communities|-row frame — nothing here scales
    beyond the edge list."""
    from mapreduce_rust_spark.operators.dedup import candidate_pairs_index

    pairs = candidate_pairs_index(spark, sf_dir, threshold=0.5, k=3)
    labels = label_propagation(pairs, "d1", "d2")
    und = (
        pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
        .union(pairs.select(F.col("d2").alias("a"), F.col("d1").alias("b")))
        .distinct()
    )
    m2 = und.count()  # 2m, both directions
    la = labels.select(F.col("node").alias("a"), F.col("lbl").alias("ca"))
    lb = labels.select(F.col("node").alias("b"), F.col("lbl").alias("cb"))
    tagged = und.join(la, "a").join(lb, "b")
    cut = (
        tagged.filter(F.col("ca") != F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count(F.lit(1)).alias("cut"))
    )
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    vol = (
        labels.join(deg.withColumnRenamed("a", "node"), "node")
        .groupBy(F.col("lbl").alias("community"))
        .agg(F.sum("deg").alias("vol"))
    )
    phi = F.coalesce("cut", F.lit(0)) / F.greatest(
        F.least(F.col("vol").cast("double"), F.lit(float(m2)) - F.col("vol")),
        F.lit(1.0),
    )
    return (
        vol.join(cut, "community", "left")
        .select(
            "community",
            F.col("vol").cast("bigint").alias("vol"),
            F.coalesce("cut", F.lit(0)).cast("bigint").alias("cut"),
            fround(phi, 6).alias("conductance"),
        )
        .orderBy("community")
    )


def _conductance_oracle() -> str:
    from mapreduce_rust_spark.operators.dedup import _minhash_oracle

    rounds = []
    prev = "l0"
    for i in range(1, LPA_ROUNDS + 1):
        rounds.append(
            f"""r{i} AS (
  SELECT node, lbl FROM (
    SELECT e.b AS node, l.lbl, count(*) AS c,
           row_number() OVER (PARTITION BY e.b
                              ORDER BY count(*) DESC, l.lbl) AS rn
    FROM edges e JOIN {prev} l ON l.node = e.a
    GROUP BY e.b, l.lbl
  ) WHERE rn = 1
)"""
        )
        prev = f"r{i}"
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT d1, d2 FROM ({_minhash_oracle()}) WHERE est_sim >= 0.5
),
edges AS MATERIALIZED (
  SELECT d1 AS a, d2 AS b FROM pairs
  UNION
  SELECT d2 AS a, d1 AS b FROM pairs
),
l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM edges),
{", ".join(rounds)},
labels AS MATERIALIZED (SELECT node, lbl FROM {prev}),
m2 AS (SELECT count(*) AS m2 FROM edges),
tagged AS (
  SELECT la.lbl AS ca, lb.lbl AS cb
  FROM edges e
  JOIN labels la ON la.node = e.a
  JOIN labels lb ON lb.node = e.b
),
cut AS (
  SELECT ca AS community, CAST(count(*) AS BIGINT) AS cut
  FROM tagged WHERE ca <> cb GROUP BY 1
),
deg AS (SELECT a, count(*) AS deg FROM edges GROUP BY 1),
vol AS (
  SELECT l.lbl AS community, sum(d.deg) AS vol
  FROM labels l JOIN deg d ON d.a = l.node
  GROUP BY 1
)
SELECT v.community,
       CAST(v.vol AS BIGINT) AS vol,
       CAST(coalesce(c.cut, 0) AS BIGINT) AS cut,
       {fround_sql("coalesce(c.cut, 0) / greatest(least(v.vol * 1.0, any_value(m2.m2) - v.vol), 1.0)", 6)} AS conductance
FROM vol v
LEFT JOIN cut c ON c.community = v.community
CROSS JOIN m2
GROUP BY v.community, v.vol, c.cut
ORDER BY v.community
"""


ORACLE["graph_conductance"] = _conductance_oracle()


def graph_clustering_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjusted Rand Index between the dup graph's TWO clusterings —
    connected components (reachability) vs label propagation
    (communities): the standard audit for "do our cheap and expensive
    grouping strategies agree, and where". ARI = (Σ_ij C(n_ij,2) −
    E)/(½(Σ_i C(a_i,2)+Σ_j C(b_j,2)) − E), E the chance-agreement
    term — 1.0 means identical partitions, ≈0 means chance. Both
    labelings come from fixed-depth unrolls (the oracle replays
    them); the contingency table is one (comp, lbl) aggregation
    bounded by cluster counts, and every C(n,2) is plain arithmetic.
    When LPA splits a weakly-bridged component the ARI drops — the
    signal to re-examine those bridge edges before merging
    survivors."""
    from mapreduce_rust_spark.operators.dedup import candidate_pairs_index

    pairs = candidate_pairs_index(spark, sf_dir, threshold=0.5, k=3)
    comp = connected_components(pairs, "d1", "d2").select(
        "node", F.col("comp").alias("ca")
    )
    lpa = label_propagation(pairs, "d1", "d2").select(
        "node", F.col("lbl").alias("cb")
    )
    j = comp.join(lpa, "node")

    def c2(col):
        return col * (col - F.lit(1)) / F.lit(2.0)

    nij = j.groupBy("ca", "cb").agg(F.count(F.lit(1)).alias("n"))
    sum_nij = nij.agg(F.sum(c2(F.col("n"))).alias("s"))
    ai = j.groupBy("ca").agg(F.count(F.lit(1)).alias("n"))
    sum_ai = ai.agg(F.sum(c2(F.col("n"))).alias("sa"))
    bj = j.groupBy("cb").agg(F.count(F.lit(1)).alias("n"))
    sum_bj = bj.agg(F.sum(c2(F.col("n"))).alias("sb"))
    tot = j.agg(c2(F.count(F.lit(1))).alias("t"), F.count(F.lit(1)).alias("n_nodes"))
    out = (
        tot.crossJoin(F.broadcast(sum_nij))
        .crossJoin(F.broadcast(sum_ai))
        .crossJoin(F.broadcast(sum_bj))
    )
    expected = F.col("sa") * F.col("sb") / F.col("t")
    return out.select(
        "n_nodes",
        fround("s", 2).alias("sum_pairs_joint"),
        fround(
            (F.col("s") - expected)
            / ((F.col("sa") + F.col("sb")) / 2.0 - expected),
            6,
        ).alias("adjusted_rand_index"),
    )


def _ari_oracle() -> str:
    from mapreduce_rust_spark.operators.dedup import _minhash_oracle

    lpa_rounds = []
    prev = "l0"
    for i in range(1, LPA_ROUNDS + 1):
        lpa_rounds.append(
            f"""r{i} AS (
  SELECT node, lbl FROM (
    SELECT e.b AS node, l.lbl, count(*) AS c,
           row_number() OVER (PARTITION BY e.b
                              ORDER BY count(*) DESC, l.lbl) AS rn
    FROM edges e JOIN {prev} l ON l.node = e.a
    GROUP BY e.b, l.lbl
  ) WHERE rn = 1
)"""
        )
        prev = f"r{i}"
    return f"""
WITH RECURSIVE pairs AS MATERIALIZED (
  SELECT d1, d2 FROM ({_minhash_oracle()}) WHERE est_sim >= 0.5
),
edges AS MATERIALIZED (
  SELECT d1 AS a, d2 AS b FROM pairs
  UNION
  SELECT d2 AS a, d1 AS b FROM pairs
),
reach AS (
  SELECT a AS node, a AS lbl FROM edges
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
),
comp AS MATERIALIZED (
  SELECT node, min(lbl) AS ca FROM reach GROUP BY 1
),
l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM edges),
{", ".join(lpa_rounds)},
lpa AS MATERIALIZED (SELECT node, lbl AS cb FROM {prev}),
j AS (SELECT c.node, c.ca, l.cb FROM comp c JOIN lpa l USING (node)),
nij AS (
  SELECT sum(n * (n - 1) / 2.0) AS s
  FROM (SELECT ca, cb, count(*) AS n FROM j GROUP BY 1, 2)
),
sa_ AS (
  SELECT sum(n * (n - 1) / 2.0) AS sa
  FROM (SELECT ca, count(*) AS n FROM j GROUP BY 1)
),
sb_ AS (
  SELECT sum(n * (n - 1) / 2.0) AS sb
  FROM (SELECT cb, count(*) AS n FROM j GROUP BY 1)
),
tot AS (
  SELECT count(*) AS n_nodes,
         count(*) * (count(*) - 1) / 2.0 AS t
  FROM j
)
SELECT CAST(tot.n_nodes AS BIGINT) AS n_nodes,
       {fround_sql("nij.s", 2)} AS sum_pairs_joint,
       {fround_sql("(nij.s - sa_.sa * sb_.sb / tot.t) / ((sa_.sa + sb_.sb) / 2.0 - sa_.sa * sb_.sb / tot.t)", 6)} AS adjusted_rand_index
FROM tot CROSS JOIN nij CROSS JOIN sa_ CROSS JOIN sb_
"""


ORACLE["graph_clustering_agreement"] = _ari_oracle()


def pagerank_fixed(
    edges: DataFrame, src: str, dst: str, iters: int = 3, d: float = 0.85
) -> DataFrame:
    """PageRank with a FIXED iteration count over an undirected edge
    list: r ← (1−d)/N + d·Σ_in r/deg, unrolled ``iters`` times.
    Fixed unrolling (vs iterate-to-convergence) keeps the operator
    SQL-expressible, so the oracle can verify it exactly — the
    convergence-loop variant is the same body under the
    connected_components-style driver loop. Each iteration is one
    join + one aggregation on the node key; the rank/degree frame is
    tiny relative to the input that produced the edges."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    deg = e.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    n = deg.count()
    ranks = deg.select("a", F.lit(1.0 / n).alias("r"))
    for _ in range(iters):
        contrib = (
            e.join(ranks, "a")
            .join(deg, "a")
            .select(F.col("b").alias("a"), (F.col("r") / F.col("deg")).alias("c"))
            .groupBy("a")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = deg.select("a").join(contrib, "a", "left").select(
            "a",
            (F.lit((1.0 - d) / n) + F.lit(d) * F.coalesce("in_sum", F.lit(0.0))).alias("r"),
        )
    return ranks.select(F.col("a").alias("node"), F.col("r"))


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank over the MinHash-LSH near-duplicate graph
    — ranks the "hub" documents of each duplicate cluster."""
    from mapreduce_rust_spark.operators.dedup import candidate_pairs_index

    pairs = candidate_pairs_index(spark, sf_dir, threshold=0.5, k=3)
    pr = pagerank_fixed(pairs, "d1", "d2", iters=3, d=0.85)
    return pr.select(
        "node", F.expr("floor(round(r, 10) * 1000000) / 1000000").alias("rank")
    ).orderBy(F.col("rank").desc(), "node")


def _pagerank_oracle() -> str:
    from mapreduce_rust_spark.operators.dedup import _minhash_oracle

    return f"""
WITH pairs AS (
  SELECT d1, d2 FROM ({_minhash_oracle()}) WHERE est_sim >= 0.5
),
edges AS (
  SELECT d1 AS a, d2 AS b FROM pairs
  UNION
  SELECT d2 AS a, d1 AS b FROM pairs
),
deg AS (SELECT a, count(*) AS deg FROM edges GROUP BY a),
n AS (SELECT count(*) AS n FROM deg),
r0 AS (SELECT a, 1.0 / n AS r FROM deg CROSS JOIN n),
r1 AS (
  SELECT d.a, 0.15 / any_value(n.n) + 0.85 * coalesce(sum(r.r / dd.deg), 0) AS r
  FROM deg d CROSS JOIN n
  LEFT JOIN edges e ON e.b = d.a
  LEFT JOIN r0 r ON r.a = e.a
  LEFT JOIN deg dd ON dd.a = e.a
  GROUP BY d.a
),
r2 AS (
  SELECT d.a, 0.15 / any_value(n.n) + 0.85 * coalesce(sum(r.r / dd.deg), 0) AS r
  FROM deg d CROSS JOIN n
  LEFT JOIN edges e ON e.b = d.a
  LEFT JOIN r1 r ON r.a = e.a
  LEFT JOIN deg dd ON dd.a = e.a
  GROUP BY d.a
),
r3 AS (
  SELECT d.a, 0.15 / any_value(n.n) + 0.85 * coalesce(sum(r.r / dd.deg), 0) AS r
  FROM deg d CROSS JOIN n
  LEFT JOIN edges e ON e.b = d.a
  LEFT JOIN r2 r ON r.a = e.a
  LEFT JOIN deg dd ON dd.a = e.a
  GROUP BY d.a
)
SELECT a AS node, floor(round(r, 10) * 1000000) / 1000000 AS rank
FROM r3 ORDER BY rank DESC, node
"""


ORACLE["graph_pagerank"] = _pagerank_oracle()


def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the near-duplicate graph — the structural
    health check of a dedup run: a heavy tail (one node touching
    thousands of pairs) means a boilerplate cluster is about to blow
    up the pair join, and the star-edge / cap mitigations should kick
    in. Reuses the memoized candidate pairs; two tiny aggregations
    (per-node degree, then degree → node count), both with key spaces
    orders of magnitude below the corpus."""
    from mapreduce_rust_spark.operators.dedup import candidate_pairs_index

    pairs = candidate_pairs_index(spark, sf_dir, threshold=0.5, k=3)
    nodes = pairs.select(F.col("d1").alias("node")).unionAll(
        pairs.select(F.col("d2").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("degree")
    )


def _degree_oracle() -> str:
    from mapreduce_rust_spark.operators.dedup import _minhash_oracle

    return f"""
WITH pairs AS (
  SELECT d1, d2 FROM ({_minhash_oracle()}) WHERE est_sim >= 0.5
),
nodes AS (
  SELECT d1 AS node FROM pairs UNION ALL SELECT d2 FROM pairs
),
deg AS (SELECT node, count(*) AS degree FROM nodes GROUP BY 1)
SELECT degree, count(*) AS n_nodes FROM deg GROUP BY 1 ORDER BY 1
"""


ORACLE["graph_degree_distribution"] = _degree_oracle()


def triangle_count(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation over a canonical (d1 < d2) edge
    list — the classic two-join distributed formulation: wedge
    (a,b)+(b,c) closed by the (a,c) edge, each triangle enumerated
    exactly once because a < b < c is forced by edge canonicality.
    Cost is Σ_b deg(b)² for the wedge join — at cluster scale, orient
    edges by degree (low→high) first; here the LSH posting-list cap
    already bounds degrees."""
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.d2") == F.col("e2.d1"))
        .join(
            e3,
            (F.col("e3.d1") == F.col("e1.d1"))
            & (F.col("e3.d2") == F.col("e2.d2")),
        )
        .select(
            F.col("e1.d1").alias("a"),
            F.col("e1.d2").alias("b"),
            F.col("e2.d2").alias("c"),
        )
    )
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-duplicate graph (the clustering-
    coefficient building block): a triangle is three documents that
    are ALL pairwise near-duplicates — dense boilerplate cliques show
    up here while the component census still sees one undifferentiated
    blob. Reuses the memoized candidate pairs; the joins run over the
    edge list (orders of magnitude smaller than the corpus)."""
    from mapreduce_rust_spark.operators.dedup import candidate_pairs_index

    pairs = candidate_pairs_index(spark, sf_dir, threshold=0.5, k=3)
    return triangle_count(pairs.select("d1", "d2")).orderBy("node")


def _triangle_oracle() -> str:
    from mapreduce_rust_spark.operators.dedup import _minhash_oracle

    return f"""
WITH pairs AS (
  SELECT d1, d2 FROM ({_minhash_oracle()}) WHERE est_sim >= 0.5
),
tri AS (
  SELECT e1.d1 AS a, e1.d2 AS b, e2.d2 AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.d1 = e1.d2
  JOIN pairs e3 ON e3.d1 = e1.d1 AND e3.d2 = e2.d2
),
nodes AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT node, count(*) AS n_triangles FROM nodes GROUP BY 1 ORDER BY 1
"""


ORACLE["graph_triangle_count"] = _triangle_oracle()

def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster SIZE DISTRIBUTION: how many near-dup clusters
    have 2 members, 3, … — the shape report that decides dedup policy
    (a fat head of giant clusters means boilerplate/templating and
    argues for keep-one-per-cluster; a long tail of pairs means
    organic duplication). Free off the memoized component labeling
    (one extra two-level aggregation); the cluster-size key is tiny."""
    labels = dedup_components(spark, sf_dir)
    return (
        labels.groupBy("comp")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .withColumn(
            "n_docs_covered",
            (F.col("cluster_size") * F.col("n_clusters")).cast("bigint"),
        )
        .orderBy("cluster_size")
    )


def _cluster_sizes_oracle() -> str:
    return f"""
WITH comps AS ({_components_oracle()})
SELECT cluster_size, count(*) AS n_clusters,
       CAST(cluster_size * count(*) AS BIGINT) AS n_docs_covered
FROM (SELECT comp, count(*) AS cluster_size FROM comps GROUP BY comp)
GROUP BY cluster_size ORDER BY cluster_size
"""


ORACLE["dedup_cluster_sizes"] = _cluster_sizes_oracle()


def graph_node_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural (link-prediction) similarity of each near-dup
    candidate pair: Jaccard of the two docs' NEIGHBOR SETS in the dup
    graph, excluding the pair itself — high overlap means the pair
    sits inside a coherent duplicate cluster (safe to merge); zero
    overlap flags a bridge edge that may be an LSH false positive
    chaining two unrelated clusters. The triangle-closing signal
    community detection and entity resolution both lean on. Reuses
    the session-memoized LSH candidate pairs (same edge list as the
    components loop — no re-banding); common-neighbor counting is one
    self-join of the edge list KEYED ON THE PAIR, so cost is
    Σ_pairs min(deg) — bounded by the LSH candidate set, never n².
    Every candidate pair is itself an edge, so the excluded-other
    degree is deg-1 exactly; all-integer arithmetic until the final
    ratio."""
    from mapreduce_rust_spark.operators.dedup import candidate_pairs_index

    pairs = candidate_pairs_index(spark, sf_dir, threshold=0.5, k=3).select(
        "d1", "d2"
    )
    und = pairs.select(F.col("d1").alias("a"), F.col("d2").alias("n")).union(
        pairs.select(F.col("d2").alias("a"), F.col("d1").alias("n"))
    )
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    e1 = und.select(F.col("a").alias("d1"), F.col("n").alias("n1"))
    e2 = und.select(F.col("a").alias("d2"), F.col("n").alias("n2"))
    common = (
        pairs.join(e1, "d1")
        .join(e2, "d2")
        .filter(
            (F.col("n1") == F.col("n2"))
            & (F.col("n1") != F.col("d1"))
            & (F.col("n1") != F.col("d2"))
        )
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    da = deg.select(F.col("a").alias("d1"), (F.col("deg") - 1).alias("deg1"))
    db = deg.select(F.col("a").alias("d2"), (F.col("deg") - 1).alias("deg2"))
    out = (
        pairs.join(common, ["d1", "d2"], "left")
        .join(da, "d1")
        .join(db, "d2")
        .select(
            "d1",
            "d2",
            F.coalesce("cn", F.lit(0)).alias("common_neighbors"),
            (F.col("deg1") + F.col("deg2") - F.coalesce("cn", F.lit(0))).alias(
                "_union"
            ),
        )
        .select(
            "d1",
            "d2",
            "common_neighbors",
            F.when(
                F.col("_union") > 0,
                fround(F.col("common_neighbors") / F.col("_union"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("jaccard"),
        )
    )
    return out.orderBy(
        F.col("jaccard").desc(), F.col("common_neighbors").desc(), "d1", "d2"
    ).limit(100)


def _node_jaccard_oracle() -> str:
    from mapreduce_rust_spark.operators.dedup import _minhash_oracle

    return f"""
WITH pairs AS (
  SELECT d1, d2 FROM ({_minhash_oracle()}) WHERE est_sim >= 0.5
),
und AS (
  SELECT d1 AS a, d2 AS n FROM pairs
  UNION ALL
  SELECT d2 AS a, d1 AS n FROM pairs
),
deg AS (SELECT a, count(*) AS deg FROM und GROUP BY 1),
common AS (
  SELECT p.d1, p.d2, count(*) AS cn
  FROM pairs p
  JOIN und e1 ON e1.a = p.d1
  JOIN und e2 ON e2.a = p.d2 AND e2.n = e1.n
  WHERE e1.n != p.d1 AND e1.n != p.d2
  GROUP BY 1, 2
)
SELECT p.d1, p.d2,
       CAST(coalesce(cn, 0) AS BIGINT) AS common_neighbors,
       CASE WHEN (da.deg - 1) + (db.deg - 1) - coalesce(cn, 0) > 0
            THEN floor(round((coalesce(cn, 0) / CAST((da.deg - 1) + (db.deg - 1) - coalesce(cn, 0) AS DOUBLE)), 10) * 1000000) / 1000000
            ELSE 0.0 END AS jaccard
FROM pairs p
LEFT JOIN common c ON c.d1 = p.d1 AND c.d2 = p.d2
JOIN deg da ON da.a = p.d1
JOIN deg db ON db.a = p.d2
ORDER BY jaccard DESC, common_neighbors DESC, p.d1, p.d2
LIMIT 100
"""


ORACLE["graph_node_jaccard"] = _node_jaccard_oracle()


KCORE_K = 2
KCORE_ROUNDS = 4


def kcore_peel(edges: DataFrame, src: str, dst: str, k: int, rounds: int) -> DataFrame:
    """Fixed-round k-core peeling: repeatedly drop nodes with degree
    < k and restrict edges to survivors. ``rounds`` is FIXED (not
    run-to-convergence) so the DuckDB oracle can replay the identical
    computation as unrolled CTEs — the same contract as the k-means
    trace; `tests/test_advanced.py` pins that the peel has CONVERGED
    by that depth on the real data (round r == round r+1), so the
    fixed-round output equals the true k-core there. Each round is
    one degree aggregation + one semi-join pair — all keyed on node
    ids, no driver data."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    for _ in range(rounds):
        alive = (
            e.groupBy("a")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("a")
        )
        e = (
            e.join(alive, "a", "left_semi")
            .join(alive.select(F.col("a").alias("b")), "b", "left_semi")
            .localCheckpoint(eager=False)
        )
    return (
        e.groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).alias("core_deg"))
        .orderBy("node")
    )


def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {k}-core of the near-dup graph: the maximal subgraph where
    every doc keeps ≥ {k} duplicate-candidate neighbors — the dense
    hearts of duplicate clusters (a chain of borderline pairs falls
    out; a genuinely replicated document family survives). Standard
    community-detection preprocessing; reuses the memoized LSH pair
    list like the components loop."""
    from mapreduce_rust_spark.operators.dedup import candidate_pairs_index

    pairs = candidate_pairs_index(spark, sf_dir, threshold=0.5, k=3)
    return kcore_peel(pairs, "d1", "d2", KCORE_K, KCORE_ROUNDS)


graph_kcore.__doc__ = graph_kcore.__doc__.format(k=KCORE_K)


def _kcore_oracle() -> str:
    from mapreduce_rust_spark.operators.dedup import _minhash_oracle

    rounds = []
    prev = "e0"
    for r in range(1, KCORE_ROUNDS + 1):
        rounds.append(f"""
n{r} AS (
  SELECT a FROM {prev} GROUP BY a HAVING count(*) >= {KCORE_K}
),
e{r} AS MATERIALIZED (
  SELECT e.a, e.b FROM {prev} e
  JOIN n{r} x ON e.a = x.a
  JOIN n{r} y ON e.b = y.a
)""")
        prev = f"e{r}"
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT d1, d2 FROM ({_minhash_oracle()}) WHERE est_sim >= 0.5
),
e0 AS MATERIALIZED (
  SELECT d1 AS a, d2 AS b FROM pairs
  UNION
  SELECT d2 AS a, d1 AS b FROM pairs
),
{",".join(rounds)}
SELECT a AS node, count(*) AS core_deg
FROM {prev}
GROUP BY a
ORDER BY node
"""


ORACLE["graph_kcore"] = _kcore_oracle()


def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree ASSORTATIVITY of the near-duplicate graph: the Pearson
    correlation of endpoint degrees over all (directed) edges — the
    one-number structural fingerprint that separates hub-and-spoke
    duplication (negative: boilerplate templates matched by many
    singleton near-copies) from clique-like duplication (positive:
    dense mutually-similar families). Reuses the memoized LSH pairs;
    cost is one degree aggregation plus two joins keyed on node ids,
    all edge-list-sized. corr is algebraic, so the final statistic is
    one partial-aggregatable pass."""
    from mapreduce_rust_spark.operators.dedup import candidate_pairs_index

    pairs = candidate_pairs_index(spark, sf_dir, threshold=0.5, k=3)
    und = pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b")).union(
        pairs.select(F.col("d2").alias("a"), F.col("d1").alias("b"))
    )
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    da = deg.select(F.col("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("a").alias("b"), F.col("deg").alias("deg_b"))
    edges = und.join(da, "a").join(db, "b")
    return edges.agg(
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_edges"),
        fround(F.corr("deg_a", "deg_b"), 4).alias("assortativity"),
    )


def _assortativity_oracle() -> str:
    from mapreduce_rust_spark.operators.dedup import _minhash_oracle

    return f"""
WITH pairs AS (
  SELECT d1, d2 FROM ({_minhash_oracle()}) WHERE est_sim >= 0.5
),
und AS (
  SELECT d1 AS a, d2 AS b FROM pairs
  UNION ALL
  SELECT d2 AS a, d1 AS b FROM pairs
),
deg AS (SELECT a, count(*) AS deg FROM und GROUP BY 1)
SELECT CAST(count(*) / 2 AS BIGINT) AS n_edges,
       {fround_sql('corr(da.deg, db.deg)', 4)} AS assortativity
FROM und e
JOIN deg da ON da.a = e.a
JOIN deg db ON db.a = e.b
"""


ORACLE["graph_assortativity"] = _assortativity_oracle()


def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar link-prediction score for each near-dup candidate
    pair: AA(u,v) = Σ_{w ∈ CN(u,v)} 1/ln(deg(w)) — common neighbors
    weighted by how *selective* they are (a shared neighbor that
    touches everything carries almost no evidence; a rare one is a
    strong merge signal). The standard refinement over raw
    common-neighbor counts for entity-resolution edge scoring. Same
    plan shape as graph_node_jaccard: one pair-keyed self-join of the
    memoized LSH edge list plus a broadcast-size degree join on the
    common neighbor — cost Σ_pairs min(deg), bounded by the banded
    candidate set, never n². Every common neighbor has deg ≥ 2 (it
    touches both endpoints), so ln(deg) > 0 always; excluded-endpoint
    correction is unnecessary for the NEIGHBOR's own degree (the
    weight is a property of w, not of the pair)."""
    from mapreduce_rust_spark.operators.dedup import candidate_pairs_index

    pairs = candidate_pairs_index(spark, sf_dir, threshold=0.5, k=3).select(
        "d1", "d2"
    )
    und = pairs.select(F.col("d1").alias("a"), F.col("d2").alias("n")).union(
        pairs.select(F.col("d2").alias("a"), F.col("d1").alias("n"))
    )
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    e1 = und.select(F.col("a").alias("d1"), F.col("n").alias("n1"))
    e2 = und.select(F.col("a").alias("d2"), F.col("n").alias("n2"))
    scored = (
        pairs.join(e1, "d1")
        .join(e2, "d2")
        .filter(
            (F.col("n1") == F.col("n2"))
            & (F.col("n1") != F.col("d1"))
            & (F.col("n1") != F.col("d2"))
        )
        .join(deg.select(F.col("a").alias("n1"), "deg"), "n1")
        .groupBy("d1", "d2")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum(F.lit(1.0) / F.log("deg")).alias("aa"),
        )
    )
    return (
        pairs.join(scored, ["d1", "d2"], "left")
        .select(
            "d1",
            "d2",
            F.coalesce("common_neighbors", F.lit(0)).alias("common_neighbors"),
            F.expr(
                "floor(round(coalesce(aa, 0.0), 10) * 1000000) / 1000000"
            ).alias("adamic_adar"),
        )
        .orderBy(F.col("adamic_adar").desc(), "d1", "d2")
        .limit(100)
    )


def _adamic_adar_oracle() -> str:
    from mapreduce_rust_spark.operators.dedup import _minhash_oracle

    # MATERIALIZED: pairs is referenced four times below — without it
    # DuckDB re-inlines the full MinHash pipeline per reference.
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT d1, d2 FROM ({_minhash_oracle()}) WHERE est_sim >= 0.5
),
und AS (
  SELECT d1 AS a, d2 AS n FROM pairs
  UNION ALL
  SELECT d2 AS a, d1 AS n FROM pairs
),
deg AS (SELECT a, count(*) AS deg FROM und GROUP BY 1),
scored AS (
  SELECT p.d1, p.d2, count(*) AS cn, sum(1.0 / ln(dw.deg)) AS aa
  FROM pairs p
  JOIN und e1 ON e1.a = p.d1
  JOIN und e2 ON e2.a = p.d2 AND e2.n = e1.n
  JOIN deg dw ON dw.a = e1.n
  WHERE e1.n != p.d1 AND e1.n != p.d2
  GROUP BY 1, 2
)
SELECT p.d1, p.d2,
       CAST(coalesce(s.cn, 0) AS BIGINT) AS common_neighbors,
       floor(round(coalesce(s.aa, 0.0), 10) * 1000000) / 1000000 AS adamic_adar
FROM pairs p
LEFT JOIN scored s ON s.d1 = p.d1 AND s.d2 = p.d2
ORDER BY adamic_adar DESC, p.d1, p.d2
LIMIT 100
"""


ORACLE["graph_adamic_adar"] = _adamic_adar_oracle()


EIGEN_ITERS = 3


def eigenvector_centrality_fixed(
    edges: DataFrame, src: str, dst: str, iters: int = EIGEN_ITERS
) -> DataFrame:
    """Eigenvector centrality by FIXED-iteration power method with L1
    normalization: x ← A·x, x ← x/Σx, unrolled ``iters`` times from
    the uniform vector. L1 (not the textbook L2) keeps every step a
    plain sum — exactly SQL-expressible, so the oracle replays it
    bit-for-bit; the induced ranking is identical (normalization is a
    positive scalar). Distinct from PageRank: no damping and no
    out-degree division, so high-degree neighbors transfer FULL
    weight — the "popular friends make you popular" centrality.
    Each iteration is one edge join + node aggregation + one scalar
    broadcast of the L1 norm; the score frame stays node-sized."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    nodes = e.select(F.col("a")).distinct()
    n = nodes.count()
    x = nodes.select("a", F.lit(1.0 / n).alias("x"))
    for _ in range(iters):
        agg = (
            e.join(x, "a")
            .select(F.col("b").alias("a"), F.col("x"))
            .groupBy("a")
            .agg(F.sum("x").alias("s"))
        )
        # The raw frame feeds BOTH sides of the normalization (the
        # scores and their L1 norm); an eager node-sized checkpoint
        # pins it so each side reads the materialized result instead
        # of replaying the whole lineage — without it the double
        # reference doubles the recompute per iteration (2^iters
        # blowup). Three node-sized checkpoints, each one edge join.
        raw = (
            nodes.join(agg, "a", "left")
            .select("a", F.coalesce("s", F.lit(0.0)).alias("s"))
            .localCheckpoint()
        )
        x = raw.crossJoin(
            F.broadcast(raw.agg(F.sum("s").alias("tot")))
        ).select("a", (F.col("s") / F.col("tot")).alias("x"))
    return x.select(F.col("a").alias("node"), F.col("x"))


def graph_eigenvector_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration L1 power method over the near-dup graph — surfaces
    the documents sitting at the dense core of duplicate clusters."""
    from mapreduce_rust_spark.operators.dedup import candidate_pairs_index

    pairs = candidate_pairs_index(spark, sf_dir, threshold=0.5, k=3)
    ec = eigenvector_centrality_fixed(pairs, "d1", "d2", iters=EIGEN_ITERS)
    return ec.select(
        "node",
        F.expr("floor(round(x, 10) * 100000000) / 100000000").alias("centrality"),
    ).orderBy(F.col("centrality").desc(), "node")


def _eigenvector_oracle() -> str:
    from mapreduce_rust_spark.operators.dedup import _minhash_oracle

    step = """
{cur} AS (
  SELECT nd.a, coalesce(sum(x.x), 0) AS s
  FROM (SELECT DISTINCT a FROM edges) nd
  LEFT JOIN edges e ON e.b = nd.a
  LEFT JOIN {prev} x ON x.a = e.a
  GROUP BY nd.a
),
{cur}n AS (
  SELECT a, s / (SELECT sum(s) FROM {cur}) AS x FROM {cur}
)"""
    chain = ",".join(
        step.format(cur=f"x{i}", prev=f"x{i - 1}n" if i > 1 else "x0")
        for i in range(1, EIGEN_ITERS + 1)
    )
    # MATERIALIZED on edges: the unrolled power-iteration references it
    # 2 + 2·iters times — without it DuckDB re-runs MinHash per use.
    return f"""
WITH pairs AS (
  SELECT d1, d2 FROM ({_minhash_oracle()}) WHERE est_sim >= 0.5
),
edges AS MATERIALIZED (
  SELECT d1 AS a, d2 AS b FROM pairs
  UNION
  SELECT d2 AS a, d1 AS b FROM pairs
),
x0 AS (
  SELECT a, 1.0 / (SELECT count(DISTINCT a) FROM edges) AS x
  FROM (SELECT DISTINCT a FROM edges)
),
{chain}
SELECT a AS node,
       floor(round(x, 10) * 100000000) / 100000000 AS centrality
FROM x{EIGEN_ITERS}n ORDER BY centrality DESC, node
"""


ORACLE["graph_eigenvector_centrality"] = _eigenvector_oracle()


QUERIES = {
    "graph_conductance": graph_conductance,
    "graph_adamic_adar": graph_adamic_adar,
    "graph_eigenvector_centrality": graph_eigenvector_centrality,
    "graph_modularity": graph_modularity,
    "graph_clustering_agreement": graph_clustering_agreement,
    "graph_label_propagation": graph_label_propagation,
    "graph_assortativity": graph_assortativity,
    "dedup_components": dedup_components,
    "graph_node_jaccard": graph_node_jaccard,
    "graph_kcore": graph_kcore,
    "dedup_cluster_sizes": dedup_cluster_sizes,
    "dedup_keep_best": dedup_keep_best,
    "graph_pagerank": graph_pagerank,
    "graph_degree_distribution": graph_degree_distribution,
    "graph_triangle_count": graph_triangle_count,
}
