"""Iterative graph algorithms over edge-list DataFrames.

The reference has no graph surface; ``dedup.duplicate_clusters``
(min-label propagation) and this module are the iterative-algorithm
extension lane: driver-side loop, fully distributed per-iteration work,
lineage truncated each round so 10 iterations don't compile a 10-deep
plan. The canonical consumer is the near-duplicate graph (jaccard /
LSH pairs): PageRank centrality marks the "hub" documents of a
duplicate neighborhood — a better canonical-pick signal than raw
length when clusters are dense.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank over an UNDIRECTED edge list.

    Each iteration is one join (ranks onto edges) + one aggregation
    (contributions by target) — the classic distributed formulation:
    ranks/degrees are (node, value) tables partitioned by node id, no
    adjacency ever materializes on one machine. ``localCheckpoint``
    truncates lineage per round, keeping plan compile time constant in
    ``iters``. Dangling nodes can't occur in an undirected expansion
    (every node has degree ≥ 1).

    Returns (id, rank); ranks sum to ~1 (float accumulation order makes
    the last ulps run-dependent — callers wanting exact comparability
    should rank/quantize, as the registered query does).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    nodes = e.select(F.col("u").alias("id")).distinct().localCheckpoint()
    n = nodes.count()
    deg = e.groupBy(F.col("u").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    # contributions join on the edge source — pre-attach degree once
    e_deg = e.join(deg, e["u"] == deg["id"]).select("u", "v", "deg").localCheckpoint()
    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    for _ in range(iters):
        contribs = (
            e_deg.join(ranks, e_deg["u"] == ranks["id"])
            .select(F.col("v").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def pagerank_exact(
    edges: DataFrame,
    damping_num: int = 85,
    damping_den: int = 100,
    iters: int = 10,
    scale: int = 10**12,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """:func:`pagerank` in the PINNED ORACLE MODE (the repo's
    integer-twin convention): ranks live on an integer pico-unit
    lattice and damping is the RATIONAL ``damping_num/damping_den``,
    so every round is exact int64 arithmetic — per-edge contribution
    ``r div deg`` (floor), order-free integer sums, update
    ``base + (num * s) div den`` — and any engine replays the run
    bit-identically with the rounds unrolled (queries/extensions.py
    graph_pagerank_neardup). The floors lose mass (ranks no longer sum
    to ~scale) but preserve the centrality ORDERING the float twin
    computes, which is what the hub-document consumer reads; the float
    :func:`pagerank` stays the serving default.

    Same distributed shape as the float twin: one join + one
    aggregation per round over (node, value) tables, lineage truncated
    per round. Overflow headroom: sums are bounded by the total mass
    <= scale (1e12), so ``num * s`` stays under 1e14 << 2^63.
    Returns (id, rank_e12).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    nodes = e.select(F.col("u").alias("id")).distinct().localCheckpoint()
    n = nodes.count()
    deg = e.groupBy(F.col("u").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    e_deg = (
        e.join(deg, e["u"] == deg["id"])
        .select("u", "v", "deg")
        .localCheckpoint()
    )
    r0 = scale // n
    base = ((damping_den - damping_num) * scale) // (damping_den * n)
    ranks = nodes.select("id", F.lit(r0).cast("long").alias("rank_e12"))
    for _ in range(iters):
        contribs = (
            e_deg.join(ranks, e_deg["u"] == ranks["id"])
            .select(
                F.col("v").alias("id"),
                F.expr("rank_e12 div deg").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs, "id", "left")
            .select(
                "id",
                F.expr(
                    f"CAST({base} AS BIGINT) + ({damping_num} * "
                    f"COALESCE(s, CAST(0 AS BIGINT))) div {damping_den}"
                ).alias("rank_e12"),
            )
            .localCheckpoint()
        )
    return ranks


def closed_wedges(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact triangle enumeration of an undirected graph by degree-ordered
    edge orientation — the classic distributed formulation (Suri &
    Vassilvitskii 2011, "Counting Triangles and the Curse of the Last
    Reducer").

    Orienting every edge from its (degree, id)-smaller endpoint to the
    larger one turns the graph into a DAG where each triangle appears
    as exactly ONE wedge (s->v, s->w) closed by the oriented edge
    (v->w). The wedge join fans out from each vertex's OUT-degree,
    which orientation bounds by O(sqrt(m)) — so the intermediate is
    O(m^1.5) worst-case instead of the hub-explosion a naive
    neighbor-join suffers (the "last reducer" a star graph would
    otherwise melt).

    Shuffle profile: one distinct + one degree aggregation + three
    equi-joins, all on node keys; nothing driver-side. Returns one row
    (s, v, w) per triangle, each triangle exactly once.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    ed = e.join(da, "a").join(db, "b")
    # orient by the total order (deg, id): src = smaller endpoint
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    o = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("s"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("d"),
        F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias("deg_d"),
    )
    o1 = o.select("s", F.col("d").alias("v"), F.col("deg_d").alias("deg_v"))
    o2 = o.select("s", F.col("d").alias("w"), F.col("deg_d").alias("deg_w"))
    # each unordered wedge once: v precedes w in the same total order
    wedges = o1.join(o2, "s").filter(
        (F.col("deg_v") < F.col("deg_w"))
        | ((F.col("deg_v") == F.col("deg_w")) & (F.col("v") < F.col("w")))
    )
    return wedges.join(
        o.select(F.col("s").alias("v"), F.col("d").alias("w")), ["v", "w"]
    ).select("s", "v", "w")


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> int:
    """Exact triangle count — see ``closed_wedges``."""
    return closed_wedges(edges, src, dst).count()


def cooccurrence_edges(
    df: DataFrame,
    bucket_cols: list,
    node_col: str,
    max_bucket: int | None = None,
) -> DataFrame:
    """Undirected co-occurrence edges: nodes sharing any bucket (e.g.
    users active in the same (event_type, hour)) get an edge. The
    bucket self-join is the jaccard-candidate shape — at 100 TB cap
    hot buckets with ``max_bucket`` (df-cap guard: a bucket of k nodes
    contributes k² pairs; drop ones above the cap like
    dedup.ngram_jaccard_pairs drops stop-shingles)."""
    b = df.select(*bucket_cols, F.col(node_col).alias("node")).distinct()
    if max_bucket is not None:
        sizes = b.groupBy(*bucket_cols).agg(F.count(F.lit(1)).alias("__bn"))
        b = b.join(
            sizes.filter(F.col("__bn") <= max_bucket).drop("__bn"),
            bucket_cols,
            "leftsemi",
        )
    l = b.select(*bucket_cols, F.col("node").alias("src"))
    r = b.select(*bucket_cols, F.col("node").alias("dst"))
    return (
        l.join(r, bucket_cols)
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def bfs_hops(edges: DataFrame, source, max_hops: int = 6) -> DataFrame:
    """Single-source shortest HOP counts over an undirected edge list
    — breadth-first frontier expansion, the iterative-algorithm shape
    Spark answers with a bounded loop of joins (same discipline as
    ``pagerank``/``duplicate_clusters``: localCheckpoint truncates the
    lineage each round so round k doesn't replay rounds 1..k-1).

    Per round: frontier ⋈ edges -> neighbors, anti-join against the
    settled set (a node's FIRST visit is its shortest hop count —
    that's BFS), append, repeat. Terminates at ``max_hops`` or an
    empty frontier, whichever first. Each round is one shuffle join on
    the node key; the settled set only grows, so the anti-join's right
    side is the (small) result, not the graph.

    Returns (node, hops) for every node reachable within ``max_hops``,
    source included at hops 0.
    """
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    node_t = dict(edges.dtypes)["src"]
    dist = spark.createDataFrame([(source, 0)], f"node {node_t}, hops int")
    frontier = dist.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .withColumn("hops", F.lit(h))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.union(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return dist


def star_components_with_rounds(
    pairs: DataFrame, max_iter: int = 30
) -> tuple[DataFrame, int]:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14): converges in O(log n) ROUNDS on any graph,
    where plain label propagation needs O(diameter) — the difference
    between 5 and 50 shuffles on a 100 TB web-link graph with long
    chains.

    large-star: every node's HIGHER-id neighbors re-attach to its
    current minimum; small-star: the lower-or-equal neighbors (and the
    node) re-attach. Both are one groupBy + one join keyed on the same
    node id; each round halves the tree height. Returns
    ((id, cluster_id) with cluster_id = component minimum — the same
    contract as ``dedup.duplicate_clusters`` — and the round count).
    """
    edges = (
        pairs.select(
            F.col("id_a").cast("long").alias("u"),
            F.col("id_b").cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col("u").alias("id"))
        .unionByName(edges.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint()
    )

    def signature(e: DataFrame):
        # bit_xor: order-independent AND overflow-free under ANSI mode
        # (a SUM of raw xxhash64 values overflows int64)
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    rounds = 0
    prev_sig = None
    for _ in range(max_iter):
        rounds += 1
        # large-star on the symmetrized edge list
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        edges = (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star on the downward-directed list (u >= v)
        down = edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m2 = down.groupBy("u").agg(F.min("v").alias("m"))
        edges = (
            down.join(m2, "u")
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
                        F.struct(F.col("u").alias("u"), F.col("m").alias("v")),
                    )
                ).alias("e")
            )
            .select("e.u", "e.v")
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        sig = signature(edges)
        if sig == prev_sig:
            break
        prev_sig = sig
    # stars now point every node at its component min
    labels = (
        nodes.join(edges, nodes["id"] == edges["u"], "left")
        .groupBy("id")
        .agg(F.least(F.min("v"), F.first("id")).alias("cluster_id"))
    )
    return labels, rounds


def connected_components_star(pairs: DataFrame, max_iter: int = 30) -> DataFrame:
    """(id, cluster_id) — see :func:`star_components_with_rounds`."""
    return star_components_with_rounds(pairs, max_iter)[0]


def sssp_weighted(
    edges: DataFrame,
    source,
    max_rounds: int = 6,
    weight: str = "w",
) -> DataFrame:
    """Single-source shortest WEIGHTED paths, bounded to paths of at
    most ``max_rounds`` edges — distributed Bellman-Ford, the weighted
    sibling of ``bfs_hops``.

    Per round: settled distances ⋈ edges relax every out-edge
    (candidate cost = dist + w), then a groupBy-min folds candidates
    into the running frontier. Each round is one shuffle join + one
    aggregation on the node key; ``localCheckpoint`` truncates lineage
    so round k never replays rounds 1..k-1 (the repo-wide iterative
    discipline). Integer weights keep costs exact — the result is
    engine-portable and oracle-hashable against a hop-bounded
    recursive-CTE closure.

    The hop bound is the contract (not a convergence heuristic): the
    result is exactly min-cost over paths of <= max_rounds edges,
    which a negative-free graph extends to true SSSP once
    max_rounds >= graph diameter. Returns (node, cost) for every node
    reachable within the bound, source at cost 0.
    """
    sym = (
        edges.select("src", "dst", weight)
        .union(
            edges.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                F.col(weight),
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    node_t = dict(edges.dtypes)["src"]
    dist = spark.createDataFrame([(source, 0)], f"node {node_t}, cost long")
    for _ in range(max_rounds):
        cand = (
            dist.join(sym, dist["node"] == sym["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("cost") + F.col(weight)).alias("cost"),
            )
        )
        dist = (
            dist.union(cand)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
            .localCheckpoint(eager=True)
        )
    return dist


def kcore(edges: DataFrame, k: int, max_rounds: int = 30) -> DataFrame:
    """Nodes of the k-core: the maximal subgraph where every node has
    degree >= k. Iterative peeling — drop nodes with degree < k,
    recompute degrees on the induced subgraph, repeat to fixpoint.

    Each round is one degree aggregation plus two semi-joins that
    restrict the edge set to surviving endpoints; ``localCheckpoint``
    truncates lineage per round (the repo-wide iterative discipline,
    same as sssp_weighted/bfs_hops above). The fixpoint test is a
    bounded driver scalar (one count per round). Peeling converges in
    at most |V| rounds; real graphs converge in a handful, and
    ``max_rounds`` bounds the worst case — on early exit the result
    is a SUPERSET of the k-core (degrees all >= k except possibly
    nodes whose support left in the final un-checked round), so the
    bound is a safety valve, not a semantic knob.

    Returns (node, degree) for k-core members with their in-core
    degree.
    """
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_n = -1
    deg = None
    for _ in range(max_rounds):
        deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
        keep = deg.filter(F.col("degree") >= k).select("src").localCheckpoint(eager=True)
        n = keep.count()
        if n == prev_n:
            break
        prev_n = n
        sym = (
            sym.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
    return deg.filter(F.col("degree") >= k).select(
        F.col("src").alias("node"), "degree"
    )
