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
