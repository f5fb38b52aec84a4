"""PageRank: differential test against a dense numpy power iteration."""

from __future__ import annotations
import pytest

import numpy as np
from pyspark.sql import Row

from parallel_dbms_spark.functions.graph import pagerank


def test_pagerank_matches_numpy_power_iteration(spark):
    # star (0-1,0-2,0-3) + path (3-4-5): node 0 and 3 are the hubs
    raw = [(0, 1), (0, 2), (0, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame([Row(src=a, dst=b) for a, b in raw])
    got = {r.id: r.rank for r in pagerank(edges, damping=0.85, iters=10).collect()}

    # dense reference with identical update rule and iteration count
    n = 6
    A = np.zeros((n, n))
    for a, b in raw:
        A[a, b] = A[b, a] = 1.0
    deg = A.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        r = (1 - 0.85) / n + 0.85 * (A.T @ (r / deg))
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-9, (i, got[i], r[i])
    # hub ordering: 0 (degree 3) above leaves; ranks sum to ~1
    assert got[0] > got[1] and got[3] > got[4] > got[5] or got[3] > got[5]
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_triangle_count_known_graphs(spark):
    from parallel_dbms_spark.functions.graph import triangle_count

    # K4: 4 triangles; plus a dangling path that adds none
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    extra = [(3, 10), (10, 11)]
    df = spark.createDataFrame(k4 + extra, "src long, dst long")
    assert triangle_count(df) == 4
    # duplicate and reversed edges must not change the count
    noisy = spark.createDataFrame(
        k4 + [(b, a) for a, b in k4] + k4 + extra, "src long, dst long"
    )
    assert triangle_count(noisy) == 4
    # a star (hub) has no triangles at any size
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 40)], "src long, dst long"
    )
    assert triangle_count(star) == 0
    # triangle-free bipartite square
    square = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    assert triangle_count(square) == 0


def test_cooccurrence_edges_bucket_cap(spark):
    from parallel_dbms_spark.functions.graph import cooccurrence_edges

    rows = [("b1", i) for i in range(5)] + [("hot", 100 + i) for i in range(20)]
    df = spark.createDataFrame(rows, "bucket string, node long")
    all_e = cooccurrence_edges(df, ["bucket"], "node")
    assert all_e.count() == 10 + 190  # C(5,2) + C(20,2), disjoint nodes
    capped = cooccurrence_edges(df, ["bucket"], "node", max_bucket=10)
    assert capped.count() == 10  # hot bucket dropped entirely


def test_bfs_hops_known_graph_and_unreachable(spark):
    from pyspark.sql import Row

    from parallel_dbms_spark.functions.graph import bfs_hops

    # path 0-1-2-3, star 0-{4,5}, island 8-9 (unreachable from 0)
    edges = spark.createDataFrame(
        [Row(src=0, dst=1), Row(src=1, dst=2), Row(src=2, dst=3),
         Row(src=0, dst=4), Row(src=0, dst=5), Row(src=8, dst=9)]
    )
    got = {r.node: r.hops for r in bfs_hops(edges, 0, max_hops=6).collect()}
    assert got == {0: 0, 1: 1, 4: 1, 5: 1, 2: 2, 3: 3}

    # max_hops truncates the frontier
    got2 = {r.node: r.hops for r in bfs_hops(edges, 0, max_hops=1).collect()}
    assert got2 == {0: 0, 1: 1, 4: 1, 5: 1}


def test_bfs_hops_takes_shortest_path_through_cycle(spark):
    from pyspark.sql import Row

    from parallel_dbms_spark.functions.graph import bfs_hops

    # cycle 0-1-2-3-4-0: node 3 is 2 hops via 4, not 3 hops via 1-2
    edges = spark.createDataFrame(
        [Row(src=i, dst=(i + 1) % 5) for i in range(5)]
    )
    got = {r.node: r.hops for r in bfs_hops(edges, 0).collect()}
    assert got == {0: 0, 1: 1, 4: 1, 2: 2, 3: 2}


@pytest.mark.slow  # residual: both algorithms are asserted individually in this file
def test_star_components_equal_label_propagation(spark):
    """Star contraction == label propagation on random seeded graphs
    (the two independent implementations cross-check each other)."""
    import random

    from parallel_dbms_spark.functions.dedup import duplicate_clusters
    from parallel_dbms_spark.functions.graph import connected_components_star

    rng = random.Random(42)
    for trial in range(3):
        n = 40
        edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(35)}
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        lp = {
            (r["id"], r["cluster_id"])
            for r in duplicate_clusters(df).withColumnRenamed("label", "cluster_id").collect()
        }
        star = {
            (r["id"], r["cluster_id"])
            for r in connected_components_star(df).collect()
        }
        assert star == lp, f"trial {trial}"


def test_star_components_converge_logarithmically_on_paths(spark):
    """A 64-node path (diameter 63) must converge in O(log n) rounds —
    the property that makes star contraction the 100 TB choice over
    O(diameter) label propagation."""
    from parallel_dbms_spark.functions.graph import star_components_with_rounds

    path = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(path, "id_a long, id_b long")
    labels, rounds = star_components_with_rounds(df)
    got = {(r["id"], r["cluster_id"]) for r in labels.collect()}
    assert got == {(i, 0) for i in range(64)}
    assert rounds <= 10, f"expected O(log n) rounds, took {rounds}"
