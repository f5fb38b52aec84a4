"""Weighted SSSP: hand-checkable fixture + hop-bound contract."""

from __future__ import annotations


def test_sssp_weighted_matches_hand_dijkstra(spark):
    from parallel_dbms_spark.functions.graph import sssp_weighted

    #   1 --2-- 2 --1-- 3
    #    \--5-------/
    #   4 isolated-ish via expensive edge from 3
    edges = spark.createDataFrame(
        [(1, 2, 2), (2, 3, 1), (1, 3, 5), (3, 4, 10)],
        "src long, dst long, w long",
    )
    got = {r["node"]: r["cost"]
           for r in sssp_weighted(edges, 1, max_rounds=4).collect()}
    assert got == {1: 0, 2: 2, 3: 3, 4: 13}

    # hop bound is the contract: with 1 round, only direct edges
    got1 = {r["node"]: r["cost"]
            for r in sssp_weighted(edges, 1, max_rounds=1).collect()}
    assert got1 == {1: 0, 2: 2, 3: 5}

    # relaxation must IMPROVE an early expensive path: 1-3 direct is 5,
    # two-hop is 3 — round 2 must settle 3, not keep 5
    got2 = {r["node"]: r["cost"]
            for r in sssp_weighted(edges, 1, max_rounds=2).collect()}
    assert got2[3] == 3
