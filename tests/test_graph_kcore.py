"""k-core decomposition (functions/graph.py kcore): differential
against a pure-Python peeling reference on a structured graph, plus
semantic spot checks (clique survives, tree dissolves)."""

from __future__ import annotations

from collections import defaultdict

from parallel_dbms_spark.functions.graph import kcore


def _py_kcore(edge_list, k):
    adj = defaultdict(set)
    for u, v in edge_list:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items() if nb}


def _check(spark, edge_list, k):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["node"]: r["degree"] for r in kcore(edges, k=k).collect()}
    assert got == _py_kcore(edge_list, k)


def test_clique_plus_pendants(spark):
    # K5 clique (4-core) with a pendant chain off each clique node:
    # chains peel away layer by layer, the clique stays
    clique = [(u, v) for u in range(5) for v in range(u + 1, 5)]
    chains = [(u, 10 + u * 10 + i) for u in range(5) for i in range(3)]
    _check(spark, clique + chains, k=4)
    _check(spark, clique + chains, k=2)


def test_tree_has_no_2core(spark):
    tree = [(0, i) for i in range(1, 6)] + [(i, i + 10) for i in range(1, 6)]
    _check(spark, tree, k=2)  # both sides empty


def test_ring_is_its_own_2core(spark):
    ring = [(i, (i + 1) % 8) for i in range(8)]
    _check(spark, ring, k=2)
    _check(spark, ring, k=3)  # empty


def test_deterministic_pseudorandom_graph(spark):
    # structured pseudo-random graph (no RNG): multiplicative hashing
    edge_list = [((i * 7919) % 60, (i * 104729) % 60) for i in range(240)]
    for k in (2, 3, 4):
        _check(spark, edge_list, k)
