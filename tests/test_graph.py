"""PageRank: differential test against a dense numpy power iteration."""

from __future__ import annotations

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
