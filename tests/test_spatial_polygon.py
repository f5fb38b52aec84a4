"""points_in_convex_polygon: fixture-polygon invariants + differential
against an independent ray-casting implementation on random points."""

from __future__ import annotations

import numpy as np

from parallel_dbms_spark.operators import points_in_convex_polygon
from parallel_dbms_spark.queries.relational import _FENCE


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def test_fence_is_convex_ccw():
    n = len(_FENCE)
    for i in range(n):
        o, a, b = _FENCE[i], _FENCE[(i + 1) % n], _FENCE[(i + 2) % n]
        assert _cross(o, a, b) > 0, "fixture polygon must be convex CCW"


def _ray_cast_inside(px, py, verts):
    """Independent check: crossing-number ray cast (counts edges a
    rightward ray crosses; odd = inside). Treats on-edge as inside via
    an exact half-plane pass first."""
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        if (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1) < 0:
            return False
    return True


def test_differential_vs_ray_cast(spark):
    rng = np.random.default_rng(23)
    pts = rng.uniform(0, 1000, size=(2000, 2))
    # add exact vertices and edge midpoints (boundary is inside)
    extra = list(_FENCE) + [
        (
            (_FENCE[i][0] + _FENCE[(i + 1) % len(_FENCE)][0]) / 2,
            (_FENCE[i][1] + _FENCE[(i + 1) % len(_FENCE)][1]) / 2,
        )
        for i in range(len(_FENCE))
    ]
    all_pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)] + [
        (10_000 + i, x, y) for i, (x, y) in enumerate(extra)
    ]
    df = spark.createDataFrame(all_pts, "id long, x double, y double")
    got = {
        r.id for r in points_in_convex_polygon(df, _FENCE).collect()
    }
    want = {i for i, x, y in all_pts if _ray_cast_inside(x, y, _FENCE)}
    assert got == want
    # vertices and midpoints are all on the boundary -> all inside
    assert all(10_000 + i in got for i in range(len(extra)))
    # sanity: a meaningful interior fraction was exercised
    assert 300 < len(got & set(range(2000))) < 1500
