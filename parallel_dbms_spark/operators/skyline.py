"""Skyline (Pareto frontier) operator — 2-D minimization.

A row survives iff no other row is <= in both dimensions and < in at
least one (classic SKYLINE / "Pareto-optimal set"; Borzsony et al.
ICDE'01). The reference has no such operator; SQL expresses it only as
a NOT EXISTS self-join — quadratic, and exactly the shape its BNLJ
kernel would grind through (src/Join/join.cu). Here it is a two-level
reduction, the standard distributed-skyline design:

  level 1 — every Arrow batch computes its LOCAL skyline via a sort +
      linear scan (mapInPandas: no shuffle, O(batch log batch), and a
      local skyline is a superset-filter of the global one — dropping
      locally-dominated rows can never drop a global survivor).
  level 2 — the surviving candidates (typically a few hundred rows:
      frontier size is O(log n) expected for independent dims) are
      re-scanned once in a single group to yield the exact frontier.

Worst case is honest: perfectly anti-correlated data has frontier
size n and no skyline algorithm compresses it — level 1 then prunes
nothing and level 2 becomes a single-task sort of n rows. For such
shapes partition the frontier query by a band of one dimension first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _local_skyline(pdf, x: str, y: str):
    """Exact 2-D min-skyline of one pandas frame: sort by (x, y),
    keep first row per x, then rows whose y strictly undercuts every
    earlier (smaller-x) y. Equal (x, y) duplicates all survive."""
    import pandas as pd

    if len(pdf) == 0:
        return pdf
    s = pdf.sort_values([x, y], kind="mergesort")
    ymin_per_x = s.groupby(x, sort=False)[y].transform("min")
    s = s[s[y] == ymin_per_x]  # same-x dominated rows out (dups stay)
    # running min of y over strictly-smaller x: survive iff y undercuts
    grp = s.groupby(x, sort=True)[y].first()  # unique x asc -> min y
    prev_min = dict(zip(grp.index, grp.cummin().shift(1)))
    mask = [
        pd.isna(prev_min[vx]) or vy < prev_min[vx]
        for vx, vy in zip(s[x], s[y])
    ]
    return s[mask]


def skyline_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """Exact Pareto frontier minimizing (``x``, ``y``); other columns
    ride along. Distributed: per-batch local skylines, then one final
    scan over the (small) candidate union."""
    schema = df.schema

    def per_batch(batches):
        for pdf in batches:
            yield _local_skyline(pdf, x, y)

    candidates = df.mapInPandas(per_batch, schema=schema)

    def final(key, pdf):
        return _local_skyline(pdf, x, y)

    return (
        candidates.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(
            lambda key, pdf: final(key, pdf.drop(columns="__g")),
            schema=schema,
        )
    )
