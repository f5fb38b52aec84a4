"""Mergeable equi-width histograms — the quantile companion of the
count-min sketch (frequencies) and HLL (distincts) re-aggregation
surfaces.

``approx_percentile`` answers a one-shot quantile question but Spark
exposes no way to MERGE yesterday's digest with today's. An equi-width
histogram over a known value range is the classic fix: bucket counts
are plain integer sums, so

- the sketch is ONE map-side-combined aggregation (n_buckets rows out,
  corpus-size-independent),
- shard/day sketches merge by bucket-wise addition EXACTLY (tested),
- any quantile is answered from the merged sketch by cumulative-count
  walk + linear interpolation inside the landing bucket, with error
  bounded by one bucket width.

Bucket math is exact integer arithmetic on deterministic doubles, so
the BUILD is value-hash oracle-able in plain SQL (DuckDB computes the
identical floor expression) — unlike GK/t-digest sketches whose
internals are engine-private.

The reference engine has no aggregate beyond COUNT/SUM/AVG/MIN/MAX
(/root/reference/src/operators/aggregate.cpp:10-48); this whole
surface is gap-category work per SURVEY §2.3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def histogram_sketch(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int = 128,
) -> DataFrame:
    """Bucket counts over [lo, hi): (bucket, cnt), bucket in
    [0, n_buckets-1], out-of-range values clamped into the edge
    buckets (so totals always reconcile with row counts). Empty
    buckets are omitted — they read as 0 downstream."""
    if not hi > lo:
        raise ValueError(f"histogram_sketch: need hi > lo, got [{lo}, {hi})")
    width = (hi - lo) / n_buckets
    b = F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width))
    b = F.greatest(F.lit(0), F.least(F.lit(n_buckets - 1), b)).cast("int")
    return (
        df.filter(F.col(col).isNotNull())
        .select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_merge(*sketches: DataFrame) -> DataFrame:
    """Bucket-wise sum — EXACT (integer counters), the property that
    makes per-day/per-shard histograms re-aggregable into any rollup."""
    if not sketches:
        raise ValueError("histogram_merge: need at least one sketch")
    acc = sketches[0]
    for s in sketches[1:]:
        acc = acc.unionByName(s)
    return acc.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))


def quantiles_from_histogram(
    sketch: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    n_buckets: int = 128,
) -> DataFrame:
    """Quantile estimates from a (merged) sketch: for each q, walk the
    cumulative counts to the landing bucket and interpolate linearly
    inside it. Max error = one bucket width ((hi-lo)/n_buckets).

    Distributed shape: the sketch is tiny (<= n_buckets rows) BY
    CONSTRUCTION, so the cumulative walk is computed with a broadcast
    triangular self-join (cum(b) = sum of cnt over buckets <= b) plus
    a broadcast grand total — O(n_buckets²) pairs of bounded data and
    ZERO windows, keeping the registry-wide no-unpartitioned-window
    invariant airtight instead of carving a "bounded window" loophole
    a future query could copy unboundedly. Returns (q, est).
    """
    width = (hi - lo) / n_buckets
    b = sketch.select(
        F.col("bucket").alias("b_bucket"), F.col("cnt").alias("b_cnt")
    )
    cum = (
        sketch.join(F.broadcast(b), F.col("b_bucket") <= F.col("bucket"))
        .groupBy("bucket", "cnt")
        .agg(F.sum("b_cnt").alias("cum"))
        .crossJoin(
            F.broadcast(sketch.agg(F.sum("cnt").alias("total")))
        )
    )
    # ALL quantiles in one pass: broadcast the q-list against the
    # bounded cum frame, keep rows whose cumulative count reaches
    # q*total, min_by picks each q's first (landing) bucket. One plan
    # regardless of len(qs) — a per-q union would replay the
    # triangular join len(qs) times.
    spark = sketch.sparkSession
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    est = (
        F.lit(lo)
        + (
            F.col("bucket").cast("double")
            # fractional position of the q-th row inside the landing bucket
            + (F.col("q") * F.col("total") - (F.col("cum") - F.col("cnt")))
            / F.col("cnt")
        )
        * F.lit(width)
    )
    return (
        cum.crossJoin(F.broadcast(qdf))
        .filter(F.col("cum") >= F.col("q") * F.col("total"))
        .withColumn("__est", est)
        .groupBy("q")
        .agg(F.min_by(F.col("__est"), F.col("bucket")).alias("est"))
    )


def histogram_sketch_grouped(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    lo: float,
    hi: float,
    n_buckets: int = 128,
) -> DataFrame:
    """One histogram per group — (group_cols..., bucket, cnt). Same
    exact-integer contract as ``histogram_sketch``; the aggregation key
    grows to (group, bucket), still one map-side-combined pass and at
    most |groups|·n_buckets output rows. Per-group quantiles follow by
    running the cumulative walk per group key downstream."""
    if not hi > lo:
        raise ValueError(f"histogram_sketch_grouped: need hi > lo, got [{lo}, {hi})")
    width = (hi - lo) / n_buckets
    b = F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width))
    b = F.greatest(F.lit(0), F.least(F.lit(n_buckets - 1), b)).cast("int")
    return (
        df.filter(F.col(col).isNotNull())
        .select(*group_cols, b.alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
