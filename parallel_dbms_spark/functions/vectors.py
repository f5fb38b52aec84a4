"""Vector-column aggregation: per-label centroids over embeddings.

Complements functions/similarity.py (per-row vector math: cosine,
LSH, IVF) with cross-row aggregation. Used for IVF-style cell stats,
per-class mean embeddings, and drift monitoring.

Scale notes: ``posexplode`` turns an N×D embedding table into N·D
narrow rows, then a single hash aggregation on (label, pos) computes
all centroids — map-side partial aggregation shrinks the shuffle to
(labels × D) rows regardless of N. No driver collect; D is bounded
(embedding dim), labels are bounded, so the final state is tiny even
at 100 TB of input vectors.

Float-sum caveat: summing doubles is order-dependent in the last ulp,
so ``centroids`` is verified against numpy to 1e-6 in tests, while
``quantized_centroid_sums`` (floor-scaled BIGINT arithmetic, exact in
any order) is the driver-oracle form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _exploded(emb: DataFrame, label: str, vec: str) -> DataFrame:
    return emb.select(
        F.col(label), F.posexplode(F.col(vec)).alias("pos", "val")
    )


def centroids(
    emb: DataFrame, label: str = "label", vec: str = "embedding"
) -> DataFrame:
    """Mean vector per label: (label, centroid array<double>)."""
    per_dim = _exploded(emb, label, vec).groupBy(label, "pos").agg(
        F.avg(F.col("val").cast("double")).alias("m")
    )
    return per_dim.groupBy(label).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("pos"), F.col("m")))
        ).getField("m").alias("centroid")
    )


def quantized_centroid_sums(
    emb: DataFrame,
    label: str = "label",
    vec: str = "embedding",
    scale: float = 1e6,
) -> DataFrame:
    """Exact, order-independent centroid form for oracle comparison.

    Each float is widened to double (exact), scaled, floored to BIGINT
    (deterministic given IEEE doubles), then summed exactly. Returns
    (label, pos, sum_scaled, n); centroid_dim ≈ sum_scaled / (n·scale).
    """
    e = _exploded(emb, label, vec)
    return e.groupBy(label, "pos").agg(
        F.sum(
            F.floor(F.col("val").cast("double") * F.lit(scale)).cast("long")
        ).alias("sum_scaled"),
        F.count(F.lit(1)).alias("n"),
    )


def centroid_drift(
    emb: DataFrame,
    split_col,
    label: str = "label",
    vec: str = "embedding",
    scale: float = 1e6,
) -> DataFrame:
    """Day-over-day (or cohort-vs-cohort) centroid drift monitor, in
    exact integer arithmetic so the whole statistic value-hashes.

    ``split_col`` is a boolean column splitting the corpus into
    cohorts A (true) and B (false). Per (label, dim) the two cohorts'
    floor-scaled sums and counts are computed in ONE aggregation pass
    (conditional sums — no second scan, no join); the per-label drift
    numerator sums |sa*nb - sb*na| over dims: zero iff the cohort
    mean vectors are identical at the quantization, monotone in the
    centroid gap, and — being integer — exactly reproducible by any
    engine. (A float cosine between centroids is the human-friendly
    derivative; computing it from these sums is one driver-side
    division away and deliberately NOT baked in, to keep the
    monitored quantity hashable.)
    """
    e = emb.select(
        F.col(label),
        split_col.alias("__a"),
        F.posexplode(F.col(vec)).alias("pos", "val"),
    ).select(
        label,
        "__a",
        "pos",
        F.floor(F.col("val").cast("double") * F.lit(scale))
        .cast("long")
        .alias("q"),
    )
    per_dim = e.groupBy(label, "pos").agg(
        F.sum(F.when(F.col("__a"), F.col("q")).otherwise(F.lit(0))).alias("sa"),
        F.sum(F.when(F.col("__a"), 1).otherwise(0)).cast("long").alias("na"),
        F.sum(F.when(~F.col("__a"), F.col("q")).otherwise(F.lit(0))).alias("sb"),
        F.sum(F.when(~F.col("__a"), 1).otherwise(0)).cast("long").alias("nb"),
    )
    return per_dim.groupBy(label).agg(
        F.sum(
            F.abs(F.col("sa") * F.col("nb") - F.col("sb") * F.col("na"))
        ).alias("drift_num"),
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
    )
