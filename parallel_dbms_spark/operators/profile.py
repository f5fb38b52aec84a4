"""Table profiling — the data-quality pass a pipeline runs before
trusting a new drop of data (and the stats a query optimizer wants).

One job over the table computes, per requested column: row count,
null count, exact distinct count, min and max (stringified so one
long-format result covers heterogeneous column types). All aggregates
fold map-side; the output is |cols| rows.

At 100 TB swap exact ndv for approx_count_distinct (documented in the
caller when estimates are acceptable); everything else is already
constant-state per partition.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, functions as F


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format profile: (column, n_rows, n_null, n_distinct,
    min_value, max_value) — one row per profiled column, one scan per
    column batch (Spark shares the scan across the unioned branches)."""
    parts = []
    for c in cols:
        col = F.col(c)
        parts.append(
            df.agg(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(col.isNull(), 1).otherwise(0)).alias("n_null"),
                F.count_distinct(col).alias("n_distinct"),
                F.min(col).cast("string").alias("min_value"),
                F.max(col).cast("string").alias("max_value"),
            )
        )
    return functools.reduce(DataFrame.unionByName, parts)


def skew_report(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Join-key skew diagnosis: the ``top`` heaviest keys with each
    key's share of all rows and its ratio to the mean key load.

    Run this BEFORE a big join: a skew_ratio in the hundreds means one
    shuffle partition will receive that multiple of the average work —
    the signal to salt the key (``join_skew_salted``) or rely on AQE
    skew-splitting. Two map-side-combinable aggregations; the totals
    ride along as a broadcast scalar.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.count(F.lit(1)).alias("__nkeys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            F.col(key),
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("__total")).alias("row_share"),
            (
                F.col("n_rows").cast("double")
                * F.col("__nkeys")
                / F.col("__total")
            ).alias("skew_ratio"),
        )
        .orderBy(F.col("n_rows").desc(), F.col(key).asc())
        .limit(top)
    )
