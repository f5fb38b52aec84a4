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
