"""Incremental aggregate maintenance — refresh a rollup from a delta
without rescanning history.

The 100 TB motivation: a daily revenue rollup over a year of data is
~365× cheaper to maintain by (1) aggregating ONLY the new day and
(2) merging its partial state into the stored rollup, than by
recomputing over the full fact table. This is exactly Spark's own
partial/final aggregation split (HashAggregateExec's partial_sum /
merge), lifted to table granularity and made durable: the stored
rollup keeps mergeable STATE (sum/count/min/max), and finalization
(avg = sum/count) happens at read time.

All five reference aggregates (COUNT/SUM/AVG/MIN/MAX —
/root/reference/src/operators/aggregate.cpp:10-48) have mergeable
state; sums go through exact DECIMAL(18,2) so merge order cannot
change a bit. The same state algebra is what a sketch column (HLL,
count-min — see queries/extensions.py's hll_reaggregate) uses for
distinct counts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def _money(col: str):
    return F.col(col).cast("decimal(18,2)")


def agg_state(
    df: DataFrame, keys: Sequence[str], measure: str
) -> DataFrame:
    """Aggregate a batch into mergeable state per key:
    (n_rows, sum_m, min_m, max_m) — everything COUNT/SUM/AVG/MIN/MAX
    need, one hash aggregation."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_money(measure)).alias("sum_m"),
        F.min(_money(measure)).alias("min_m"),
        F.max(_money(measure)).alias("max_m"),
    )


def merge_states(state: DataFrame, delta_state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge two state tables: union + one re-aggregation over the
    (tiny) state rows. Associative and commutative, so any number of
    increments in any order converges to the full recompute."""
    u = state.unionByName(delta_state)
    return u.groupBy(*keys).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("sum_m").alias("sum_m"),
        F.min("min_m").alias("min_m"),
        F.max("max_m").alias("max_m"),
    )


def finalize(state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """State -> user-facing aggregates. AVG materializes here (the
    reference's AVG=SUM/COUNT rewrite, /root/reference/src/main.cpp:563-566,
    applied at read time); sums stay exact until the final double cast."""
    return state.select(
        *keys,
        F.col("n_rows").alias("n_rows"),
        F.col("sum_m").cast("double").alias("sum_value"),
        # double / long, not decimal division: both engines (Spark and
        # the DuckDB oracle) then divide identical doubles — bit-equal.
        (F.col("sum_m").cast("double") / F.col("n_rows")).alias("avg_value"),
        F.col("min_m").cast("double").alias("min_value"),
        F.col("max_m").cast("double").alias("max_value"),
    )
