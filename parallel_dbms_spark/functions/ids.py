"""Distributed surrogate-key assignment — unique int64 ids without a
global sort or driver round-trip.

Two flavors:

- ``sparse``: ``monotonically_increasing_id`` — pure map-side
  (partition_id << 33 | partition-local counter), zero shuffle, ids
  unique but with gaps between partitions. The right default for
  "give every row a stable handle within this job".
- ``dense``: gap-free 0..n-1. Needs per-partition counts: one tiny
  aggregation (rows = number of partitions), a prefix-sum over that
  tiny frame, and a broadcast join back — the input data itself is
  never shuffled. This is the standard distributed zipWithIndex
  recipe, expressed in DataFrame ops.

At 100 TB the thing to avoid is ``row_number() OVER ()`` (an
unpartitioned window: every row through one task). Both paths here
keep the big table's partitioning untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def assign_surrogate_keys(
    df: DataFrame, id_col: str = "row_id", dense: bool = False
) -> DataFrame:
    if not dense:
        return df.withColumn(id_col, F.monotonically_increasing_id())

    # Eagerly pin the nondeterministic tags before fan-out: this frame
    # is consumed twice (count aggregation + the broadcast-join main
    # path), and monotonically_increasing_id/spark_partition_id can
    # re-execute with different values per consumer under AQE
    # re-planning — the same divergence fixed in
    # operators.relational._range_partitioned_rn (impossible-bucket
    # regression at sf0.1). One in-memory materialization buys
    # deterministic, collision-free dense ids.
    tagged = (
        df.withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # Per-partition counts: as many rows as partitions — tiny. The
    # prefix sum over that tiny frame is window-free (array-packed
    # cumulation, operators.relational.cumulative_offsets), so no
    # WindowExec — partitioned or not — ever sees the data.
    from ..operators.relational import cumulative_offsets

    counts = tagged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    offsets = cumulative_offsets(
        counts, cnt_col="__n", off_col="__offset"
    )
    w_local = Window.partitionBy("__pid").orderBy("__mid")
    return (
        tagged.join(F.broadcast(offsets), "__pid")
        .withColumn(
            id_col, F.col("__offset") + F.row_number().over(w_local) - F.lit(1)
        )
        .drop("__pid", "__mid", "__offset")
    )
