"""Batch sessionization (gaps-and-islands) over an event stream.

The streaming surface already has session *windows*
(``streaming/windows.py`` session_window); this is the batch twin used
for backfills: assign each event a per-user session sequence number by
splitting on inactivity gaps, then aggregate per session.

Scale notes: one shuffle on the partition key (``user_id``) serves both
window passes and the final aggregation — Catalyst reuses the hash
partitioning, so the whole operator is a single exchange. State per key
is bounded by that user's event count (no global sort). At 100 TB the
plan is shuffle → sort-within-partition → two window scans → partial
agg, all spillable.

Reference parity: the reference has no sessionization; this is part of
the training-data-pipeline extension surface (SURVEY §7 phase 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign session sequence numbers by inactivity gaps.

    A new session starts when the gap to the previous event of the same
    key exceeds ``gap_minutes`` (or at the first event). Returns the
    input with an extra ``session_seq`` column (1-based per key).

    ``order_tiebreak`` makes the window order total so results are
    deterministic when two events share a timestamp (the gap test
    itself is tie-order-invariant: equal timestamps have gap 0).
    """
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(order_tiebreak).asc())
    prev_ts = F.lag(F.col(ts)).over(w)
    # via an explicit timestamp cast so TIMESTAMP_NTZ inputs stay legal
    gap_s = F.col(ts).cast("timestamp").cast("long") - prev_ts.cast("timestamp").cast("long")
    new_session = F.when(
        prev_ts.isNull() | (gap_s > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_seq",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session aggregates: bounds, event count, duration seconds.

    Output is integer/timestamp-only (no float sums) so it is exactly
    comparable against a SQL oracle regardless of aggregation order.
    """
    s = sessionize(events, key=key, ts=ts, gap_minutes=gap_minutes)
    return s.groupBy(F.col(key), F.col("session_seq")).agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.max(F.col(ts).cast("timestamp").cast("long"))
            - F.min(F.col(ts).cast("timestamp").cast("long"))
        ).alias("duration_s"),
    )
