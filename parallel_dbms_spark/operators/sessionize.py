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


def transition_counts(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    state: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: for each ordered pair (from_state, to_state), the
    number of adjacent occurrences and the row-conditional probability
    P(to | from).

    One window (partitioned by key — never global, the plan-sweep
    rule) computes the lagged state; one groupBy folds the pairs; a
    second tiny aggregation on ``from_state`` (broadcast back by
    Catalyst) normalizes rows into probabilities. Probabilities are
    returned quantized to 1e-6 (``p_e6``) via INTEGER division
    (n·10⁶ div n_from) — exact in every engine, no float rounding to
    disagree on.

    Scale: the shuffle keys are (key) then (from_state, to_state) —
    the second is low-cardinality (|states|^2 groups) and the first is
    the same partitioning sessionize() already uses, so a pipeline
    computing both reuses the exchange.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(order_tiebreak).asc())
    pairs = (
        events.select(
            F.lag(F.col(state)).over(w).alias("from_state"),
            F.col(state).alias("to_state"),
        )
        .filter(F.col("from_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_state").agg(F.sum("n").alias("n_from"))
    return pairs.join(totals, "from_state").select(
        "from_state",
        "to_state",
        "n",
        F.expr("(n * 1000000L) div n_from").cast("long").alias("p_e6"),
    )
