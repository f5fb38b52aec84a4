"""Stream-stream joins (Structured Streaming surface the reference
lacks entirely — SURVEY §2.3 "Streaming").

The canonical shape: attribute each purchase to the clicks the same
user made in the preceding lookback interval. Both sides are
watermarked and the join condition carries an event-time range, so
Spark can evict buffered rows once the other side's watermark passes —
the property that keeps stream-stream join state finite on an
unbounded stream. Inner-join matches emit as soon as both rows have
arrived (the watermark only bounds state, it doesn't delay emission),
so an ``availableNow`` replay produces exactly the batch join's rows —
a full DuckDB oracle.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of the stream is
    joined against a (slowly-changing) static dimension.

    The static side is broadcast — no shuffle of the stream, no join
    state kept between micro-batches (unlike stream-stream joins the
    static side is re-readable, so nothing needs buffering). This is
    the standard "attach dimension attributes to an event firehose"
    shape; at scale the only requirement is that the dim fits the
    broadcast budget (pre-aggregate or pre-filter it if not).
    """
    return stream.join(F.broadcast(dim), on=on, how=how)


def click_purchase_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Interval join: (user_id, click_id, purchase_id, click_ts,
    purchase_ts, purchase_value) for every click within ``lookback``
    before (or simultaneous with) the purchase by the same user.

    State bound: a buffered click can match purchases up to
    ``lookback`` later, so Spark keeps clicks for
    (purchase watermark + lookback) and purchases for the click
    watermark — both finite.

    ``how="leftOuter"`` additionally emits every unmatched click with
    NULL purchase columns — but only once the global watermark proves
    no future purchase can still match (click_ts + lookback behind the
    watermark), i.e. outer rows trail by up to watermark+lookback of
    event time. A bounded replay therefore needs the watermark pushed
    PAST the real data before the last micro-batch — see
    ``stream_stream_left_outer``'s sentinel staging.
    """
    c = (
        clicks.select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    p = (
        purchases.select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return c.join(
        p,
        F.expr(
            f"""user_id = p_user_id
                AND click_ts <= purchase_ts
                AND click_ts >= purchase_ts - INTERVAL {lookback}"""
        ),
        how,
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def stage_with_watermark_sentinels(
    events: DataFrame,
    staged: str,
    n_sentinel_batches: int = 2,
    advance_hours: int = 10,
) -> None:
    """Stage an events backlog for a bounded replay whose watermark
    crosses ALL real event time before the stream ends.

    Writes the real events as one file, then ``n_sentinel_batches``
    single-row-pair sentinel files (user_id = -1, one click + one
    purchase, event time ``i * advance_hours`` past the real max) with
    strictly later modification times. The file source processes files
    in mtime order, so with ``maxFilesPerTrigger=1`` each sentinel is
    its own micro-batch: batch N's event times advance the watermark
    that batch N+1 evaluates state against. Two sentinel batches
    guarantee one batch RUNS with a watermark already past the real
    data — the point where a left-outer stream-stream join emits its
    unmatched real rows. Consumers filter ``user_id >= 0``.

    This is the replay-side analog of what a live pipeline gets for
    free from continuously arriving data; only a bounded backlog needs
    the nudge.
    """
    import os

    from pyspark.sql import Row

    # The file source batches in mtime order; on filesystems with
    # coarse mtime granularity consecutive writes can TIE, letting a
    # sentinel batch merge with (or precede) the real data and starve
    # the left-outer emission. Stamp each write's new files with an
    # explicitly increasing mtime, in write order, so the intended
    # batch order is guaranteed rather than timing-dependent.
    stamped: set[str] = set()
    base = _dt.datetime.now().timestamp()

    def _stamp(step: int) -> None:
        for f in os.listdir(staged):
            p = os.path.join(staged, f)
            if f.endswith(".parquet") and not f.startswith("_") and p not in stamped:
                os.utime(p, (base + step, base + step))
                stamped.add(p)

    spark = events.sparkSession
    max_ts = events.agg(F.max("ts")).collect()[0][0]  # one scalar
    events.coalesce(1).write.mode("append").parquet(staged)
    _stamp(0)
    schema = events.schema
    for i in range(1, n_sentinel_batches + 1):
        ts = max_ts + _dt.timedelta(hours=i * advance_hours)
        rows = [
            Row(
                event_id=-(2 * i),
                ts=ts,
                user_id=-1,
                event_type="click",
                value=0.0,
                props=None,
            ),
            Row(
                event_id=-(2 * i + 1),
                ts=ts,
                user_id=-1,
                event_type="purchase",
                value=0.0,
                props=None,
            ),
        ]
        spark.createDataFrame(
            [tuple(getattr(r, f.name) for f in schema.fields) for r in rows],
            schema,
        ).coalesce(1).write.mode("append").parquet(staged)
        _stamp(i)
