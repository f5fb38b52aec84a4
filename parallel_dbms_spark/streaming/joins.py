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
) -> DataFrame:
    """Inner interval join: (user_id, click_id, purchase_id, click_ts,
    purchase_ts, purchase_value) for every click within ``lookback``
    before (or simultaneous with) the purchase by the same user.

    State bound: a buffered click can match purchases up to
    ``lookback`` later, so Spark keeps clicks for
    (purchase watermark + lookback) and purchases for the click
    watermark — both finite.
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
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )
