"""Exactly-once streaming sinks via foreachBatch.

Structured Streaming's file sink is append-only; real pipelines need
upserts, idempotent restarts, and multi-sink fan-out — all of which go
through ``foreachBatch``. The exactly-once recipe: the checkpoint
records which micro-batch ids committed, and the batch write is made
IDEMPOTENT by keying the output on the batch id (overwrite the batch's
own partition directory). A crash between write and checkpoint commit
replays the batch; the overwrite makes the replay harmless — no
duplicates, the at-least-once replay becomes exactly-once output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_stream_exactly_once(
    streaming_df: DataFrame,
    path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Drive a streaming frame to a batch-id-partitioned parquet layout
    (``path/batch_id=N/``) with idempotent per-batch overwrite; returns
    the finished StreamingQuery. Restarting with the same checkpoint
    re-emits no committed batch, and a replayed uncommitted batch
    overwrites itself.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")
        )

    w = (
        streaming_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    q = w.start()
    q.awaitTermination()
    return q
