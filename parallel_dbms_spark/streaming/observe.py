"""Streaming observability: a StreamingQueryListener that captures
per-micro-batch progress (rows, rates, state size) in-process.

The batch side has ``plans.execution_metrics`` (DID the scan prune?
DID the combine happen?); this is the streaming counterpart — the
numbers an operator watches on a live pipeline: input rows per batch,
processing rate, and stateful-operator footprint. At scale these feed
an external metrics sink; here they land in a list the tests can
assert on (e.g. "the replay really ran N micro-batches" instead of
inferring it from output shape).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchProgress:
    query_id: str
    batch_id: int
    num_input_rows: int
    state_rows: int


@dataclass
class ProgressCapture(StreamingQueryListener):
    """Collects one :class:`BatchProgress` per completed micro-batch.

    Use via :func:`capture_progress` (attaches on enter, detaches on
    exit). Listener callbacks run on a background thread — the events
    list is append-only and read after ``awaitTermination``, so no
    locking is needed for the replay-style tests this serves.
    """

    events: list[BatchProgress] = field(default_factory=list)

    def onQueryStarted(self, event):  # noqa: N802 (Spark API name)
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        state_rows = sum(
            (op.numRowsTotal or 0) for op in (p.stateOperators or [])
        )
        self.events.append(
            BatchProgress(
                query_id=str(p.id),
                batch_id=int(p.batchId),
                num_input_rows=int(p.numInputRows),
                state_rows=int(state_rows),
            )
        )

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        pass


class capture_progress:
    """``with capture_progress(spark) as cap:`` — run streams, then read
    ``cap.events``."""

    def __init__(self, spark):
        self.spark = spark
        self.listener = ProgressCapture()

    def __enter__(self) -> ProgressCapture:
        self.spark.streams.addListener(self.listener)
        return self.listener

    def __exit__(self, *exc):
        self.spark.streams.removeListener(self.listener)
        return False
