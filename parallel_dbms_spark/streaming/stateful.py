"""Custom stateful streaming operator via applyInPandasWithState —
the extension point for semantics Spark's built-in windowed
aggregations can't express (SURVEY §2.3 row "UDF/state").

``running_user_totals`` keeps (n_events, total_cents) per user in
managed state and emits the updated running totals every micro-batch.
State is an int64 cent count (the events' values are 2-decimal), so
the totals are exact regardless of accumulation order — which makes
even this Python-side stateful operator oracle-checkable against
plain SQL on a deterministic replay.

Scale: state is per-key and O(1); Spark partitions the stream by
user_id (hash shuffle), each executor owns its keys' state, and the
HDFS/RocksDB state store checkpoints it. Arrow batches move the data,
so the Python hop is vectorized, not per-row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _update_user(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # value is a 2-decimal double: *100 lands within 1e-9 of an
        # integer, so round() recovers the exact cent count.
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_value), emitted each batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
