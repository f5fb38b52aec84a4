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


# ---------------------------------------------------------------------------
# transformWithStateInPandas — Spark 4's successor stateful API: typed
# state variables (ValueState/ListState/MapState), timers, and TTL on
# the state store, replacing the single-tuple GroupState.
#
# RUNTIME DEPENDENCY: the TWS Python runner speaks protobuf to the JVM
# (google.protobuf), which this container does not ship — so the
# operator is import-gated (``tws_available``) and its test skips when
# the dependency is absent. applyInPandasWithState above is the fully
# exercised stateful path; this surface is API-complete and becomes
# live wherever protobuf exists (any standard Spark 4 deployment).
# ---------------------------------------------------------------------------
TWS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)


def _build_max_processor():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserMaxProcessor(StatefulProcessor):
        """Per-user running (count, max(value)) in a typed ValueState.

        max is order-invariant, so the end-of-replay emission is exact
        against a plain SQL aggregate — the oracle-checkable choice for
        a nondeterministically-batched stream (a SUM of doubles would
        drift with accumulation order; count and max cannot).
        """

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "agg", "n_events BIGINT, max_value DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, mx = self._state.get() if self._state.exists() else (0, None)
            for pdf in rows:
                n += len(pdf)
                batch_max = pdf["value"].max()
                if mx is None or (batch_max == batch_max and batch_max > mx):
                    mx = float(batch_max)
            self._state.update((n, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
            )

        def close(self) -> None:
            pass

    return UserMaxProcessor()


def running_user_max(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, max_value) via the typed-state API."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_build_max_processor(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def tws_available() -> bool:
    """True when the transformWithStateInPandas runtime (protobuf) is
    importable — the operator silently crashes the streaming Python
    runner without it, so callers should gate on this."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False
