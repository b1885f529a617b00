"""Custom stateful streaming operator: per-user gap sessionization via
``applyInPandasWithState`` — the arbitrary-stateful-processing machinery
the training-data pipeline needs for operators Spark's built-in windowed
aggregations can't express (session identity depends on the previous
event's time, not on a fixed window boundary).

Semantics match the batch `event_sessions` catalog query exactly: a new
session starts when a user's inter-event gap exceeds ``gap_seconds`` (or
on their first event); state per user is (last event time, running event
count, running session count).  Correctness contract (tested in
tests/test_streaming.py): for any file stream whose per-user event times
are non-decreasing across micro-batches, the final state equals the batch
computation over the union of the inputs.

Scale notes: state is 3 scalars per user (10^9 users ≈ 24 GB across the
cluster — RocksDB state store territory, configured by the runtime, not
the operator); each micro-batch shuffles only by user_id.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("n_sessions", T.LongType()),
])
STATE_SCHEMA = T.StructType([
    T.StructField("last_ts", T.DoubleType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("n_sessions", T.LongType()),
])


def _sessionize_fn(gap_seconds: int):
    def fn(key, pdfs, state: GroupState):
        if state.exists:
            last_ts, n_events, n_sessions = state.get
        else:
            last_ts, n_events, n_sessions = None, 0, 0
        for pdf in pdfs:
            # micro-batch order is not guaranteed; the contract orders
            # events like the batch window (ts, event_id)
            pdf = pdf.sort_values(["ts", "event_id"])
            for t in pdf["ts"]:
                ts = t.timestamp()
                if last_ts is None or ts - last_ts > gap_seconds:
                    n_sessions += 1
                n_events += 1
                last_ts = ts
        state.update((last_ts, n_events, n_sessions))
        yield pd.DataFrame([{"user_id": key[0], "n_events": n_events,
                             "n_sessions": n_sessions}])

    return fn


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800,
                      output_mode: str = "update") -> DataFrame:
    """events(user_id, ts, event_id, …) → per-user running
    (n_events, n_sessions), maintained statefully across micro-batches."""
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_fn(gap_seconds), OUTPUT_SCHEMA, STATE_SCHEMA,
                output_mode, GroupStateTimeout.NoTimeout))
