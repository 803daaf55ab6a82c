"""Custom stateful streaming operators via applyInPandasWithState.

The built-in windowed aggregations (rollup.py) cover fixed windows;
session windows with arbitrary per-key state need the escape hatch.
streaming_sessionize keeps one open session per key in the state
store and emits a session row when the gap timeout closes it — the
streaming dual of operators.timeseries.sessionize.
"""

from __future__ import annotations

from datetime import timedelta

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

SESSION_SCHEMA = StructType([
    StructField("topic", StringType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("end_us", LongType()),
    StructField("n", LongType()),
])


def _session_update_fn(gap_us: int, gap_ms: int, time_col: str):
    """The per-key state fold behind [[streaming_sessionize]],
    extracted so tests can drive the LITERAL streaming logic over a
    timestamp-ordered static drain (including the timeout path) and
    assert exact equality with the batch sessionizer."""

    def update(key, pdfs, state: GroupState):
        (topic,) = key
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame({
                "topic": [topic],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(end_us, unit="us")],
                "n_events": [n],
            })
            return

        closed = []
        cur = state.get if state.exists else None
        times: list[int] = []
        for pdf in pdfs:
            times.extend(int(t.value // 1000) for t in pd.to_datetime(pdf[time_col]))
        for t_us in sorted(times):
            if cur is None:
                cur = (t_us, t_us, 1)
            elif t_us - cur[1] > gap_us:
                closed.append(cur)
                cur = (t_us, t_us, 1)
            else:
                cur = (cur[0], max(cur[1], t_us), cur[2] + 1)
        if cur is not None:
            state.update(cur)
            state.setTimeoutDuration(gap_ms)
        if closed:
            yield pd.DataFrame({
                "topic": [topic] * len(closed),
                "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                "n_events": [c[2] for c in closed],
            })

    return update


def streaming_sessionize(
    stream: DataFrame,
    gap: timedelta,
    time_col: str = "time",
    key_col: str = "topic",
) -> DataFrame:
    """Emit closed sessions per key: a session closes when no event
    arrives within `gap` (processing-time timeout). State per key is
    one (start, end, count) triple — O(keys) state, not O(events)."""
    gap_us = int(gap.total_seconds() * 1_000_000)
    gap_ms = int(gap.total_seconds() * 1000)
    update = _session_update_fn(gap_us, gap_ms, time_col)

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
