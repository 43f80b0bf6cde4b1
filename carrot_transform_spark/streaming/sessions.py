"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch twin lives in queries/events.ev_sessionize (lag + running sum).
In the unbounded case the session boundary depends on per-user state that
survives micro-batches, which built-in windowed aggregation can't express —
this is the designated escape hatch (arbitrary stateful processing with
event-time timeout for state expiry).

State per user: (session_id, session_start, last_ts, n_events). A session
closes — and is emitted — when a gap > timeout appears in event time or the
state times out via the watermark.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_id", IntegerType()),
        StructField("n_events", IntegerType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("session_id", IntegerType()),
        StructField("session_start", LongType()),  # epoch micros
        StructField("last_ts", LongType()),
        StructField("n_events", IntegerType()),
    ]
)

GAP_SECONDS = 30 * 60


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            sid, start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_id": [sid],
                    "n_events": [n],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                }
            )
        return

    events = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    if state.exists:
        sid, start_us, last_us, n = state.get
    else:
        sid, start_us, last_us, n = 0, None, None, 0

    closed = []
    for ts in events["ts"]:
        ts_us = int(ts.value // 1000)
        if last_us is not None and ts_us - last_us > GAP_SECONDS * 1_000_000:
            closed.append((sid, start_us, last_us, n))
            sid, start_us, n = sid + 1, ts_us, 0
        if start_us is None:
            start_us = ts_us
        last_us = ts_us
        n += 1

    state.update((sid, start_us, last_us, n))
    # expire state 1 gap past the last event (event-time timeout), clamped
    # above the current watermark: when other groups' events have already
    # advanced the watermark past this group's last_ts + gap, an unclamped
    # timestamp is rejected (INVALID_TIMEOUT_TIMESTAMP) — clamping fires the
    # timeout in the next micro-batch, which is exactly the wanted semantics
    desired_ms = last_us // 1000 + GAP_SECONDS * 1000
    wm_ms = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(desired_ms, wm_ms + 1))

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_id": [c[0] for c in closed],
                "n_events": [c[3] for c in closed],
                "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
            }
        )


def sessionize_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Closed sessions per user (open sessions emit on state timeout)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
