"""Arbitrary stateful streaming: applyInPandasWithState operators.

The reference has no stateful processing beyond dropDuplicates state
(SURVEY.md §2.12 — "no mapGroupsWithState, no stream-stream joins"). These
are the engine's extension ops for semantics Spark's built-in streaming
aggregates can't express:

* running_counts — per-key cumulative counters held in state, emitted every
  micro-batch (update semantics). Counts are monotone, so
  `max(emitted) == final` regardless of micro-batch boundaries — which is
  what makes q_stream_running_counts fully ORACLE-able.
* sessionize_stateful — event-time gap sessions: state buffers the open
  session per user; a session is emitted when a later event breaks the gap.
  Trailing open sessions flush on the final (empty) micro-batch via
  GroupStateTimeout — convergence with the batch sessionizer is asserted in
  tests/test_streaming_sinks.py.

Scale: state lives in the executor state store partitioned by key — the
shuffle is on `user_id` exactly like the batch twin; Arrow batches keep the
Python boundary amortized.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

RUNNING_COUNT_SCHEMA = StructType(
    [StructField("user_id", LongType()), StructField("n_events", LongType())]
)
_COUNT_STATE_SCHEMA = StructType([StructField("n", LongType())])


def running_counts(stream: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key cumulative event counts (update mode)."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=RUNNING_COUNT_SCHEMA,
        stateStructType=_COUNT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_sec", LongType()),
        StructField("end_sec", LongType()),
        StructField("n_events", LongType()),
    ]
)
_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_sec", LongType()),
        StructField("end_sec", LongType()),
        StructField("n", LongType()),
    ]
)


def sessionize_stateful(
    stream: DataFrame,
    gap_sec: int = 1800,
    key_col: str = "user_id",
    ts_sec_col: str = "ts_sec",
) -> DataFrame:
    """Event-time gap sessionization with explicit state.

    Emits a session row each time a gap closes it; the open session is kept
    in state and flushed when the processing-time timeout fires after the
    source drains. Exactly-once caveat: state updates commit with the batch,
    so replays converge (same contract as the reference's watermark dedup).
    """

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                state.remove()
                yield pd.DataFrame(
                    {"user_id": [key[0]], "start_sec": [s], "end_sec": [e], "n_events": [n]}
                )
            return

        secs: list[int] = []
        for pdf in pdfs:
            secs.extend(int(v) for v in pdf[ts_sec_col])
        secs.sort()
        sessions = []
        start, end, n = state.get if state.exists else (0, 0, 0)
        for t in secs:
            if n == 0:
                start, end, n = t, t, 1
            elif t - end > gap_sec:
                sessions.append((start, end, n))
                start, end, n = t, t, 1
            else:
                end, n = t, n + 1
        state.update((start, end, n))
        state.setTimeoutDuration(2000)
        if sessions:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(sessions),
                    "start_sec": [s for s, _, _ in sessions],
                    "end_sec": [e for _, e, _ in sessions],
                    "n_events": [c for _, _, c in sessions],
                }
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
