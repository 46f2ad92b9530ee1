"""Custom stateful streaming operator: gap-based sessionization.

applyInPandasWithState keyed by user_id: state = (session_start, last_ts,
n_events); an event more than ``gap_minutes`` after last_ts closes the open
session and starts a new one; an EVENT-TIME timeout flushes sessions once the
watermark passes last_ts + gap. This is the canonical "operator Spark lacks
as a built-in" pattern — arbitrary per-key state with timeout semantics.

Event-time (not processing-time) timeouts are deliberate: they make the
operator deterministic and replayable (same input -> same output regardless
of wall clock), and they let a finite run (Trigger.AvailableNow) terminate —
a processing-time timer would hold the query open for ``gap`` real minutes.

Batch twin: operators/relational.py:sessionize (same gap rule via window
functions) — used by tests to check stream/batch agreement on closed input.

Scale notes: state is O(active users), partitioned by the grouping key; the
watermark + event-time timeouts bound it. Arrow batches keep the Python hop
amortized.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = "user_id long, session_start long, session_end long, n_events long"
STATE_SCHEMA = "session_start long, last_ts long, n_events long"


def make_sessionizer(gap_minutes: int = 30):
    """Build the applyInPandasWithState function (closure carries the gap).

    Timestamps are handled as epoch MICROseconds (int64) inside state; the
    incoming ``ts`` column is a Spark timestamp, which Arrow hands to pandas
    as datetime64[ns] in the session time zone (the engine pins UTC).
    """
    gap_us = gap_minutes * 60 * 1_000_000
    gap_ms = gap_minutes * 60 * 1000

    def sessionize_fn(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # Watermark passed last_ts + gap: the open session can never be
            # extended by in-watermark data — flush it.
            if state.exists:
                start, last, n = state.get
                state.remove()
                yield pd.DataFrame(
                    {"user_id": [user_id], "session_start": [start],
                     "session_end": [last], "n_events": [n]}
                )
            return

        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0

        closed: list[tuple[int, int, int]] = []
        for pdf in batches:
            ts_us = (pdf["ts"].astype("int64") // 1000).sort_values()
            for t in ts_us:
                t = int(t)
                if last is None:
                    start, last, n = t, t, 1
                elif t - last > gap_us:
                    closed.append((start, last, n))
                    start, last, n = t, t, 1
                else:
                    last, n = t, n + 1

        if start is not None:
            state.update((start, last, n))
            # Event-time timer: fire when the watermark passes session end +
            # gap. Must be strictly beyond the current watermark or Spark
            # rejects it (the session would already be flushable — next tick).
            state.setTimeoutTimestamp(
                max(last // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1)
            )
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return sessionize_fn


def sessionize_stateful(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Streaming sessionization: events stream -> closed-session rows.

    Input needs columns (user_id, ts). A session is emitted either when a
    later event from the same user arrives past the gap, or when the
    watermark (event time minus ``watermark_delay``) passes the session's
    last event + gap. Larger ``watermark_delay`` = more late-data tolerance
    = sessions flushed later and more state retained.
    """
    from hive_io_experimental_spark.operators.relational import ensure_event_time

    prepared = (
        ensure_event_time(events)
        .withWatermark("ts", watermark_delay)
        .select("user_id", "ts")
    )
    return (
        prepared.groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_minutes),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
