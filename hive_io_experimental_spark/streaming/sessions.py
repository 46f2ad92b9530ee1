"""Custom stateful streaming operator: gap-based sessionization.

applyInPandasWithState keyed by user_id: state = (session_start, last_ts,
n_events); an event more than ``gap_minutes`` after last_ts closes the open
session and starts a new one; the state timeout flushes sessions when a user
goes quiet. This is the canonical "operator Spark lacks as a built-in"
pattern — arbitrary per-key state with timeout semantics.

Batch twin: operators/relational.py:sessionize (same gap rule via window
functions) — used by tests to check stream/batch agreement on closed input.

Scale notes: state is O(active users), partitioned by the grouping key;
timeouts bound it. Arrow batches keep the Python hop amortized.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = "user_id long, session_start long, session_end long, n_events long"
STATE_SCHEMA = "session_start long, last_ts long, n_events long"


def make_sessionizer(gap_minutes: int = 30):
    """Build the applyInPandasWithState function (closure carries the gap)."""
    gap_us = gap_minutes * 60 * 1_000_000

    def sessionize_fn(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
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
            ts_us = (pdf["ts"].astype("int64")).sort_values()
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
            state.setTimeoutDuration(gap_minutes * 60 * 1000)
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


def sessionize_stateful(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming sessionization: events stream -> closed-session rows.

    Input needs columns (user_id, ts); ts is converted to epoch micros
    before grouping so state arithmetic is timezone-free.
    """
    from pyspark.sql import functions as F

    from hive_io_experimental_spark.operators.relational import ensure_event_time

    prepared = ensure_event_time(events).select(
        "user_id", F.unix_micros(F.col("ts")).alias("ts")
    )
    return (
        prepared.groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_minutes),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
