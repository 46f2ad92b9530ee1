"""Custom stateful streaming operator: running per-key z-score anomalies.

applyInPandasWithState keyed by user_id: state = (n, sum_e4, sumsq_e4) of
all PRIOR events' values in exact integer fixed-point (e4) — so the fold
is order-independent across micro-batches and the flagged set is exactly
reproducible. An arriving event is scored against the state (sample
mean/std of prior values) and flagged when |z| > threshold with at least
``min_prior`` observations; then its value joins the state.

Batch twin: operators/profile.py:expanding_zscore — the same exact-integer
prefix sums via window frames (UNBOUNDED PRECEDING .. 1 PRECEDING), used by
tests to check stream/batch agreement on closed input, and oracle-checked
against DuckDB.

Scale notes: state is three integers per active key (bounded by the key
space, not the stream); Python ints never overflow, and the batch twin
accumulates in DECIMAL for the same guarantee. Within a micro-batch events
are processed in (ts, event_id) order, so a closed single-batch run is
bit-deterministic.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ANOMALY_SCHEMA = (
    "event_id long, user_id long, ts_us long, n_prior long, zscore double"
)
_STATE_SCHEMA = "n long, s string, s2 string"  # ints serialized as strings
_E4 = 10_000


def make_running_zscore(z: float = 3.0, min_prior: int = 5):
    """Build the applyInPandasWithState function (closure carries knobs)."""

    def score_fn(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, s_str, s2_str = state.get
            s, s2 = int(s_str), int(s2_str)
        else:
            n, s, s2 = 0, 0, 0

        out: list[tuple[int, int, int, int, float]] = []
        for pdf in batches:
            pdf = pdf.dropna(subset=["value"]).copy()
            pdf["_us"] = pdf["ts"].astype("int64") // 1000
            pdf = pdf.sort_values(["_us", "event_id"])
            for eid, us, val in zip(
                pdf["event_id"], pdf["_us"], pdf["value"]
            ):
                # exact e4 fixed point, bit-identical to the batch twin's
                # decimal(14,4) cast. Spark casts double->decimal through
                # the SHORTEST decimal repr (BigDecimal(Double.toString)),
                # NOT the exact binary expansion — Decimal(repr(x))
                # reproduces that; Decimal(x) directly would diverge on
                # .00005-boundary values (e.g. 63.95545).
                v_e4 = int(
                    Decimal(repr(float(val))).quantize(
                        Decimal("0.0001"), rounding=ROUND_HALF_UP
                    )
                    * _E4
                )
                if n >= min_prior:
                    # float() the exact integer sums FIRST, then the same
                    # double-op sequence as the batch twin — bit-identical
                    s_d, s2_d = float(s), float(s2)
                    mean = s_d / n
                    var = (s2_d - (s_d * s_d) / n) / (n - 1)
                    if var > 0:
                        zs = round((float(v_e4) - mean) / var ** 0.5, 6)
                        if abs(zs) > z:
                            out.append(
                                (int(eid), int(user_id), int(us), n, zs)
                            )
                n, s, s2 = n + 1, s + v_e4, s2 + v_e4 * v_e4

        state.update((n, str(s), str(s2)))
        if out:
            yield pd.DataFrame(
                out,
                columns=["event_id", "user_id", "ts_us", "n_prior", "zscore"],
            )

    return score_fn


def running_zscore_anomalies(
    events: DataFrame, z: float = 3.0, min_prior: int = 5
) -> DataFrame:
    """Wire the stateful scorer over a (streaming) events frame.

    Input needs (event_id, user_id, ts timestamp, value double). No
    timeout: anomaly state is tiny and permanent per key (a production
    deploy would add an event-time TTL like streaming/sessions.py).
    """
    return (
        events.select("event_id", "user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_running_zscore(z=z, min_prior=min_prior),
            outputStructType=ANOMALY_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
