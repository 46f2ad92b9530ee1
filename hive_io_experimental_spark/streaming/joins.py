"""Stream-stream interval join: the attribution-window join, streaming.

Batch twin: operators/temporal.py:signup_purchase_window (same predicate,
closed input) — which is how tests verify it: run both over the same files
and compare rows.

Scale notes: a stream-stream join keeps BOTH sides in the state store until
the watermark plus the interval bound passes — the time-range condition in
the join predicate is what lets Spark evict (without it, state grows
forever). The join itself shuffles both streams by user_id, exactly like
the batch equi-join; the interval predicate filters within the matched key
group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def signup_purchase_stream_join(
    events: DataFrame,
    window_days: int = 7,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Join each purchase to the signup it falls within ``window_days`` of,
    as both arrive on one event stream.

    Inner stream-stream join: matches emit as soon as both rows have
    arrived; the watermarks + the two-sided time-range predicate bound the
    state the store must retain (purchases older than watermark can never
    match a future signup and vice versa).

    Returns (signup_id, user_id, signup_ts, purchase_ts, value).
    """
    from hive_io_experimental_spark.operators.relational import ensure_event_time

    ev = ensure_event_time(events)
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("signup_ts"),
        )
        .withWatermark("signup_ts", watermark_delay)
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value"),
        )
        .withWatermark("purchase_ts", watermark_delay)
    )
    joined = signups.join(
        purchases,
        F.expr(
            f"""s_user = p_user
                AND purchase_ts >= signup_ts
                AND purchase_ts <= signup_ts + interval {window_days} days"""
        ),
    )
    return joined.select(
        "signup_id",
        F.col("s_user").alias("user_id"),
        "signup_ts",
        "purchase_ts",
        "value",
    )
