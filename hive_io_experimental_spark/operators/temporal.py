"""Temporal join operators Spark lacks as built-ins: as-of and range joins.

Both are composed from shuffle-aware DataFrame primitives (SURVEY §2.2: the
reference has no joins at all; these are engine extensions a training-data /
event pipeline needs).

  asof_join        last-at-or-before match, one shuffle, no theta join.
  point_in_interval_join
                   points joined to intervals via time-bucket equi-join —
                   the classic way to keep a range predicate out of a
                   nested-loop/broadcast-theta plan at scale.

Scale notes:
  * asof_join is the union+window formulation: tag both sides, sort within
    the key partition by (ts, tag), carry the right side's values forward
    with last(ignorenulls). ONE hash shuffle on the key — same cost as a
    plain join — where the naive formulation (theta join ts_r <= ts_l +
    max-per-group) shuffles twice and explodes intermediate pairs.
  * point_in_interval_join explodes each interval into its covered buckets
    (intervals/bucket_width rows) and equi-joins on (key, bucket); the exact
    range predicate then filters the candidates. Candidate volume scales
    with interval width / bucket width, not with |left| x |right|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_values: tuple[str, ...] = (),
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For every left row, attach the matching right row by time within
    the same ``on`` key — pandas ``merge_asof`` surface, one shuffle.

    ``direction``: 'backward' = greatest ``right_ts <= left_ts``
    (inclusive — DuckDB's ``ASOF LEFT JOIN``); 'forward' = smallest
    ``right_ts >= left_ts``; 'nearest' = whichever of the two is closer
    (ties to backward). ``tolerance_us`` (epoch microseconds) voids any
    match farther than the tolerance — the matched columns come back
    NULL, the left row survives.

    Every direction is the same union+window formulation: ONE hash
    shuffle on the key, with the forward carry just the descending-order
    twin of the backward carry ('nearest' evaluates both orders over the
    single shuffled partition — two in-partition sorts, still one
    exchange). Right rows must be unique per (on, right_ts) —
    pre-aggregate if not, or the carried values are order-dependent.
    Returns all left columns plus ``<right_ts><suffix>`` and
    ``<v><suffix>`` for each requested value.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction: {direction!r}")
    lcols = left.columns
    l = left.withColumn("_tag", F.lit(1))
    r = right.select(
        F.col(on),
        F.col(right_ts).alias(left_ts) if right_ts != left_ts else F.col(right_ts),
        *[F.col(v) for v in right_values],
    ).withColumn("_rts", F.col(left_ts)).withColumn("_tag", F.lit(0))

    unioned = l.unionByName(r, allowMissingColumns=True)
    # rows-frame; right rows sort before left at equal ts (tag 0 < 1) in
    # BOTH orders, so an equal-timestamp right row IS visible (inclusive).
    w_back = (
        Window.partitionBy(on)
        .orderBy(F.col(left_ts).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(on)
        .orderBy(F.col(left_ts).desc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    # gap arithmetic works for TIMESTAMP(_NTZ) and raw epoch-long ts alike
    ts_dtype = dict(left.dtypes).get(left_ts, "")
    _us = (
        F.unix_micros if ts_dtype.startswith("timestamp") else (lambda c: c)
    )

    def _carry(w) -> dict:
        picked = {"_mts": F.last(F.col("_rts"), ignorenulls=True).over(w)}
        for v in right_values:
            picked[v] = F.last(
                F.when(F.col("_tag") == 0, F.col(v)), ignorenulls=True
            ).over(w)
        return picked

    if direction == "backward":
        picks = _carry(w_back)
    elif direction == "forward":
        picks = _carry(w_fwd)
    else:
        back, fwd = _carry(w_back), _carry(w_fwd)
        lus = _us(F.col(left_ts))
        gap_b = lus - _us(back["_mts"])
        gap_f = _us(fwd["_mts"]) - lus
        use_back = back["_mts"].isNotNull() & (
            fwd["_mts"].isNull() | (gap_b <= gap_f)
        )
        picks = {
            k: F.when(use_back, back[k]).otherwise(fwd[k])
            for k in back
        }

    if tolerance_us is not None:
        gap = F.abs(_us(F.col(left_ts)) - _us(picks["_mts"]))
        ok = picks["_mts"].isNotNull() & (gap <= tolerance_us)
        picks = {k: F.when(ok, c) for k, c in picks.items()}

    carried = unioned.withColumn(f"{right_ts}{suffix}", picks["_mts"])
    for v in right_values:
        carried = carried.withColumn(f"{v}{suffix}", picks[v])
    out_cols = lcols + [f"{right_ts}{suffix}"] + [f"{v}{suffix}" for v in right_values]
    return carried.filter(F.col("_tag") == 1).select(*out_cols)


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_micros: int = 86_400_000_000,
) -> DataFrame:
    """Inner-join points to intervals with
    ``start_ts <= point_ts <= end_ts`` (timestamps: epoch-microsecond longs).

    Equi-join on (key, time bucket) generates candidates; the exact range
    predicate filters them. ``bucket_micros`` trades explode factor
    (interval_width / bucket) against candidate precision — default 1 day.
    Output: all interval columns + all point columns (names must not clash).
    """
    # integer `div` (floor), NOT float-divide-then-cast: cast truncates
    # toward zero, so pre-1970 (negative) timestamps would get bucket
    # boundaries that disagree between a point and its covering interval
    # and silently drop matches.
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"{start_ts} div {bucket_micros}"),
                F.expr(f"{end_ts} div {bucket_micros}"),
            )
        ),
    )
    pt = points.withColumn("_bucket", F.expr(f"{point_ts} div {bucket_micros}"))
    joined = iv.join(pt, [on, "_bucket"]).filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    )
    return joined.drop("_bucket")


# ---------------------------------------------------------------------------
# concrete compositions over the events table (oracle-checked)
# ---------------------------------------------------------------------------

def purchase_click_asof(events: DataFrame) -> DataFrame:
    """Per purchase event: the most recent click at-or-before it by the same
    user (backward as-of join). Output (event_id, user_id, purchase_us,
    click_us, gap_us); click_us NULL when the user never clicked before.
    """
    from hive_io_experimental_spark.operators.relational import ensure_event_time

    ev = ensure_event_time(events)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros(F.col("ts")).alias("purchase_us")
    )
    # distinct (user, ts): makes the as-of match deterministic in every
    # engine (ties among right rows would otherwise be arbitrary).
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.unix_micros(F.col("ts")).alias("click_us"))
        .distinct()
    )
    out = asof_join(
        purchases, clicks, on="user_id", left_ts="purchase_us", right_ts="click_us"
    )
    return out.select(
        "event_id",
        "user_id",
        "purchase_us",
        F.col("click_us_asof").alias("click_us"),
        (F.col("purchase_us") - F.col("click_us_asof")).alias("gap_us"),
    )


def signup_next_click_asof(events: DataFrame) -> DataFrame:
    """Per signup event: the FIRST click at-or-after it by the same user
    (forward as-of join — time-to-first-action, the activation metric).
    Output (event_id, user_id, signup_us, click_us, lag_us); click_us NULL
    when the user never clicked afterwards.
    """
    from hive_io_experimental_spark.operators.relational import ensure_event_time

    ev = ensure_event_time(events)
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", F.unix_micros(F.col("ts")).alias("signup_us")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.unix_micros(F.col("ts")).alias("click_us"))
        .distinct()
    )
    out = asof_join(
        signups, clicks, on="user_id", left_ts="signup_us",
        right_ts="click_us", direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        "signup_us",
        F.col("click_us_asof").alias("click_us"),
        (F.col("click_us_asof") - F.col("signup_us")).alias("lag_us"),
    )


def signup_purchase_window(
    events: DataFrame, window_days: int = 7
) -> DataFrame:
    """Per signup event: purchases by the same user within ``window_days``
    after it (range join), aggregated. Inner semantics: signups with no
    in-window purchase don't appear. Output (signup_id, user_id, signup_us,
    n_purchases, sum_value)."""
    from hive_io_experimental_spark.operators.relational import ensure_event_time

    width_us = window_days * 86_400_000_000
    ev = ensure_event_time(events)
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.unix_micros(F.col("ts")).alias("signup_us"),
        (F.unix_micros(F.col("ts")) + F.lit(width_us)).alias("end_us"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros(F.col("ts")).alias("p_us"), "value"
    )
    joined = point_in_interval_join(
        purchases, signups, on="user_id", point_ts="p_us",
        start_ts="signup_us", end_ts="end_us",
    )
    return joined.groupBy("signup_id", "user_id", "signup_us").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(12,4)"))
        .cast("double")
        .alias("sum_value"),
    )


def event_dwell_stats(events: DataFrame) -> DataFrame:
    """Per event type: how long until the same user's NEXT event (dwell).

    lead() over (user, time) — one shuffle on user_id; gaps are exact
    integer microseconds (DECIMAL-accumulated, overflow-free), and each
    type's average publishes as seconds with one double division. A
    user's final event has no successor and contributes nothing.
    Returns (event_type, n_gaps, avg_gap_s, max_gap_s).
    """
    from pyspark.sql import Window as W

    from hive_io_experimental_spark.operators.relational import (
        ensure_event_time,
    )

    ev = ensure_event_time(events)
    us = F.unix_micros(F.col("ts"))
    w = W.partitionBy("user_id").orderBy(us, F.col("event_id"))
    gapped = ev.select(
        "event_type", (F.lead(us).over(w) - us).alias("_gap_us")
    ).filter(F.col("_gap_us").isNotNull())
    return (
        gapped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(
                F.sum(F.col("_gap_us").cast("decimal(20,0)")).cast("double")
                / F.count(F.lit(1))
                / 1_000_000.0,
                6,
            ).alias("avg_gap_s"),
            F.round(F.max("_gap_us") / 1_000_000.0, 6).alias("max_gap_s"),
        )
    )


def gapfill_hourly(events: DataFrame) -> DataFrame:
    """Hourly gap-filled series per event type: every hour between the
    stream's first and last hour appears for every type, with zero-filled
    counts, NULL sums for silent hours, and a LOCF (last-observation-
    carried-forward) column — the time_bucket_gapfill shape timeseries
    stores provide.

    Scale shape: the data-sized work is ONE hourly aggregate (the same
    single shuffle as events_hourly); the grid is generated from a 1-row
    min/max bound and the distinct type list — calendar x types sized, so
    a century of hours x dozens of types is under a million rows no
    matter how many events fed it. The LOCF window runs over that grid,
    not the data. Returns (hour_epoch, event_type, n_events, sum_value,
    sum_value_locf).
    """
    from pyspark.sql import Window as W

    from hive_io_experimental_spark.operators.relational import (
        ensure_event_time,
    )

    ev = ensure_event_time(events)
    hour = F.expr("unix_micros(ts) div 3600000000") * F.lit(3600)
    agg = ev.groupBy(hour.alias("_h"), F.col("event_type").alias("_t")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("value").cast("decimal(12,4)"))
        .cast("double")
        .alias("_s"),
    )
    bounds = agg.agg(
        F.min("_h").alias("_lo"), F.max("_h").alias("_hi")
    )
    types = agg.select(F.col("_t").alias("event_type")).distinct()
    grid = (
        bounds.crossJoin(types)
        .select(
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.lit(3600))
            ).alias("hour_epoch"),
            "event_type",
        )
    )
    joined = grid.join(
        agg,
        (grid["hour_epoch"] == agg["_h"]) & (grid["event_type"] == agg["_t"]),
        "left",
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("hour_epoch")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        joined.select(
            "hour_epoch",
            "event_type",
            F.coalesce(F.col("_n"), F.lit(0)).alias("n_events"),
            F.col("_s").alias("sum_value"),
            F.last("_s", ignorenulls=True).over(w).alias("sum_value_locf"),
        )
    )


def gapfill_interpolate(events: DataFrame) -> DataFrame:
    """Linearly interpolated gap-fill: silent hours get the straight line
    between the nearest known values on each side.

    The interpolation member of the gapfill family (zero-fill and LOCF in
    gapfill_hourly). Edges stay NULL — before the first or after the last
    observation there is nothing to interpolate toward, and inventing a
    value there is a correctness bug, not a feature. The bracketing
    (hour, value) pairs ride two IGNORE-NULLS window passes over the
    calendar-sized grid (never the event data), so the added cost is
    grid-sized regardless of event volume. Interpolated values round to
    6 (the engine's float-output convention); observed hours pass their
    exact aggregate through untouched.
    """
    from pyspark.sql import Window as W

    base = gapfill_hourly(events)
    w_back = (
        W.partitionBy("event_type")
        .orderBy("hour_epoch")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_fwd = (
        W.partitionBy("event_type")
        .orderBy("hour_epoch")
        .rowsBetween(0, W.unboundedFollowing)
    )
    known = F.when(
        F.col("sum_value").isNotNull(),
        F.struct(
            F.col("hour_epoch").alias("h"), F.col("sum_value").alias("v")
        ),
    )
    prev = F.last(known, ignorenulls=True).over(w_back)
    nxt = F.first(known, ignorenulls=True).over(w_fwd)
    interp = F.when(
        F.col("sum_value").isNotNull(), F.col("sum_value")
    ).otherwise(
        F.round(
            prev["v"]
            + (nxt["v"] - prev["v"])
            * (F.col("hour_epoch") - prev["h"])
            / (nxt["h"] - prev["h"]),
            6,
        )
    )
    return base.select(
        "hour_epoch",
        "event_type",
        "n_events",
        "sum_value",
        interp.alias("sum_value_interp"),
    )


def session_intervals(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Per-user session intervals (user_id, session_start_us, session_end_us).

    Same gap rule as relational.sessionize (new session when the in-user
    gap exceeds ``gap_minutes``), but materializing each session's closed
    [start, end] epoch-micros interval instead of per-user counts. Two
    window passes + one aggregate, all partitioned by user_id — ONE
    shuffle on user_id total.
    """
    from hive_io_experimental_spark.operators.relational import (
        ensure_event_time,
    )

    ev = ensure_event_time(events)
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    flagged = ev.select(
        "user_id",
        us.alias("t_us"),
        F.when((us - F.lag(us).over(w)) > gap_us, 1)
        .otherwise(0)
        .alias("new_session"),
        F.col("event_id"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = flagged.select(
        "user_id", "t_us", F.sum("new_session").over(w2).alias("session_no")
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.min("t_us").cast("long").alias("session_start_us"),
        F.max("t_us").cast("long").alias("session_end_us"),
    )


def max_concurrent_sessions(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Peak concurrent sessions per hour — sweep-line over session
    intervals with a two-level prefix sum, NOT a single global window.

    The classic formulation (running SUM over one global ORDER BY) puts
    every boundary row in one window partition — a single-task sort at
    100 TB. Instead the sweep decomposes by hour bucket:

      1. boundary deltas: +1 at session start, -1 at session end
         (closed intervals: starts sort before ends at the same instant,
         so a single-event session still counts as 1).
      2. in-bucket running sum, window partitioned BY HOUR — parallel.
      3. bucket base = running total of per-hour delta sums over the
         tiny (hours × 1) aggregate — the only serial step, sized by
         distinct hours, not by events.
      hour peak = base + max(0, prefix at the hour's best START) —
      the hour opens at `base` concurrency (sessions carried in), only
      a start can raise it, and an end's decrement must not be counted
      before the peak is read (an end-only hour still peaked at `base`
      while its carried-in sessions were open, not at base-1).

    Output: (hour_epoch, max_concurrent) for hours with boundary
    activity, ordered. All-integer arithmetic; within a tie group
    (same instant, same delta sign) the running sum is monotonic, so the
    per-hour MAX is order-independent and deterministic cross-engine.
    """
    sess = session_intervals(events, gap_minutes)
    starts = sess.select(
        F.col("session_start_us").alias("t_us"),
        F.lit(1).alias("delta"),
        "user_id",
    )
    ends = sess.select(
        F.col("session_end_us").alias("t_us"),
        F.lit(-1).alias("delta"),
        "user_id",
    )
    deltas = starts.unionByName(ends).select(
        "t_us",
        "delta",
        "user_id",
        (F.col("t_us") - F.pmod("t_us", F.lit(3_600_000_000)))
        .alias("hour_us"),
    )
    w_in = (
        Window.partitionBy("hour_us")
        .orderBy(F.col("t_us"), F.col("delta").desc(), F.col("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run_in = deltas.select(
        "hour_us", "delta", F.sum("delta").over(w_in).alias("run_in")
    )
    per_hour = deltas.groupBy("hour_us").agg(
        F.sum("delta").alias("hour_tot")
    )
    w_base = Window.orderBy("hour_us").rowsBetween(
        Window.unboundedPreceding, -1
    )
    base = per_hour.select(
        "hour_us",
        F.coalesce(F.sum("hour_tot").over(w_base), F.lit(0)).alias("base"),
    )
    return (
        run_in.join(F.broadcast(base), "hour_us")
        .groupBy("hour_us")
        .agg(
            (
                F.min("base")
                + F.greatest(
                    F.lit(0),
                    F.coalesce(
                        F.max(
                            F.when(F.col("delta") == 1, F.col("run_in"))
                        ),
                        F.lit(0),
                    ),
                )
            ).cast("long").alias("max_concurrent")
        )
        .select(
            (F.col("hour_us") / 1_000_000).cast("long").alias("hour_epoch"),
            "max_concurrent",
        )
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition counts over each user's event
    sequence: (from_type, to_type, n, prob_e6).

    One shuffle on user_id for the lead() window, then a small groupBy.
    prob_e6 = (n * 1_000_000) div row-total of from_type — integer
    division, exact cross-engine (no double ratios in the gate).
    """
    from hive_io_experimental_spark.operators.relational import (
        ensure_event_time,
    )

    ev = ensure_event_time(events)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.expr("n * 1000000 div sum(n) over (partition by from_type)")
        .cast("long")
        .alias("prob_e6"),
    )
