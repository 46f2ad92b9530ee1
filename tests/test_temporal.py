"""As-of and range join semantics on hand-built frames (golden tests, the
reference's InputTest style) plus plan-shape checks on the events table."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_io_experimental_spark.operators.temporal import (
    asof_join,
    point_in_interval_join,
    purchase_click_asof,
)
from hive_io_experimental_spark.plans.inspect import scan_plan_report


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 205, "p2"), (2, 50, "p3")],
        "k long, ts long, name string",
    )
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 200, 20.0), (1, 300, 30.0), (3, 10, 99.0)],
        "k long, ts long, v double",
    )
    got = {
        r["name"]: (r["ts_asof"], r["v_asof"])
        for r in asof_join(
            left, right, on="k", right_values=("v",)
        ).collect()
    }
    # p1: right row at EXACTLY ts=100 matches (inclusive)
    assert got["p1"] == (100, 10.0)
    # p2: latest right ts <= 205 is 200
    assert got["p2"] == (200, 20.0)
    # p3: no right rows for k=2 -> nulls (left-join semantics)
    assert got["p3"] == (None, None)


def test_asof_join_distinct_ts_names(spark):
    left = spark.createDataFrame([(1, 500)], "k long, l_ts long")
    right = spark.createDataFrame([(1, 400)], "k long, r_ts long")
    row = asof_join(
        left, right, on="k", left_ts="l_ts", right_ts="r_ts"
    ).collect()[0]
    assert row["r_ts_asof"] == 400


def test_point_in_interval_join_bounds(spark):
    day = 86_400_000_000
    intervals = spark.createDataFrame(
        [(1, 10 * day, 12 * day, "iv1")], "k long, s long, e long, iv string"
    )
    points = spark.createDataFrame(
        [
            (1, 10 * day, "on_start"),
            (1, 12 * day, "on_end"),
            (1, 11 * day + 5, "inside"),
            (1, 12 * day + 1, "after"),
            (1, 10 * day - 1, "before"),
            (2, 11 * day, "wrong_key"),
        ],
        "k long, p long, tag string",
    )
    got = {
        r["tag"]
        for r in point_in_interval_join(
            points, intervals, on="k", point_ts="p", start_ts="s", end_ts="e"
        ).collect()
    }
    assert got == {"on_start", "on_end", "inside"}


def test_asof_single_shuffle(spark, sf_dir):
    df = purchase_click_asof(spark.read.parquet(f"{sf_dir}/events.parquet"))
    rep = scan_plan_report(df)
    # union + window = ONE hash shuffle on user_id (plus the clicks distinct);
    # no theta-join anywhere in the plan.
    assert rep["num_exchanges"] <= 2


def test_gapfill_hourly_fills_and_carries_forward(spark):
    from hive_io_experimental_spark.operators import temporal

    # type 'a' active at hours 0 and 2 (hour 1 silent); type 'b' at hour 1
    df = spark.createDataFrame(
        [
            (1, 1, "a", 0, 10.0),
            (2, 1, "a", 2 * 3_600_000, 30.0),
            (3, 2, "b", 1 * 3_600_000, 5.0),
        ],
        "event_id long, user_id long, event_type string, ms long, value double",
    ).selectExpr("event_id", "user_id", "event_type", "value",
                 "timestamp_millis(ms) AS ts")
    rows = {
        (r["hour_epoch"], r["event_type"]): r
        for r in temporal.gapfill_hourly(df).collect()
    }
    # full grid: 3 hours x 2 types
    assert len(rows) == 6
    # silent hour for 'a': zero count, NULL sum, LOCF carries hour 0's sum
    gap = rows[(3600, "a")]
    assert gap["n_events"] == 0 and gap["sum_value"] is None
    assert gap["sum_value_locf"] == 10.0
    # 'b' before its first observation: LOCF is NULL (nothing to carry)
    assert rows[(0, "b")]["sum_value_locf"] is None
    assert rows[(7200, "b")]["sum_value_locf"] == 5.0


def test_asof_join_forward_nearest_tolerance(spark):
    import pytest

    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 205, "p2"), (1, 320, "p3"), (2, 50, "p4")],
        "k long, ts long, name string",
    )
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 200, 20.0), (1, 300, 30.0)],
        "k long, ts long, v double",
    )

    fwd = {
        r["name"]: (r["ts_asof"], r["v_asof"])
        for r in asof_join(left, right, on="k", right_values=("v",),
                           direction="forward").collect()
    }
    assert fwd["p1"] == (100, 10.0)   # equal ts inclusive
    assert fwd["p2"] == (300, 30.0)   # next at-or-after 205
    assert fwd["p3"] == (None, None)  # nothing after 320
    assert fwd["p4"] == (None, None)  # no key

    near = {
        r["name"]: r["ts_asof"]
        for r in asof_join(left, right, on="k", right_values=("v",),
                           direction="nearest").collect()
    }
    assert near["p1"] == 100
    assert near["p2"] == 200   # gap 5 back vs 95 forward
    assert near["p3"] == 300   # only backward exists
    assert near["p4"] is None

    tol = {
        r["name"]: r["ts_asof"]
        for r in asof_join(left, right, on="k", right_values=("v",),
                           direction="nearest", tolerance_us=10).collect()
    }
    assert tol["p1"] == 100 and tol["p2"] == 200  # gaps 0 and 5 pass
    assert tol["p3"] is None                      # gap 20 > 10 -> voided

    # nearest tie (equidistant) resolves backward
    tie = asof_join(
        spark.createDataFrame([(1, 250, "t")], "k long, ts long, name string"),
        right, on="k", right_values=("v",), direction="nearest",
    ).collect()[0]
    assert tie["ts_asof"] == 200

    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="k", direction="sideways")
