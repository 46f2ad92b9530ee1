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
