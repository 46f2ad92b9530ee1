"""Snapshot diff (CDC) semantics — operators/diff.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_io_experimental_spark.catalog import Catalog
from hive_io_experimental_spark.operators.diff import snapshot_diff
from hive_io_experimental_spark.output import HiveOutput, WriteSpec
from hive_io_experimental_spark.schema import HiveTableSchema


def _mk(spark, warehouse, v1_rows, v2_rows):
    cat = Catalog(warehouse)
    cat.create_table(
        "default.cdc",
        HiveTableSchema((("id", T.LongType()), ("v", T.StringType()))),
        versioned=True,
    )
    out = HiveOutput(spark, cat)
    out.write_table(
        WriteSpec("default.cdc"),
        spark.createDataFrame(v1_rows, "id long, v string"),
    )
    out.write_table(
        WriteSpec("default.cdc"),
        spark.createDataFrame(v2_rows, "id long, v string"),
    )
    return cat


def test_keyed_diff_classifies_all_change_types(spark, warehouse):
    cat = _mk(
        spark, warehouse,
        [(1, "same"), (2, "old"), (3, "gone")],
        [(1, "same"), (2, "new"), (4, "born")],
    )
    got = sorted(
        (r["id"], r["_change_type"], r["v"])
        for r in snapshot_diff(
            spark, cat, "default.cdc", 1, 2, key_cols=("id",)
        ).collect()
    )
    assert got == [
        (2, "update_postimage", "new"),
        (2, "update_preimage", "old"),
        (3, "delete", "gone"),
        (4, "insert", "born"),
    ]


def test_unkeyed_diff_is_multiset(spark, warehouse):
    cat = _mk(
        spark, warehouse,
        [(1, "a"), (1, "a"), (2, "b")],
        [(1, "a"), (2, "b"), (2, "b")],
    )
    got = sorted(
        (r["id"], r["_change_type"])
        for r in snapshot_diff(spark, cat, "default.cdc", 1, 2).collect()
    )
    # one copy of (1,a) removed, one extra (2,b) added — multiset semantics
    assert got == [(1, "delete"), (2, "insert")]


def test_keyed_diff_rejects_unknown_key(spark, warehouse):
    cat = _mk(spark, warehouse, [(1, "a")], [(1, "a")])
    with pytest.raises(ValueError, match="key columns not in table"):
        snapshot_diff(spark, cat, "default.cdc", 1, 2, key_cols=("nope",))


def test_keyed_diff_null_keys_and_values(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table(
        "default.cdc",
        HiveTableSchema((("id", T.LongType()), ("v", T.StringType()))),
        versioned=True,
    )
    out = HiveOutput(spark, cat)
    df1 = spark.createDataFrame([(None, "x"), (1, None)], "id long, v string")
    df2 = spark.createDataFrame([(None, "y"), (1, None)], "id long, v string")
    out.write_table(WriteSpec("default.cdc"), df1)
    out.write_table(WriteSpec("default.cdc"), df2)
    got = sorted(
        (r["id"], r["_change_type"], r["v"])
        for r in snapshot_diff(
            spark, cat, "default.cdc", 1, 2, key_cols=("id",)
        ).collect()
    )
    # null key matches null key (null-safe join); (1,NULL) row unchanged
    assert got == [
        (None, "update_postimage", "y"),
        (None, "update_preimage", "x"),
    ]


def test_cdc_delta_corrects_rollup_exactly(spark):
    """state(v1) ⊕ delta(cdc v1->v2) == state(v2), bit-exact."""
    from hive_io_experimental_spark.operators import incremental

    def ev(rows):
        return spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, "
                  "value double, ms long"
        ).selectExpr("event_id", "user_id", "event_type", "value",
                     "timestamp_millis(ms) AS ts")

    v1 = ev([(1, 1, "click", 1.5, 0), (2, 1, "click", 2.25, 1000),
             (3, 2, "buy", 10.0, 3_600_000)])
    # v2: event 2's value corrected to 9.75, event 3 deleted, event 4 added
    v2 = ev([(1, 1, "click", 1.5, 0), (2, 1, "click", 9.75, 1000),
             (4, 3, "buy", 5.0, 7_200_000)])

    cdc = (
        ev([(2, 1, "click", 2.25, 1000), (3, 2, "buy", 10.0, 3_600_000)])
        .withColumn("_change_type", F.expr(
            "CASE event_id WHEN 2 THEN 'update_preimage' ELSE 'delete' END"))
        .unionByName(
            ev([(2, 1, "click", 9.75, 1000), (4, 3, "buy", 5.0, 7_200_000)])
            .withColumn("_change_type", F.expr(
                "CASE event_id WHEN 2 THEN 'update_postimage' "
                "ELSE 'insert' END")))
    )

    merged = incremental.merge_rollup_states(
        incremental.hourly_rollup_state(v1),
        incremental.rollup_delta_from_cdc(cdc),
    ).filter(F.col("n_events") > 0)
    fresh = incremental.hourly_rollup_state(v2)
    m = {(r["hour_epoch"], r["event_type"]): (r["n_events"], r["sum_value_e4"])
         for r in merged.collect()}
    f = {(r["hour_epoch"], r["event_type"]): (r["n_events"], r["sum_value_e4"])
         for r in fresh.collect()}
    assert m == f and m


def test_stream_snapshots_cdc_rollup_pipeline(spark, warehouse):
    """Four subsystems agree end-to-end: micro-batches appended as
    snapshot versions -> snapshot_diff(v, v+1) recovers each batch as
    inserts -> folding rollup deltas over the diffs equals the one-shot
    rollup of the final table."""
    from pyspark.sql import types as T

    from hive_io_experimental_spark.input import HiveInput, ScanSpec
    from hive_io_experimental_spark.operators import incremental
    from hive_io_experimental_spark.output import HiveOutput  # noqa: F401
    from hive_io_experimental_spark.schema import HiveTableSchema
    from hive_io_experimental_spark.streaming.snapshots import (
        snapshot_batch_sink,
    )

    cat = Catalog(warehouse)
    cat.create_table(
        "default.ev",
        HiveTableSchema((
            ("event_id", T.LongType()), ("user_id", T.LongType()),
            ("event_type", T.StringType()), ("value", T.DoubleType()),
            ("ts", T.TimestampType()),
        )),
        versioned=True,
    )

    def batch(rows):
        return spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, "
                  "value double, ms long"
        ).selectExpr("event_id", "user_id", "event_type", "value",
                     "timestamp_millis(ms) AS ts")

    sink = snapshot_batch_sink(warehouse, "default.ev")
    b1 = [(1, 1, "click", 1.5, 0), (2, 2, "buy", 10.0, 3_600_000)]
    b2 = [(3, 1, "click", 2.5, 1000)]
    sink(batch(b1), 0)
    sink(batch(b2), 1)
    sink(batch(b2), 1)  # replay after recovery: must be idempotent
    assert cat.current_version("default.ev") == 2

    # each version-to-version diff is exactly that batch, as inserts
    d1 = snapshot_diff(spark, cat, "default.ev", 1, 2, key_cols=("event_id",))
    assert sorted((r["event_id"], r["_change_type"]) for r in d1.collect()) \
        == [(3, "insert")]

    # folding CDC deltas over an initial state == one-shot rollup
    state = incremental.hourly_rollup_state(batch(b1))
    folded = incremental.merge_rollup_states(
        state, incremental.rollup_delta_from_cdc(d1)
    )
    final = HiveInput(spark, cat).read_table(ScanSpec(table="default.ev"))
    fresh = incremental.hourly_rollup_state(final)
    f1 = {(r["hour_epoch"], r["event_type"]): (r["n_events"],
                                               r["sum_value_e4"])
          for r in folded.collect()}
    f2 = {(r["hour_epoch"], r["event_type"]): (r["n_events"],
                                               r["sum_value_e4"])
          for r in fresh.collect()}
    assert f1 == f2 and f1
