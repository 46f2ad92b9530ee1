"""Profiling operators: exact twin is oracle-checked by the driver; here we
bound the sketch tier's error against the exact tier (the only honest way to
test a sketch — its internals are engine-specific by design)."""

from __future__ import annotations

from hive_io_experimental_spark.operators.profile import approx_profile, column_profile


def test_approx_profile_error_bounds(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = column_profile(events, "value", "user_id").collect()[0]
    approx = approx_profile(events, "value", "user_id", rsd=0.05).collect()[0]

    assert approx.n_rows == exact.n_rows
    # HLL++ at rsd=0.05: allow 3 sigma
    rel_err = abs(approx.approx_distinct_keys - exact.n_distinct_keys) / max(
        exact.n_distinct_keys, 1
    )
    assert rel_err <= 0.15, (approx.approx_distinct_keys, exact.n_distinct_keys)
    # quartiles ordered and median near the exact median
    q25, q50, q75 = approx.approx_quartiles
    assert q25 <= q50 <= q75
    spread_ref = max(exact.max_value - exact.min_value, 1e-9)
    assert abs(q50 - exact.median_value) / spread_ref <= 0.05
    assert approx.min_value == exact.min_value
    assert approx.max_value == exact.max_value


def test_column_profile_null_accounting(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0)], "k long, v double"
    )
    r = column_profile(df, "v", "k").collect()[0]
    assert (r.n_rows, r.n_nonnull, r.n_null, r.n_distinct_keys) == (3, 2, 1, 3)
    assert r.min_value == 1.0 and r.max_value == 3.0
    assert r.median_value == 2.0  # interpolated between 1.0 and 3.0


def test_key_skew_profile_ranks_heavy_hitters(spark):
    from hive_io_experimental_spark.operators.profile import key_skew_profile

    # key "a" holds 6 of 10 rows, "b" 3, "c" 1 -> avg key size 10/3
    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)]
    df = spark.createDataFrame(rows, "k string")
    got = {r["rank"]: r for r in key_skew_profile(df, "k", top_k=2).collect()}
    assert len(got) == 2
    assert got[1]["key"] == "a" and got[1]["n_rows"] == 6
    assert got[1]["share"] == 0.6
    assert got[1]["skew_vs_avg"] == 1.8  # 6 / (10/3)
    assert got[2]["key"] == "b" and got[2]["n_rows"] == 3


def test_robust_outliers_resists_masking(spark):
    """One huge outlier must not mask itself (it would under mean/std)."""
    from hive_io_experimental_spark.operators.profile import (
        numeric_outliers,
        robust_outliers,
    )

    vals = [float(v) for v in (10, 11, 9, 10, 12, 8, 10, 11, 9, 100000)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v double"
    )
    robust = robust_outliers(df, "v", "id").collect()
    assert [r["id"] for r in robust] == [9]  # the 100000 row
    # classic z masks it: std ~ 31k, z of the outlier ~ 2.85 < 3
    assert numeric_outliers(df, "v", "id", z=3.0).count() == 0


def test_histogram_drift_psi_properties(spark):
    from hive_io_experimental_spark.operators import incremental as inc
    from hive_io_experimental_spark.operators import profile as prof
    import datetime as dt

    base = dt.datetime(2024, 1, 1)

    def events(vals, etype):
        return spark.createDataFrame(
            [(i, base, i, etype, float(v)) for i, v in enumerate(vals)],
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double",
        )

    same = events([1.0, 2.0, 3.0] * 10, "a")
    h = inc.hourly_histogram_state(same)
    # identical distributions -> PSI exactly 0 (every contribution is 0)
    row = prof.histogram_drift(h, h).collect()[0]
    assert row.psi == 0.0 and row.n_ref == 30 and row.n_cur == 30
    # disjoint supports -> large positive PSI
    lo = inc.hourly_histogram_state(events([1.0] * 30, "a"))
    hi = inc.hourly_histogram_state(events([9.0] * 30, "a"))
    drifted = prof.histogram_drift(lo, hi).collect()[0]
    assert drifted.psi > 1.0
    # symmetry of PSI under swap (the formula is antisymmetric per term
    # but the sum is invariant: (pc-pr)ln(pc/pr) == (pr-pc)ln(pr/pc))
    swapped = prof.histogram_drift(hi, lo).collect()[0]
    assert abs(drifted.psi - swapped.psi) < 1e-9


def test_series_correlation_perfect_and_anti(spark):
    from hive_io_experimental_spark.operators import profile as prof
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # type 'a' counts 1,2,3 per hour; 'b' = 2x (perfect corr);
    # 'c' = reversed (perfect anticorr)
    for h, (na, nb, nc) in enumerate([(1, 2, 3), (2, 4, 2), (3, 6, 1)]):
        t = base + dt.timedelta(hours=h)
        for etype, n in (("a", na), ("b", nb), ("c", nc)):
            for _ in range(n):
                eid += 1
                rows.append((eid, t, eid, etype, 1.0))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    got = {(r.type_a, r.type_b): r.corr
           for r in prof.series_correlation(df).collect()}
    assert got[("a", "b")] == 1.0
    assert got[("a", "c")] == -1.0
    assert got[("b", "c")] == -1.0


def test_estimate_join_rows_fk_exact_and_guards(spark, warehouse):
    from pyspark.sql import types as T

    from hive_io_experimental_spark.analyze import (
        analyze_table,
        estimate_join_rows,
    )
    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.output import HiveOutput, WriteSpec
    from hive_io_experimental_spark.schema import HiveTableSchema

    cat = Catalog(warehouse)
    out = HiveOutput(spark, cat)
    cat.create_table(
        "default.fact", HiveTableSchema((("k", T.LongType()),))
    )
    out.write_table(
        WriteSpec("default.fact"),
        spark.createDataFrame([(i % 4,) for i in range(40)], "k long"),
    )
    cat.create_table(
        "default.dim", HiveTableSchema((("k", T.LongType()),))
    )
    out.write_table(
        WriteSpec("default.dim"),
        spark.createDataFrame([(i,) for i in range(8)], "k long"),
    )
    analyze_table(spark, cat, "default.fact", ("k",))
    analyze_table(spark, cat, "default.dim", ("k",))
    est = estimate_join_rows(cat, "default.fact", "k", "default.dim", "k")
    # FK shape: dim key unique -> estimate equals the true join size (40)
    assert est == {
        "n_left": 40, "n_right": 8, "ndv_left": 4, "ndv_right": 8,
        "est_rows": 40,
    }
    import pytest

    with pytest.raises(ValueError):
        estimate_join_rows(cat, "default.fact", "nope", "default.dim", "k")
