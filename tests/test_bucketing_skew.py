"""Scale-path storage features: bucketed co-located joins and key salting."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_io_experimental_spark.functions.skew import salted_count
from hive_io_experimental_spark.plans.inspect import scan_plan_report
from hive_io_experimental_spark.sources.bucketing import read_bucketed, write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    try:
        write_bucketed(orders, "b_orders", ("o_custkey",), n_buckets=8)
        write_bucketed(customer, "b_customer", ("c_custkey",), n_buckets=8)
        joined = (
            read_bucketed(spark, "b_orders")
            .hint("merge")  # forbid broadcast: prove the BUCKETS align
            .join(
                read_bucketed(spark, "b_customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .select("o_orderkey", "c_name")
        )
        rep = scan_plan_report(joined)
        assert rep["num_exchanges"] == 0, "bucketed join must not shuffle"
        assert rep["num_broadcasts"] == 0
        # sanity: result matches the plain (shuffling) join
        plain = orders.join(
            customer, F.col("o_custkey") == F.col("c_custkey")
        ).count()
        assert joined.count() == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_salted_count_matches_plain(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        r["event_type"]: r["cnt"]
        for r in salted_count(events, "event_type", n_salts=8).collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_salted_join_matches_plain_join(spark):
    """Salted equi-join returns exactly the plain join's multiset, both
    inner and left, including unmatched big-side rows."""
    import pytest

    from hive_io_experimental_spark.functions.skew import salted_join

    big = spark.createDataFrame(
        [(1, i) for i in range(500)]          # hot key 1
        + [(2, i) for i in range(5)] + [(9, 0)],  # 9 has no match
        "k long, payload long",
    )
    small = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "unused")], "k long, name string"
    )

    for how in ("inner", "left"):
        plain = sorted(
            (r["k"], r["payload"], r["name"])
            for r in big.join(small, ["k"], how).collect()
        )
        salted = sorted(
            (r["k"], r["payload"], r["name"])
            for r in salted_join(big, small, ["k"], n_salts=8,
                                 how=how).collect()
        )
        assert salted == plain and len(plain) >= 505

    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, ["k"], how="right")
