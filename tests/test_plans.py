"""Physical-plan shape tests — the scale properties the engine promises.

The reference hand-implements projection pushdown (read-column ids into
RCFile) and partition pruning (metastore filter); our engine delegates both
to Catalyst. These tests assert the delegation actually happens: the parquet
scan reads only projected columns, filters reach PushedFilters, dimension
joins broadcast, and single-pass aggregates produce exactly one shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_io_experimental_spark import HiveInput, ScanSpec
from hive_io_experimental_spark.operators import dedup, relational
from hive_io_experimental_spark.plans.inspect import scan_plan_report


def test_scan_projection_prunes_read_schema(spark, sf_dir):
    df = HiveInput(spark).read_table(
        ScanSpec(
            table=f"{sf_dir}/lineitem.parquet",
            columns=("l_orderkey", "l_quantity"),
        )
    )
    rep = scan_plan_report(df)
    assert sorted(rep["read_columns"]) == ["l_orderkey", "l_quantity"]


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = (
        HiveInput(spark)
        .read_table(ScanSpec(table=f"{sf_dir}/lineitem.parquet"))
        .filter(F.col("l_quantity") >= 45.0)
        .select("l_orderkey")
    )
    rep = scan_plan_report(df)
    assert any("l_quantity" in f for f in rep["pushed_filters"])
    # column pruning composes with the filter: only the 2 needed columns read
    assert sorted(rep["read_columns"]) == ["l_orderkey", "l_quantity"]


def test_dimension_join_broadcasts(spark, sf_dir):
    out = relational.nation_revenue(
        spark.read.parquet(f"{sf_dir}/region.parquet"),
        spark.read.parquet(f"{sf_dir}/nation.parquet"),
        spark.read.parquet(f"{sf_dir}/customer.parquet"),
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
    )
    rep = scan_plan_report(out, execute=True)
    assert rep["num_broadcasts"] >= 2  # nation/region/dim all broadcast
    assert rep["wholestage_codegen"]


def test_single_groupby_single_shuffle(spark, sf_dir):
    df = relational.pricing_summary(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    )
    rep = scan_plan_report(df)
    # one shuffle for the groupBy, one for the final orderBy range partition;
    # no hidden extra exchanges.
    assert rep["num_exchanges"] <= 2


def test_simhash_single_aggregation_shuffle(spark, sf_dir):
    df = dedup.simhash(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    rep = scan_plan_report(df)
    # exactly two exchanges: the spread() round-robin widening (narrow, input
    # rows only) and the single groupBy(id) aggregation shuffle.
    assert rep["num_exchanges"] == 2
    assert sorted(rep["read_columns"]) == ["doc_id", "text"]


def test_exact_dedup_reads_minimal_columns(spark, sf_dir):
    df = dedup.exact_dedup(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    rep = scan_plan_report(df)
    assert sorted(rep["read_columns"]) == ["doc_id", "text"]
    assert rep["num_exchanges"] == 1


def test_partition_filter_prunes_directories(spark, warehouse):
    """The partition_filter must reach the scan as a PartitionFilter
    (directory pruning at plan time — the reference's metastore-side
    get_partitions_by_filter), not as a post-scan row filter."""
    from pyspark.sql import types as T

    from hive_io_experimental_spark import (
        Catalog, HiveInput, HiveOutput, HiveTableSchema, ScanSpec, WriteSpec,
    )
    from hive_io_experimental_spark.plans.inspect import partition_filters

    cat = Catalog(warehouse)
    cat.create_table(
        "default.pt",
        HiveTableSchema((("i1", T.IntegerType()),), ("ds",)),
    )
    out = HiveOutput(spark, cat)
    df = spark.createDataFrame([(1,), (2,)], "i1 int")
    out.write_table(WriteSpec("default.pt", {"ds": "a"}), df)
    out.write_table(WriteSpec("default.pt", {"ds": "b"}), df)

    scan = HiveInput(spark, cat).read_table(
        ScanSpec(table="default.pt", partition_filter="ds = 'a'")
    )
    pf = partition_filters(scan)
    assert any("ds" in f for f in pf), f"no partition pruning in plan: {pf}"
    assert scan.count() == 2
