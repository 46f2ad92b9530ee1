"""Clustered (sort_cols) write layout — catalog.py / output.py.

A table declared with sort_cols must produce data files whose rows are
sorted by those columns WITHIN each file (that is what makes parquet
row-group min/max stats selective); the guarantee must hold through the
plain, dynamic-partition, and versioned write paths, and declaring unknown
columns must fail at create time.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import types as T

from hive_io_experimental_spark.catalog import Catalog
from hive_io_experimental_spark.input import HiveInput, ScanSpec
from hive_io_experimental_spark.output import HiveOutput, WriteSpec
from hive_io_experimental_spark.schema import HiveTableSchema


def _assert_files_sorted(spark, location: str, col: str) -> int:
    files = [
        f
        for f in glob.glob(os.path.join(location, "**", "*.parquet"),
                           recursive=True)
        if not os.path.basename(f).startswith("_")
    ]
    assert files, f"no data files under {location}"
    for f in files:
        vals = [r[0] for r in spark.read.parquet(f).select(col).collect()]
        assert vals == sorted(vals), f"{f} is not sorted by {col}"
    return len(files)


@pytest.fixture()
def shuffled(spark):
    # values deliberately unsorted and spread over several input partitions
    rows = [(i * 7919 % 1000, f"p{i % 3}") for i in range(300)]
    return spark.createDataFrame(rows, "v long, p string").repartition(5)


def test_plain_write_sorts_within_files(spark, warehouse, shuffled):
    cat = Catalog(warehouse)
    cat.create_table(
        "default.sorted",
        HiveTableSchema((("v", T.LongType()),)),
        sort_cols=("v",),
    )
    HiveOutput(spark, cat).write_table(
        WriteSpec("default.sorted"), shuffled.select("v")
    )
    _assert_files_sorted(spark, cat.table_location("default.sorted"), "v")


def test_dynamic_write_sorts_within_partition_files(spark, warehouse, shuffled):
    cat = Catalog(warehouse)
    cat.create_table(
        "default.sorted_part",
        HiveTableSchema((("v", T.LongType()),), partition_keys=("p",)),
        sort_cols=("v",),
    )
    HiveOutput(spark, cat).write_dynamic("default.sorted_part", shuffled)
    _assert_files_sorted(
        spark, cat.table_location("default.sorted_part"), "v"
    )
    # read-back content unaffected by layout
    got = (
        HiveInput(spark, cat)
        .read_table(ScanSpec(table="default.sorted_part"))
        .count()
    )
    assert got == 300


def test_versioned_write_sorts_within_snapshot_files(spark, warehouse, shuffled):
    cat = Catalog(warehouse)
    cat.create_table(
        "default.sorted_v",
        HiveTableSchema((("v", T.LongType()),)),
        versioned=True,
        sort_cols=("v",),
    )
    HiveOutput(spark, cat).write_table(
        WriteSpec("default.sorted_v"), shuffled.select("v")
    )
    manifest = cat.snapshot_manifest("default.sorted_v")
    _assert_files_sorted(spark, manifest[0].location, "v")


def test_sort_cols_must_be_data_columns(warehouse):
    cat = Catalog(warehouse)
    with pytest.raises(ValueError, match="sort_cols"):
        cat.create_table(
            "default.bad",
            HiveTableSchema((("v", T.LongType()),)),
            sort_cols=("nope",),
        )


def test_zorder_layout_tightens_file_stats_on_both_dims(spark, tmp_path):
    """Z-ordered files must have tighter per-file min/max ranges on BOTH
    interleaved columns than arrival-order files — that tightness is
    exactly what parquet row-group/file skipping prunes on at scale."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from hive_io_experimental_spark.functions.layout import zorder_key

    n = 1 << 14
    # two independent uniform dims; arrival order is row id (uncorrelated)
    df = (
        spark.range(n)
        .select(
            (F.xxhash64("id").bitwiseAND(F.lit(1023))).alias("a"),
            (F.xxhash64("id", F.lit(1)).bitwiseAND(F.lit(1023))).alias("b"),
        )
    )

    def file_spans(path, colname):
        import pathlib
        spans = []
        for f in pathlib.Path(path).rglob("*.parquet"):
            md = pq.ParquetFile(str(f)).metadata
            names = [md.row_group(0).column(j).path_in_schema
                     for j in range(md.num_columns)]
            ci = names.index(colname)
            lo = min(md.row_group(i).column(ci).statistics.min
                     for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(ci).statistics.max
                     for i in range(md.num_row_groups))
            spans.append(hi - lo)
        return spans

    plain_dir = str(tmp_path / "plain")
    z_dir = str(tmp_path / "zorder")
    files = 16
    df.repartition(files).write.parquet(plain_dir)
    (
        df.withColumn("_z", zorder_key([F.col("a"), F.col("b")], bits=10))
        .repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.parquet(z_dir)
    )

    for col in ("a", "b"):
        plain_avg = sum(file_spans(plain_dir, col)) / files
        z_avg = sum(file_spans(z_dir, col)) / files
        # arrival-order files each span ~the full 0..1023 domain; z-ordered
        # files must cover a strictly smaller box on EVERY dimension
        assert z_avg < plain_avg * 0.8, (col, z_avg, plain_avg)
