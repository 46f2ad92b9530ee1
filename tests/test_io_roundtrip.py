"""Golden round-trip read/write tests — mirrors the reference's InputTest /
OutputTest patterns (SURVEY §5): create table, write rows, read back, assert
exact values; partitioned + unpartitioned; failure paths.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_io_experimental_spark import (
    Catalog,
    HiveInput,
    HiveOutput,
    HiveTableSchema,
    ScanSpec,
    WriteSpec,
)
from hive_io_experimental_spark.errors import (
    PartitionExistsError,
    PartitionFilterError,
    PartitionSpecError,
    TableNotEmptyError,
    TableNotFoundError,
    TypeMismatchError,
)

F1_SCHEMA = HiveTableSchema((("i1", T.IntegerType()), ("d1", T.DoubleType())))
F2_SCHEMA = HiveTableSchema(
    (("i1", T.IntegerType()), ("d1", T.DoubleType())), ("ds",)
)


def test_unpartitioned_roundtrip(spark, warehouse):
    # F1 fixture: InputTest.java:62-75 / OutputTest.java:59-75
    cat = Catalog(warehouse)
    cat.create_table("default.test1", F1_SCHEMA)
    out = HiveOutput(spark, cat)
    df = spark.createDataFrame([(1, 1.1), (2, 2.2)], "i1 int, d1 double")
    out.write_table(WriteSpec(table="default.test1"), df)
    got = HiveInput(spark, cat).read_table(ScanSpec(table="default.test1"))
    rows = sorted((r.i1, r.d1) for r in got.collect())
    assert rows == [(1, 1.1), (2, 2.2)]


def test_partitioned_roundtrip_with_filter(spark, warehouse):
    # F2 fixture: partition ds='foobar'; filter matches only that partition
    cat = Catalog(warehouse)
    cat.create_table("default.test1", F2_SCHEMA)
    out = HiveOutput(spark, cat)
    df = spark.createDataFrame([(1, 1.1), (2, 2.2)], "i1 int, d1 double")
    out.write_table(
        WriteSpec(table="default.test1", partition_values={"ds": "foobar"}), df
    )
    out.write_table(
        WriteSpec(table="default.test1", partition_values={"ds": "other"}), df
    )
    hi = HiveInput(spark, cat)
    got = hi.read_table(
        ScanSpec(table="default.test1", partition_filter="ds = 'foobar'")
    )
    assert got.count() == 2
    assert set(r.ds for r in got.collect()) == {"foobar"}
    assert hi.read_table(ScanSpec(table="default.test1")).count() == 4


def test_partition_values_are_strings(spark, warehouse):
    # reference invariant: partition values always strings
    # (HiveReadableRecord.java:140-146)
    cat = Catalog(warehouse)
    cat.create_table("default.test1", F2_SCHEMA)
    HiveOutput(spark, cat).write_table(
        WriteSpec(table="default.test1", partition_values={"ds": "2024-01-01"}),
        spark.createDataFrame([(1, 1.1)], "i1 int, d1 double"),
    )
    got = HiveInput(spark, cat).read_table(ScanSpec(table="default.test1"))
    assert dict(got.dtypes)["ds"] == "string"


def test_partition_exists_raises_then_drop_overwrites(spark, warehouse):
    # HiveApiOutputFormat.java:305-323 + OutputConf drop_partition
    cat = Catalog(warehouse)
    cat.create_table("default.test1", F2_SCHEMA)
    out = HiveOutput(spark, cat)
    df1 = spark.createDataFrame([(1, 1.1)], "i1 int, d1 double")
    df2 = spark.createDataFrame([(9, 9.9)], "i1 int, d1 double")
    spec = WriteSpec(table="default.test1", partition_values={"ds": "p"})
    out.write_table(spec, df1)
    with pytest.raises(PartitionExistsError):
        out.write_table(spec, df2)
    out.write_table(
        WriteSpec(table="default.test1", partition_values={"ds": "p"},
                  drop_partition=True),
        df2,
    )
    got = HiveInput(spark, cat).read_table(ScanSpec(table="default.test1"))
    assert [(r.i1, r.d1) for r in got.collect()] == [(9, 9.9)]


def test_missing_table_raises(spark, warehouse):
    # CheckOutputSpecsTest.java:48-67
    cat = Catalog(warehouse)
    with pytest.raises(TableNotFoundError):
        HiveOutput(spark, cat).write_table(
            WriteSpec(table="default.doesnt_exist"),
            spark.createDataFrame([(1, 1.1)], "i1 int, d1 double"),
        )


def test_partition_spec_arity_mismatch_raises(spark, warehouse):
    # HiveApiOutputFormat.java:307-318
    cat = Catalog(warehouse)
    cat.create_table("default.test1", F2_SCHEMA)
    df = spark.createDataFrame([(1, 1.1)], "i1 int, d1 double")
    with pytest.raises(PartitionSpecError):
        HiveOutput(spark, cat).write_table(WriteSpec(table="default.test1"), df)
    with pytest.raises(PartitionSpecError):
        HiveOutput(spark, cat).write_table(
            WriteSpec(table="default.test1",
                      partition_values={"ds": "x", "hr": "1"}),
            df,
        )


def test_unpartitioned_nonempty_raises(spark, warehouse):
    # HiveApiOutputFormat.java:332-342
    cat = Catalog(warehouse)
    cat.create_table("default.test1", F1_SCHEMA)
    out = HiveOutput(spark, cat)
    df = spark.createDataFrame([(1, 1.1)], "i1 int, d1 double")
    out.write_table(WriteSpec(table="default.test1"), df)
    with pytest.raises(TableNotEmptyError):
        out.write_table(WriteSpec(table="default.test1"), df)


def test_widening_write_ok_narrowing_raises(spark, warehouse):
    # TypeUpgradeTest semantics at the DataFrame level
    cat = Catalog(warehouse)
    cat.create_table(
        "default.wide",
        HiveTableSchema((("l1", T.LongType()), ("d1", T.DoubleType()))),
    )
    out = HiveOutput(spark, cat)
    # int -> long, float -> double: widening, accepted
    df = spark.createDataFrame([(1, 1.5)], "l1 int, d1 float")
    out.write_table(WriteSpec(table="default.wide"), df)
    got = HiveInput(spark, cat).read_table(ScanSpec(table="default.wide"))
    assert dict(got.dtypes) == {"l1": "bigint", "d1": "double"}

    cat.create_table(
        "default.narrow", HiveTableSchema((("i1", T.IntegerType()),))
    )
    with pytest.raises(TypeMismatchError):
        out.write_table(
            WriteSpec(table="default.narrow"),
            spark.createDataFrame([(1,)], "i1 long"),
        )


def test_null_roundtrip(spark, warehouse):
    # TypeUpgradeTest NULL round-trip
    cat = Catalog(warehouse)
    cat.create_table("default.nulls", F1_SCHEMA)
    df = spark.createDataFrame([(None, 1.1), (2, None)], "i1 int, d1 double")
    HiveOutput(spark, cat).write_table(WriteSpec(table="default.nulls"), df)
    rows = sorted(
        ((r.i1, r.d1) for r in
         HiveInput(spark, cat).read_table(ScanSpec(table="default.nulls")).collect()),
        key=str,
    )
    assert (None, 1.1) in rows and (2, None) in rows


def test_partition_filter_rejects_data_columns(spark, warehouse):
    # metastore-side restriction parity (HiveApiInputFormat.java:300-303)
    cat = Catalog(warehouse)
    cat.create_table("default.test1", F2_SCHEMA)
    HiveOutput(spark, cat).write_table(
        WriteSpec(table="default.test1", partition_values={"ds": "x"}),
        spark.createDataFrame([(1, 1.1)], "i1 int, d1 double"),
    )
    hi = HiveInput(spark, cat)
    with pytest.raises(PartitionFilterError):
        hi.read_table(ScanSpec(table="default.test1", partition_filter="i1 > 0"))
    with pytest.raises(PartitionFilterError):
        hi.read_table(
            ScanSpec(table="default.test1", partition_filter="not a filter !!!")
        )


def test_scan_missing_column_raises(spark, sf_dir):
    # HiveApiInputFormat.java:264-279 name->id resolution failure
    from hive_io_experimental_spark.errors import HiveIOError

    with pytest.raises(HiveIOError):
        HiveInput(spark).read_table(
            ScanSpec(table=f"{sf_dir}/lineitem.parquet", columns=("nope",))
        )


def test_stats_of(spark, warehouse):
    # HiveUtils.statsOf parity: per-partition stats summed under filter
    cat = Catalog(warehouse)
    cat.create_table("default.test1", F2_SCHEMA)
    out = HiveOutput(spark, cat)
    df = spark.createDataFrame([(1, 1.1), (2, 2.2)], "i1 int, d1 double")
    out.write_table(WriteSpec(table="default.test1", partition_values={"ds": "a"}), df)
    out.write_table(WriteSpec(table="default.test1", partition_values={"ds": "b"}), df)
    hi = HiveInput(spark, cat)
    assert hi.stats_of(ScanSpec(table="default.test1")).num_rows == 4
    assert hi.stats_of(
        ScanSpec(table="default.test1", partition_filter="ds = 'a'")
    ).num_rows == 2


def test_bean_roundtrip(spark, warehouse):
    """S9 parity: record -> dataclass bean by field-name matching
    (BeanInputTest.java:65-111 shape)."""
    from dataclasses import dataclass

    cat = Catalog(warehouse)
    cat.create_table("default.test1", F1_SCHEMA)
    HiveOutput(spark, cat).write_table(
        WriteSpec(table="default.test1"),
        spark.createDataFrame([(7, 7.7), (8, 8.8)], "i1 int, d1 double"),
    )

    @dataclass
    class Bean:
        i1: int
        d1: float

    beans = sorted(
        HiveInput(spark, cat).read_beans(ScanSpec(table="default.test1"), Bean),
        key=lambda b: b.i1,
    )
    assert beans == [Bean(7, 7.7), Bean(8, 8.8)]

    @dataclass
    class WrongBean:
        nope: int

    with pytest.raises(TypeMismatchError):
        list(
            HiveInput(spark, cat).read_beans(
                ScanSpec(table="default.test1"), WrongBean
            )
        )


def test_num_splits_controls_parallelism(spark, sf_dir):
    """S5 parity: num_splits overrides the scan's partitioning."""
    df = HiveInput(spark).read_table(
        ScanSpec(table=f"{sf_dir}/lineitem.parquet", num_splits=7)
    )
    assert df.rdd.getNumPartitions() == 7


def test_csv_null_conventions(spark, tmp_path):
    """S6/S7 parity: tab-separated text with \\N and empty -> NULL
    (BytesParser.java:75-77, 96-148)."""
    from pyspark.sql import types as T

    from hive_io_experimental_spark.sources.formats import read_source

    p = tmp_path / "data.tsv"
    p.write_text("1\thello\t2.5\n2\t\\N\t\\N\n3\t\t9.9\n")
    schema = T.StructType(
        [
            T.StructField("a", T.IntegerType()),
            T.StructField("s", T.StringType()),
            T.StructField("d", T.DoubleType()),
        ]
    )
    rows = sorted(
        read_source(spark, str(p), fmt="csv", schema=schema).collect(),
        key=lambda r: r.a,
    )
    assert (rows[0].a, rows[0].s, rows[0].d) == (1, "hello", 2.5)
    assert (rows[1].s, rows[1].d) == (None, None)   # \N -> NULL
    assert rows[2].s is None                        # zero-length field -> NULL
    assert rows[2].d == 9.9


@pytest.mark.parametrize("fmt", ["orc", "csv", "json"])
def test_storage_format_roundtrip(spark, warehouse, fmt):
    """Per-table storage format honored on BOTH read and write (serde
    parity): write through HiveOutput, read back through HiveInput,
    values + NULLs intact."""
    cat = Catalog(warehouse)
    cat.create_table("default.fmt_t", F2_SCHEMA, storage_format=fmt)
    assert cat.table_format("default.fmt_t") == fmt
    df = spark.createDataFrame(
        [(1, 1.5), (2, None), (3, 3.5)], "i1 int, d1 double"
    )
    HiveOutput(spark, cat).write_table(
        WriteSpec(table="default.fmt_t", partition_values={"ds": "p1"}), df
    )
    got = HiveInput(spark, cat).read_table(
        ScanSpec(table="default.fmt_t", partition_filter="ds = 'p1'")
    )
    rows = sorted((r.i1, r.d1, r.ds) for r in got.collect())
    assert rows == [(1, 1.5, "p1"), (2, None, "p1"), (3, 3.5, "p1")]
    # stats computed through the same format reader
    assert cat.stats_of("default.fmt_t").num_rows == 3


def test_scd1_merge_updates_and_inserts(spark, warehouse):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.input import HiveInput, ScanSpec
    from hive_io_experimental_spark.operators.merge import scd1_merge
    from hive_io_experimental_spark.output import HiveOutput, WriteSpec
    from hive_io_experimental_spark.schema import HiveTableSchema

    cat = Catalog(warehouse)
    cat.create_table(
        "default.kv",
        HiveTableSchema(
            (("k", T.LongType()), ("v", T.StringType())),
            partition_keys=("p",),
        ),
    )
    out = HiveOutput(spark, cat)
    out.write_table(
        WriteSpec("default.kv", {"p": "a"}),
        spark.createDataFrame([(1, "old1"), (2, "old2")], "k long, v string"),
    )
    updates = spark.createDataFrame(
        [(2, "new2", "a"), (3, "new3", "a"), (4, "new4", "b")],
        "k long, v string, p string",
    )
    scd1_merge(spark, cat, "default.kv", updates,
               key_cols=("k",), partition_col="p")

    rows = {
        (r["k"], r["p"]): r["v"]
        for r in HiveInput(spark, cat)
        .read_table(ScanSpec(table="default.kv"))
        .collect()
    }
    # untouched key survives; matched key updated; new keys inserted,
    # including into a brand-new partition
    assert rows == {
        (1, "a"): "old1", (2, "a"): "new2",
        (3, "a"): "new3", (4, "b"): "new4",
    }
    # staging table cleaned up
    assert not cat.table_exists("default.kv_merge_staging")


def test_drop_table_removes_entry_and_data(spark, warehouse):
    import os

    from pyspark.sql import types as T

    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.errors import TableNotFoundError
    from hive_io_experimental_spark.output import HiveOutput, WriteSpec
    from hive_io_experimental_spark.schema import HiveTableSchema

    cat = Catalog(warehouse)
    cat.create_table(
        "default.tmp", HiveTableSchema((("x", T.LongType()),))
    )
    HiveOutput(spark, cat).write_table(
        WriteSpec("default.tmp"),
        spark.createDataFrame([(1,)], "x long"),
    )
    loc = cat.table_location("default.tmp")
    assert os.path.exists(loc)
    cat.drop_table("default.tmp", delete_data=True)
    assert not cat.table_exists("default.tmp")
    assert not os.path.exists(loc)
    try:
        cat.drop_table("default.tmp")
        raise AssertionError("expected TableNotFoundError")
    except TableNotFoundError:
        pass


def test_write_dynamic_registers_all_partitions(spark, warehouse):
    from pyspark.sql import types as T

    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.errors import (
        PartitionExistsError,
        PartitionSpecError,
    )
    from hive_io_experimental_spark.input import HiveInput, ScanSpec
    from hive_io_experimental_spark.output import HiveOutput
    from hive_io_experimental_spark.schema import HiveTableSchema

    cat = Catalog(warehouse)
    cat.create_table(
        "default.dyn",
        HiveTableSchema(
            (("k", T.LongType()),), partition_keys=("p",)
        ),
    )
    out = HiveOutput(spark, cat)
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "k long, p string"
    )
    specs = out.write_dynamic("default.dyn", df)
    assert sorted(s["p"] for s in specs) == ["a", "b"]
    parts = cat.list_partitions("default.dyn")
    assert sorted(p.values["p"] for p in parts) == ["a", "b"]
    assert sum(p.stats.num_rows for p in parts) == 3

    # collision policy: existing partitions raise before any write...
    try:
        out.write_dynamic(
            "default.dyn",
            spark.createDataFrame([(9, "a")], "k long, p string"),
        )
        raise AssertionError("expected PartitionExistsError")
    except PartitionExistsError:
        pass
    # ...and drop_partitions=True replaces only the touched partition
    out.write_dynamic(
        "default.dyn",
        spark.createDataFrame([(9, "a")], "k long, p string"),
        drop_partitions=True,
    )
    rows = {
        (r["k"], r["p"])
        for r in HiveInput(spark, cat)
        .read_table(ScanSpec(table="default.dyn"))
        .collect()
    }
    assert rows == {(9, "a"), (3, "b")}

    # missing partition column in the data is a spec error
    try:
        out.write_dynamic(
            "default.dyn", spark.createDataFrame([(1,)], "k long")
        )
        raise AssertionError("expected PartitionSpecError")
    except PartitionSpecError:
        pass


def test_write_dynamic_rejects_unsafe_partition_values(spark, warehouse):
    from pyspark.sql import types as T

    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.errors import PartitionSpecError
    from hive_io_experimental_spark.output import HiveOutput
    from hive_io_experimental_spark.schema import HiveTableSchema

    cat = Catalog(warehouse)
    cat.create_table(
        "default.unsafe",
        HiveTableSchema((("k", T.LongType()),), partition_keys=("p",)),
    )
    out = HiveOutput(spark, cat)
    for bad in [None, "a/b", "x=y", "50%"]:
        try:
            out.write_dynamic(
                "default.unsafe",
                spark.createDataFrame([(1, bad)], "k long, p string"),
            )
            raise AssertionError(f"expected PartitionSpecError for {bad!r}")
        except PartitionSpecError:
            pass


def test_write_expectations_gate(spark, warehouse):
    """A declared contract aborts the write BEFORE bytes land; a clean
    frame writes through."""
    import pytest
    from pyspark.sql import types as T

    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.errors import ExpectationsFailedError
    from hive_io_experimental_spark.input import HiveInput, ScanSpec
    from hive_io_experimental_spark.output import HiveOutput, WriteSpec
    from hive_io_experimental_spark.schema import HiveTableSchema

    cat = Catalog(warehouse)
    cat.create_table(
        "default.gated",
        HiveTableSchema((("id", T.LongType()), ("v", T.StringType()))),
    )
    out = HiveOutput(spark, cat)
    rules = ({"type": "not_null", "column": "v"},
             {"type": "unique", "column": "id"})

    bad = spark.createDataFrame([(1, "a"), (1, None)], "id long, v string")
    with pytest.raises(ExpectationsFailedError) as exc:
        out.write_table(WriteSpec("default.gated", expectations=rules), bad)
    assert {f["rule"] for f in exc.value.failures} == {"not_null", "unique"}
    # nothing landed: the table directory was never even created
    import os

    assert not os.path.isdir(cat.table_location("default.gated"))

    good = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    out.write_table(WriteSpec("default.gated", expectations=rules), good)
    assert HiveInput(spark, cat).read_table(
        ScanSpec(table="default.gated")).count() == 2


def test_ignore_corrupt_files_skips_truncated_part(spark, warehouse):
    """Reference parity: the simple-API iterator skips a split whose reader
    cannot be created (HiveInput.java:150-199). ScanSpec.ignore_corrupt_files
    maps that to the file-source ignoreCorruptFiles option; the catalog pins
    the schema (like the reference's metastore), so no footer is read at
    plan time and the skip is purely per-task."""
    import glob
    import os

    cat = Catalog(warehouse)
    cat.create_table("default.damaged", F1_SCHEMA)
    out = HiveOutput(spark, cat)
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "i1 int, d1 double"
    ).coalesce(2)
    out.write_table(WriteSpec(table="default.damaged"), df)

    loc = cat.table_location("default.damaged")
    parts = sorted(glob.glob(os.path.join(loc, "**", "*.parquet"),
                             recursive=True))
    assert len(parts) >= 2
    # truncate one part to half its size: unreadable footer; drop the stale
    # Hadoop .crc so the failure is the corruption itself, not the checksum
    with open(parts[0], "r+b") as f:
        f.truncate(os.path.getsize(parts[0]) // 2)
    for crc in glob.glob(os.path.join(os.path.dirname(parts[0]), ".*.crc")):
        os.remove(crc)

    hi = HiveInput(spark, cat)
    with pytest.raises(Exception):
        hi.read_table(ScanSpec(table="default.damaged")).count()
    n = hi.read_table(
        ScanSpec(table="default.damaged", ignore_corrupt_files=True)
    ).count()
    assert 0 < n < 100  # the healthy part survives, the truncated one skips


def test_register_catalog_views_raises_on_shadowed_name(spark, warehouse):
    from hive_io_experimental_spark.errors import HiveIOError
    from hive_io_experimental_spark.input import register_catalog_views

    cat = Catalog(warehouse)
    cat.create_table("db1.dup", F1_SCHEMA)
    cat.create_table("db2.dup", F1_SCHEMA)
    out = HiveOutput(spark, cat)
    df = spark.createDataFrame([(1, 1.1)], "i1 int, d1 double")
    out.write_table(WriteSpec(table="db1.dup"), df)
    out.write_table(WriteSpec(table="db2.dup"), df)
    with pytest.raises(HiveIOError, match="duplicate view name"):
        register_catalog_views(spark, cat)
    # database= disambiguates
    assert register_catalog_views(spark, cat, database="db1") == ["dup"]
