"""Metadata-only schema evolution (catalog.add_column / drop_column).

The contract under test: evolution never rewrites data files. Old files
read NULL for added columns (by-name resolution against the catalog
schema), dropped columns vanish from scans while their bytes stay on disk,
and the strict write-conform layer immediately requires/forbids the
evolved column set.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_io_experimental_spark.catalog import Catalog
from hive_io_experimental_spark.errors import PartitionSpecError
from hive_io_experimental_spark.input import HiveInput, ScanSpec
from hive_io_experimental_spark.output import HiveOutput, WriteSpec
from hive_io_experimental_spark.schema import HiveTableSchema


def _mk(spark, warehouse, partitioned=False):
    cat = Catalog(warehouse)
    cat.create_table(
        "default.ev",
        HiveTableSchema(
            (("id", T.LongType()), ("v", T.DoubleType())),
            partition_keys=("p",) if partitioned else (),
        ),
        versioned=not partitioned,  # versioned gives multi-write history
    )
    return cat


def test_added_column_is_null_for_old_files(spark, warehouse):
    cat = _mk(spark, warehouse)
    out = HiveOutput(spark, cat)
    inp = HiveInput(spark, cat)
    out.append_table(
        WriteSpec("default.ev"),
        spark.createDataFrame([(1, 1.0)], "id long, v double"),
    )
    cat.add_column("default.ev", "tag", T.StringType())
    # new writes must carry the evolved column set...
    with pytest.raises(PartitionSpecError):
        out.append_table(
            WriteSpec("default.ev"),
            spark.createDataFrame([(2, 2.0)], "id long, v double"),
        )
    out.append_table(
        WriteSpec("default.ev"),
        spark.createDataFrame([(2, 2.0, "new")], "id long, v double, tag string"),
    )
    rows = {
        r.id: r.tag
        for r in inp.read_table(ScanSpec(table="default.ev")).collect()
    }
    # ...and the pre-evolution file surfaces NULL, not an error
    assert rows == {1: None, 2: "new"}


def test_dropped_column_disappears_without_rewrite(spark, warehouse):
    cat = _mk(spark, warehouse)
    out = HiveOutput(spark, cat)
    inp = HiveInput(spark, cat)
    out.append_table(
        WriteSpec("default.ev"),
        spark.createDataFrame([(1, 7.0)], "id long, v double"),
    )
    manifest_before = cat.snapshot_manifest("default.ev")
    cat.drop_column("default.ev", "v")
    df = inp.read_table(ScanSpec(table="default.ev"))
    assert df.columns == ["id"]
    assert [r.id for r in df.collect()] == [1]
    # metadata-only: same file set, no rewrite
    assert cat.snapshot_manifest("default.ev") == manifest_before
    # and the write contract now forbids the dropped column
    with pytest.raises(PartitionSpecError):
        out.append_table(
            WriteSpec("default.ev"),
            spark.createDataFrame([(2, 2.0)], "id long, v double"),
        )


def test_evolution_guardrails(spark, warehouse):
    cat = Catalog(warehouse)
    cat.create_table(
        "default.g",
        HiveTableSchema(
            (("id", T.LongType()), ("v", T.DoubleType())),
            partition_keys=("p",),
        ),
        sort_cols=("v",),
    )
    with pytest.raises(ValueError, match="already exists"):
        cat.add_column("default.g", "id", T.LongType())
    with pytest.raises(ValueError, match="already exists"):
        cat.add_column("default.g", "p", T.StringType())
    with pytest.raises(ValueError, match="partition key"):
        cat.drop_column("default.g", "p")
    with pytest.raises(ValueError, match="sort column"):
        cat.drop_column("default.g", "v")
    with pytest.raises(ValueError, match="no such"):
        cat.drop_column("default.g", "nope")
    # a legal drop still works after the rejections above
    cat.drop_column("default.g", "id")
    assert [n for n, _ in cat.get_schema("default.g").data_fields] == ["v"]
    # csv serde is positional: metadata-only drop would misalign old files
    cat.create_table(
        "default.gcsv",
        HiveTableSchema((("a", T.LongType()), ("b", T.LongType()))),
        storage_format="csv",
    )
    with pytest.raises(ValueError, match="positional"):
        cat.drop_column("default.gcsv", "a")


def test_partitioned_add_column_through_dynamic_write(spark, warehouse):
    cat = _mk(spark, warehouse, partitioned=True)
    out = HiveOutput(spark, cat)
    inp = HiveInput(spark, cat)
    out.write_dynamic(
        "default.ev",
        spark.createDataFrame([(1, 1.0, "a")], "id long, v double, p string"),
    )
    cat.add_column("default.ev", "tag", T.StringType())
    out.write_dynamic(
        "default.ev",
        spark.createDataFrame(
            [(2, 2.0, "t2", "b")], "id long, v double, tag string, p string"
        ),
    )
    rows = {
        r.id: (r.tag, r.p)
        for r in inp.read_table(ScanSpec(table="default.ev")).collect()
    }
    assert rows == {1: (None, "a"), 2: ("t2", "b")}
