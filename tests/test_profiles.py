"""Profiles registry tests (multi-table job wiring, README.md:69-78 parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from hive_io_experimental_spark import (
    Catalog,
    HiveTableSchema,
    Profiles,
    ScanSpec,
    WriteSpec,
)
from hive_io_experimental_spark.errors import HiveIOError


def test_multi_table_read_profiles(spark, sf_dir):
    prof = (
        Profiles(spark)
        .add_input(ScanSpec(table=f"{sf_dir}/region.parquet"), "regions")
        .add_input(
            ScanSpec(table=f"{sf_dir}/nation.parquet", columns=("n_name",)),
            "nations",
        )
    )
    dfs = prof.read_all()
    assert set(dfs) == {"regions", "nations"}
    assert dfs["regions"].count() == 5
    assert dfs["nations"].columns == ["n_name"]


def test_profile_json_roundtrip(spark, sf_dir):
    prof = Profiles(spark).add_input(
        ScanSpec(
            table=f"{sf_dir}/lineitem.parquet",
            columns=("l_orderkey", "l_quantity"),
            limit=10,
        ),
        "li",
    )
    restored = Profiles.from_json(spark, prof.to_json())
    df = restored.read("li")
    assert df.columns == ["l_orderkey", "l_quantity"]
    assert df.count() == 10


def test_write_profile_through_catalog(spark, sf_dir, warehouse):
    cat = Catalog(warehouse)
    cat.create_table(
        "default.nations",
        HiveTableSchema(
            (("n_nationkey", T.IntegerType()), ("n_name", T.StringType()),
             ("n_regionkey", T.IntegerType()))
        ),
    )
    prof = (
        Profiles(spark, cat)
        .add_input(ScanSpec(table=f"{sf_dir}/nation.parquet"))
        .add_output(WriteSpec(table="default.nations"))
    )
    prof.write(prof.read())
    assert prof.read(  # re-read through the catalog path
    ) is not None
    got = Profiles(spark, cat).add_input(ScanSpec(table="default.nations")).read()
    assert got.count() == 25


def test_unknown_profile_raises(spark):
    with pytest.raises(HiveIOError):
        Profiles(spark).read("nope")
