"""Catalog robustness: I/O fault injection through the retry wrapper
(FaultyCheckOutputSpecsTest.java:41-92 shape, but against the real catalog),
concurrent-writer mutual exclusion, and the missing-table error contract.
"""

from __future__ import annotations

import json
import multiprocessing
import os

import pytest

from pyspark.sql import types as T

from hive_io_experimental_spark.catalog import Catalog, HiveStats
from hive_io_experimental_spark.errors import TableNotFoundError
from hive_io_experimental_spark.schema import HiveTableSchema


def _schema() -> HiveTableSchema:
    return HiveTableSchema(
        (("k", T.LongType()), ("v", T.StringType())), partition_keys=("ds",)
    )


class _FaultyIO:
    """Monkeypatch hook: makes the catalog's json.load fail N times."""

    def __init__(self, monkeypatch, n_failures: int):
        self.remaining = n_failures
        real_load = json.load

        def flaky_load(f):
            if self.remaining > 0:
                self.remaining -= 1
                raise OSError("injected transient I/O failure")
            return real_load(f)

        monkeypatch.setattr(
            "hive_io_experimental_spark.catalog.json.load", flaky_load
        )
        # no wall-clock waiting during backoff
        monkeypatch.setattr(
            "hive_io_experimental_spark.retry.time.sleep", lambda s: None
        )


def test_catalog_read_recovers_below_max_tries(tmp_path, monkeypatch):
    cat = Catalog(str(tmp_path), max_tries=5)
    cat.create_table("db.t", _schema())
    _FaultyIO(monkeypatch, 3)
    entry = cat.get_table("db.t")  # 3 failures, 2 spare tries -> recovers
    assert entry["storage_format"] == "parquet"


def test_catalog_read_fails_after_max_tries(tmp_path, monkeypatch):
    cat = Catalog(str(tmp_path), max_tries=3)
    cat.create_table("db.t", _schema())
    _FaultyIO(monkeypatch, 99)
    with pytest.raises(OSError):
        cat.get_table("db.t")


def test_mutators_raise_table_not_found(tmp_path):
    cat = Catalog(str(tmp_path))
    with pytest.raises(TableNotFoundError):
        cat.add_partition("db.missing", {"ds": "2024-01-01"})
    with pytest.raises(TableNotFoundError):
        cat.drop_partition("db.missing", {"ds": "2024-01-01"})


def _register_partitions(args):
    warehouse, worker, n = args
    cat = Catalog(warehouse)
    for i in range(n):
        cat.add_partition(
            "db.t", {"ds": f"w{worker}-{i}"}, stats=HiveStats(num_rows=1)
        )
    return worker


def test_concurrent_writers_lose_no_partitions(tmp_path):
    """Two processes registering disjoint partitions of one table: without
    the flock around load-mutate-save, one writer's registrations vanish."""
    warehouse = str(tmp_path)
    cat = Catalog(warehouse)
    cat.create_table("db.t", _schema())
    n_each = 20
    with multiprocessing.Pool(2) as pool:
        pool.map(
            _register_partitions,
            [(warehouse, 0, n_each), (warehouse, 1, n_each)],
        )
    got = {tuple(p.values.items()) for p in cat.list_partitions("db.t")}
    assert len(got) == 2 * n_each


def test_analyze_table_persists_column_stats(spark, warehouse, sf_dir):
    """ANALYZE computes exact stats in one pass and persists them in the
    catalog; a fresh Catalog instance reads them without touching data."""
    from pyspark.sql import types as T

    from hive_io_experimental_spark.analyze import analyze_table
    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.output import HiveOutput, WriteSpec
    from hive_io_experimental_spark.schema import HiveTableSchema

    cat = Catalog(warehouse)
    cat.create_table(
        "default.an",
        HiveTableSchema((("id", T.LongType()), ("s", T.StringType()))),
    )
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (3, "a")], "id long, s string"
    )
    HiveOutput(spark, cat).write_table(WriteSpec("default.an"), df)

    stats = analyze_table(spark, cat, "default.an")
    assert stats["id"] == {
        "n_nonnull": 4, "n_distinct": 3, "min": "1", "max": "3",
    }
    assert stats["s"]["n_nonnull"] == 3 and stats["s"]["n_distinct"] == 2

    # durable: a brand-new catalog handle sees them, data untouched
    assert Catalog(warehouse).get_column_stats("default.an") == stats
    # never analyzed -> {}
    cat.create_table(
        "default.empty_an", HiveTableSchema((("x", T.LongType()),))
    )
    assert cat.get_column_stats("default.empty_an") == {}


def test_repartition_table_migrates_layout(spark, warehouse):
    """Content survives a partition-layout migration bit-for-bit, and the
    new key actually prunes."""
    from pyspark.sql import types as T

    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.input import HiveInput, ScanSpec
    from hive_io_experimental_spark.operators.maintenance import (
        repartition_table,
    )
    from hive_io_experimental_spark.output import HiveOutput, WriteSpec
    from hive_io_experimental_spark.schema import HiveTableSchema

    cat = Catalog(warehouse)
    cat.create_table(
        "default.byk",
        HiveTableSchema(
            (("id", T.LongType()), ("grp", T.StringType())),
            partition_keys=("k",),
        ),
    )
    out = HiveOutput(spark, cat)
    out.write_table(
        WriteSpec("default.byk", {"k": "a"}),
        spark.createDataFrame([(1, "x"), (2, "y")], "id long, grp string"),
    )
    out.write_table(
        WriteSpec("default.byk", {"k": "b"}),
        spark.createDataFrame([(3, "x")], "id long, grp string"),
    )

    n = repartition_table(
        spark, cat, "default.byk", "default.bygrp", partition_keys=("grp",)
    )
    assert n == 2  # grp in {x, y}

    inp = HiveInput(spark, cat)
    src = {(r["id"], r["k"], r["grp"])
           for r in inp.read_table(ScanSpec(table="default.byk")).collect()}
    dst = {(r["id"], r["k"], r["grp"])
           for r in inp.read_table(ScanSpec(table="default.bygrp")).collect()}
    assert src == dst and len(src) == 3

    # the new key prunes: partition filter on grp is accepted and correct
    only_x = inp.read_table(
        ScanSpec(table="default.bygrp", partition_filter="grp = 'x'")
    )
    assert sorted(r["id"] for r in only_x.collect()) == [1, 3]
    # source untouched
    assert cat.table_exists("default.byk")

    import pytest

    with pytest.raises(ValueError, match="not in table columns"):
        repartition_table(spark, cat, "default.byk", "default.bad",
                          partition_keys=("nope",))


def test_register_catalog_views_sql_over_catalog(spark, warehouse):
    """SQL over catalog tables honors serde and snapshot pinning."""
    from pyspark.sql import types as T

    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.input import register_catalog_views
    from hive_io_experimental_spark.output import HiveOutput, WriteSpec
    from hive_io_experimental_spark.schema import HiveTableSchema

    cat = Catalog(warehouse)
    cat.create_table(
        "default.kv_csv",
        HiveTableSchema((("id", T.LongType()), ("v", T.StringType()))),
        storage_format="csv",
    )
    cat.create_table(
        "default.versioned_t",
        HiveTableSchema((("id", T.LongType()),)),
        versioned=True,
    )
    out = HiveOutput(spark, cat)
    out.write_table(
        WriteSpec("default.kv_csv"),
        spark.createDataFrame([(1, "a"), (2, None)], "id long, v string"),
    )
    out.write_table(WriteSpec("default.versioned_t"),
                    spark.createDataFrame([(1,)], "id long"))
    out.write_table(WriteSpec("default.versioned_t"),
                    spark.createDataFrame([(2,), (3,)], "id long"))

    names = register_catalog_views(spark, cat)
    assert set(names) == {"kv_csv", "versioned_t"}
    # csv serde round-trips NULL (the \N convention) through plain SQL
    rows = spark.sql(
        "SELECT id, v FROM kv_csv ORDER BY id"
    ).collect()
    assert [(r.id, r.v) for r in rows] == [(1, "a"), (2, None)]
    # current version by default...
    assert spark.sql("SELECT COUNT(*) c FROM versioned_t").first().c == 2
    # ...and pinnable to history for time-travel SQL
    register_catalog_views(spark, cat, as_of={"versioned_t": 1})
    assert spark.sql("SELECT COUNT(*) c FROM versioned_t").first().c == 1


def test_catalog_fsck_reports_drift(spark, warehouse):
    """Missing partition dirs and orphan dirs are reported, clean is []."""
    import os
    import shutil

    from pyspark.sql import types as T

    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.operators.maintenance import catalog_fsck
    from hive_io_experimental_spark.output import HiveOutput, WriteSpec
    from hive_io_experimental_spark.schema import HiveTableSchema

    cat = Catalog(warehouse)
    cat.create_table(
        "default.fsck_t",
        HiveTableSchema((("id", T.LongType()),), partition_keys=("p",)),
    )
    out = HiveOutput(spark, cat)
    for pv in ("a", "b"):
        out.write_table(
            WriteSpec("default.fsck_t", {"p": pv}),
            spark.createDataFrame([(1,)], "id long"),
        )

    rep = catalog_fsck(cat)
    assert rep == {"missing_partition_dirs": [],
                   "orphan_partition_dirs": [],
                   "missing_table_dirs": []}

    # delete one registered dir; plant one orphan dir
    loc = cat.table_location("default.fsck_t")
    shutil.rmtree(os.path.join(loc, "p=a"))
    os.makedirs(os.path.join(loc, "p=zzz"))

    rep = catalog_fsck(cat)
    assert rep["missing_partition_dirs"] == [("default.fsck_t", {"p": "a"})]
    assert [(t, os.path.basename(p))
            for t, p in rep["orphan_partition_dirs"]] == [
        ("default.fsck_t", "p=zzz")
    ]


def test_vacuum_orphans_deletes_only_unregistered_dirs(spark, warehouse):
    import os

    from pyspark.sql import types as T

    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.operators.maintenance import (
        vacuum_orphans,
    )
    from hive_io_experimental_spark.output import HiveOutput, WriteSpec
    from hive_io_experimental_spark.schema import HiveTableSchema

    cat = Catalog(warehouse)
    cat.create_table(
        "default.vac",
        HiveTableSchema(
            (("id", T.LongType()),), partition_keys=("p",)
        ),
    )
    HiveOutput(spark, cat).write_table(
        WriteSpec("default.vac", {"p": "keep"}),
        spark.createDataFrame([(1,)], "id long"),
    )
    # plant an orphan partition directory the catalog never registered
    loc = cat.table_location("default.vac")
    orphan = os.path.join(loc, "p=orphan")
    os.makedirs(orphan)
    open(os.path.join(orphan, "junk.parquet"), "w").write("x")

    dry = vacuum_orphans(cat)  # default dry_run: reports, deletes nothing
    assert [p for _, p in dry["orphans"]] == [orphan]
    assert dry["deleted"] == 0 and os.path.isdir(orphan)

    wet = vacuum_orphans(cat, dry_run=False)
    assert wet["deleted"] == 1
    assert not os.path.isdir(orphan)
    # the registered partition survives untouched
    kept = os.path.join(loc, "p=keep")
    assert os.path.isdir(kept) and os.listdir(kept)


def test_unversioned_write_rejects_unsafe_partition_values(spark, warehouse):
    import pytest
    from pyspark.sql import types as T

    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.errors import PartitionSpecError
    from hive_io_experimental_spark.output import HiveOutput, WriteSpec
    from hive_io_experimental_spark.schema import HiveTableSchema

    cat = Catalog(warehouse)
    cat.create_table(
        "default.unsafe",
        HiveTableSchema((("id", T.LongType()),), partition_keys=("ds",)),
    )
    df = spark.createDataFrame([(1,)], "id long")
    out = HiveOutput(spark, cat)
    # a slash would nest directories and corrupt the layout; NULL would
    # write a literal 'ds=None' dir — both must raise on the plain
    # (unversioned) static path, not only on versioned/dynamic writes
    with pytest.raises(PartitionSpecError):
        out.write_table(WriteSpec("default.unsafe", {"ds": "2026/01/01"}), df)
    with pytest.raises(PartitionSpecError):
        out.write_table(WriteSpec("default.unsafe", {"ds": None}), df)


def test_multikey_partition_dirs_follow_schema_order(spark, warehouse):
    import os

    from pyspark.sql import types as T

    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.input import HiveInput, ScanSpec
    from hive_io_experimental_spark.output import HiveOutput, WriteSpec
    from hive_io_experimental_spark.schema import HiveTableSchema

    cat = Catalog(warehouse)
    cat.create_table(
        "default.mk",
        HiveTableSchema(
            (("id", T.LongType()),), partition_keys=("a", "b")
        ),
    )
    out = HiveOutput(spark, cat)
    df = spark.createDataFrame([(1,)], "id long")
    # caller dicts in BOTH insertion orders land in the same a=/b= layout
    out.write_table(WriteSpec("default.mk", {"a": "1", "b": "2"}), df)
    out.write_table(WriteSpec("default.mk", {"b": "3", "a": "4"}), df)
    loc = cat.table_location("default.mk")
    assert os.path.isdir(os.path.join(loc, "a=1", "b=2"))
    assert os.path.isdir(os.path.join(loc, "a=4", "b=3"))
    assert not os.path.isdir(os.path.join(loc, "b=3"))
    got = HiveInput(spark, cat).read_table(ScanSpec(table="default.mk"))
    assert sorted((r.a, r.b) for r in got.collect()) == [("1", "2"), ("4", "3")]


def test_append_table_enforces_expectations(spark, warehouse):
    import pytest
    from pyspark.sql import types as T

    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.errors import ExpectationsFailedError
    from hive_io_experimental_spark.output import HiveOutput, WriteSpec
    from hive_io_experimental_spark.schema import HiveTableSchema

    cat = Catalog(warehouse)
    cat.create_table(
        "default.apx",
        HiveTableSchema((("id", T.LongType()),)),
        versioned=True,
    )
    out = HiveOutput(spark, cat)
    bad = spark.createDataFrame([(1,), (None,)], "id long")
    with pytest.raises(ExpectationsFailedError):
        out.append_table(
            WriteSpec(
                "default.apx",
                expectations=({"column": "id", "type": "not_null"},),
            ),
            bad,
        )
    # nothing committed: table still reads empty at current version
    from hive_io_experimental_spark.input import HiveInput, ScanSpec

    assert HiveInput(spark, cat).read_table(
        ScanSpec(table="default.apx")
    ).count() == 0


def test_versioned_write_retries_over_orphaned_snapshot_dir(spark, warehouse):
    import os

    from pyspark.sql import types as T

    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.input import HiveInput, ScanSpec
    from hive_io_experimental_spark.output import HiveOutput, WriteSpec
    from hive_io_experimental_spark.schema import HiveTableSchema

    cat = Catalog(warehouse)
    cat.create_table(
        "default.retry",
        HiveTableSchema((("id", T.LongType()),)),
        versioned=True,
    )
    # simulate a writer that died between save and commit_snapshot: the
    # next version's snap dir exists with junk, the counter never moved
    loc = cat.table_location("default.retry")
    orphan = os.path.join(loc, "snap-00001")
    os.makedirs(orphan)
    open(os.path.join(orphan, "part-junk.parquet"), "w").write("x")

    out = HiveOutput(spark, cat)
    out.write_table(
        WriteSpec("default.retry"),
        spark.createDataFrame([(7,)], "id long"),
    )  # must NOT fail with 'path already exists'
    got = HiveInput(spark, cat).read_table(ScanSpec(table="default.retry"))
    assert [r.id for r in got.collect()] == [7]


def test_vacuum_orphans_reports_failed_deletes(spark, warehouse, monkeypatch):
    """The reclaim count must reflect what actually disappeared: a delete
    that fails lands in 'failed', never in 'deleted' (ADVICE r5)."""
    import os
    import shutil as _shutil

    from pyspark.sql import types as T

    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.operators.maintenance import (
        vacuum_orphans,
    )
    from hive_io_experimental_spark.schema import HiveTableSchema

    cat = Catalog(warehouse)
    cat.create_table(
        "default.vacfail",
        HiveTableSchema((("id", T.LongType()),), partition_keys=("p",)),
    )
    loc = cat.table_location("default.vacfail")
    orphan = os.path.join(loc, "p=stuck")
    os.makedirs(orphan)
    open(os.path.join(orphan, "junk.parquet"), "w").write("x")

    monkeypatch.setattr(_shutil, "rmtree",
                        lambda *a, **k: None)  # delete silently no-ops
    res = vacuum_orphans(cat, dry_run=False)
    assert res["deleted"] == 0
    assert res["failed"] == [("default.vacfail", orphan)]
    monkeypatch.undo()
    res = vacuum_orphans(cat, dry_run=False)
    assert res["deleted"] == 1 and res["failed"] == []
    assert not os.path.isdir(orphan)
