"""Catalog swap-in contract kit (r5 verdict task 6).

catalog.py promises "swap for Hive metastore / Glue is one class" — this
kit is the executable form of that promise: the behaviors every catalog
implementation must satisfy, extracted into one test base and run against
TWO implementations (the flock-backed JSON catalog and a dict-backed
in-memory one), plus a deliberately-broken implementation proving the kit
actually catches violations.

The contract mirrors the reference's metastore surface: get_table /
table-missing errors (MetastoreDesc.java:67-78, spec-check contract
output/CheckOutputSpecsTest.java:48-67), partition listing + filter-side
pruning inputs (HiveApiInputFormat.java:290-309), add_partition idempotent
wrt AlreadyExists (HiveApiOutputCommitter.java:125-166), stats summation
(HiveUtils.java:122-140) — plus this engine's snapshot extension
(optimistic begin-commit, manifest immutability, expiry).

No Spark session needed: the contract is pure metadata.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from hive_io_experimental_spark.catalog import Catalog, HiveStats, TableDesc
from hive_io_experimental_spark.errors import (
    SnapshotError,
    TableNotFoundError,
)
from hive_io_experimental_spark.schema import HiveTableSchema


class InMemoryCatalog(Catalog):
    """Second implementation: same logical contract, dict persistence.

    What a Glue/HMS adapter would replace is exactly what this replaces —
    the load/mutate/save transport. No files, no flock; mutation atomicity
    degrades to process-local (documented: single-writer in-memory use).
    """

    def __init__(self, warehouse_dir: str) -> None:
        super().__init__(warehouse_dir)
        self._doc: dict = {"tables": {}}

    def _load(self) -> dict:
        import copy

        return copy.deepcopy(self._doc)

    def _save(self, doc: dict) -> None:
        import copy

        self._doc = copy.deepcopy(doc)

    from contextlib import contextmanager

    @contextmanager
    def _exclusive(self):
        yield


SCHEMA = HiveTableSchema(
    (("id", T.LongType()), ("v", T.DoubleType())), partition_keys=("ds",)
)
FLAT = HiveTableSchema((("id", T.LongType()),))


class CatalogContract:
    """Subclass and override make_catalog to run the kit against an impl."""

    def make_catalog(self, tmp_path) -> Catalog:  # pragma: no cover
        raise NotImplementedError

    # -- tables ------------------------------------------------------------

    def test_create_get_exists_list(self, tmp_path):
        cat = self.make_catalog(tmp_path)
        cat.create_table("db.t1", SCHEMA)
        cat.create_table("db.t2", FLAT)
        cat.create_table("other.t1", FLAT)
        assert cat.table_exists("db.t1")
        assert not cat.table_exists("db.nope")
        assert cat.list_tables() == ["db.t1", "db.t2", "other.t1"]
        assert cat.list_tables("db") == ["db.t1", "db.t2"]
        got = cat.get_schema("db.t1")
        assert got.partition_keys == ("ds",)
        assert [n for n, _ in got.data_fields] == ["id", "v"]

    def test_duplicate_create_raises_unless_if_not_exists(self, tmp_path):
        cat = self.make_catalog(tmp_path)
        cat.create_table("db.t", FLAT)
        with pytest.raises(ValueError, match="already exists"):
            cat.create_table("db.t", FLAT)
        cat.create_table("db.t", FLAT, if_not_exists=True)  # no-op

    def test_missing_table_raises_table_not_found(self, tmp_path):
        cat = self.make_catalog(tmp_path)
        with pytest.raises(TableNotFoundError):
            cat.get_table("db.ghost")
        with pytest.raises(TableNotFoundError):
            cat.add_partition("db.ghost", {"ds": "d1"})

    def test_drop_table_unregisters(self, tmp_path):
        cat = self.make_catalog(tmp_path)
        cat.create_table("db.t", FLAT)
        cat.drop_table("db.t")
        assert not cat.table_exists("db.t")
        with pytest.raises(TableNotFoundError):
            cat.drop_table("db.t")

    # -- partitions ----------------------------------------------------------

    def test_add_partition_idempotent_and_stats_update(self, tmp_path):
        # reference semantics: AlreadyExists tolerated
        # (HiveApiOutputCommitter.java:145-160); a re-add with stats
        # refreshes them
        cat = self.make_catalog(tmp_path)
        cat.create_table("db.t", SCHEMA)
        cat.add_partition("db.t", {"ds": "d1"}, HiveStats(10, 100, 200))
        cat.add_partition("db.t", {"ds": "d1"})  # idempotent, keeps stats
        parts = cat.list_partitions("db.t")
        assert len(parts) == 1 and parts[0].stats.num_rows == 10
        cat.add_partition("db.t", {"ds": "d1"}, HiveStats(99, 1, 2))
        assert cat.list_partitions("db.t")[0].stats.num_rows == 99

    def test_partition_locations_follow_hive_layout(self, tmp_path):
        cat = self.make_catalog(tmp_path)
        cat.create_table("db.t", SCHEMA)
        cat.add_partition("db.t", {"ds": "d1"})
        (p,) = cat.list_partitions("db.t")
        assert p.location == Catalog.partition_path(
            cat.table_location(TableDesc.parse("db.t")), {"ds": "d1"}
        )
        assert p.location.endswith("ds=d1")

    def test_drop_partition_and_exists(self, tmp_path):
        cat = self.make_catalog(tmp_path)
        cat.create_table("db.t", SCHEMA)
        cat.add_partition("db.t", {"ds": "d1"})
        assert cat.partition_exists("db.t", {"ds": "d1"})
        assert cat.drop_partition("db.t", {"ds": "d1"}) is True
        assert not cat.partition_exists("db.t", {"ds": "d1"})
        assert cat.drop_partition("db.t", {"ds": "d1"}) is False

    def test_stats_sum_over_partition_subset(self, tmp_path):
        # HiveUtils.statsOf parity: stats sum over (filtered) partitions
        cat = self.make_catalog(tmp_path)
        cat.create_table("db.t", SCHEMA)
        cat.add_partition("db.t", {"ds": "d1"}, HiveStats(10, 100, 150))
        cat.add_partition("db.t", {"ds": "d2"}, HiveStats(5, 50, 70))
        total = cat.stats_of("db.t")
        assert (total.num_rows, total.raw_size, total.total_size) == (
            15, 150, 220,
        )
        subset = [
            p for p in cat.list_partitions("db.t") if p.values["ds"] == "d2"
        ]
        assert cat.stats_of("db.t", subset).num_rows == 5

    # -- snapshots (begin-commit, optimistic concurrency) ---------------------

    def test_snapshot_begin_commit_and_time_travel_metadata(self, tmp_path):
        cat = self.make_catalog(tmp_path)
        cat.create_table("db.v", FLAT, versioned=True)
        assert cat.current_version("db.v") == 0
        assert cat.snapshot_manifest("db.v") == []
        v = cat.next_version("db.v")
        assert v == 1
        manifest = [{"values": {}, "location": "/x/snap-1-a", "stats": {}}]
        assert cat.commit_snapshot("db.v", v, manifest) == 1
        assert cat.current_version("db.v") == 1
        got = cat.snapshot_manifest("db.v", 1)
        assert [p.location for p in got] == ["/x/snap-1-a"]
        # the live partition list mirrors the committed manifest
        assert [p.location for p in cat.list_partitions("db.v")] == [
            "/x/snap-1-a"
        ]

    def test_stale_commit_rejected(self, tmp_path):
        # optimistic concurrency: the loser's commit must raise, the
        # winner's manifest must remain exactly as committed
        cat = self.make_catalog(tmp_path)
        cat.create_table("db.v", FLAT, versioned=True)
        v = cat.next_version("db.v")  # both writers captured 1
        cat.commit_snapshot(
            "db.v", v, [{"values": {}, "location": "/win", "stats": {}}]
        )
        with pytest.raises(SnapshotError, match="conflict"):
            cat.commit_snapshot(
                "db.v", v, [{"values": {}, "location": "/lose", "stats": {}}]
            )
        assert [p.location for p in cat.snapshot_manifest("db.v", 1)] == [
            "/win"
        ]

    def test_snapshot_ops_on_unversioned_table_raise(self, tmp_path):
        cat = self.make_catalog(tmp_path)
        cat.create_table("db.t", FLAT)
        with pytest.raises(SnapshotError):
            cat.current_version("db.t")
        with pytest.raises(SnapshotError):
            cat.commit_snapshot("db.t", 1, [])

    def test_expired_version_unreadable_retained_intact(self, tmp_path):
        cat = self.make_catalog(tmp_path)
        cat.create_table("db.v", FLAT, versioned=True)
        for i in (1, 2, 3):
            cat.commit_snapshot(
                "db.v", i,
                [{"values": {}, "location": f"/s{i}", "stats": {}}],
            )
        cat.expire_snapshots("db.v", keep_last=2)
        with pytest.raises(SnapshotError):
            cat.snapshot_manifest("db.v", 1)
        assert [p.location for p in cat.snapshot_manifest("db.v", 2)] == [
            "/s2"
        ]
        assert cat.current_version("db.v") == 3


class TestJsonCatalog(CatalogContract):
    def make_catalog(self, tmp_path) -> Catalog:
        return Catalog(str(tmp_path / "wh"))


class TestInMemoryCatalog(CatalogContract):
    def make_catalog(self, tmp_path) -> Catalog:
        return InMemoryCatalog(str(tmp_path / "wh"))


def test_kit_catches_contract_violations(tmp_path):
    """The kit must FAIL a broken implementation — here one that skips the
    optimistic version check (the exact bug class commit_snapshot guards
    against). If this stops failing, the kit has gone soft."""

    class BrokenCatalog(InMemoryCatalog):
        def commit_snapshot(self, desc, version, partitions, note=""):
            doc = self._load()
            entry = doc["tables"][str(TableDesc.parse(desc))]
            entry["snapshots"] = [
                s for s in entry["snapshots"] if s["version"] != version
            ]
            entry["snapshots"].append(
                {"version": version, "committed_at": 0.0, "note": note,
                 "partitions": partitions}
            )
            entry["current_version"] = version
            entry["partitions"] = partitions
            self._save(doc)
            return version

    class Kit(CatalogContract):
        def make_catalog(self, tmp_path):
            return BrokenCatalog(str(tmp_path / "wh"))

    with pytest.raises(pytest.fail.Exception):
        Kit().test_stale_commit_rejected(tmp_path)
