"""Snapshot / time-travel semantics (catalog.py snapshot section,
output.py versioned writes, input.py as_of_version reads).

The invariants under test are the public Iceberg/Delta contract, scaled to
the JSON catalog: every committed write is an immutable file set; any
retained version reproduces its exact content; the version counter is
advanced by optimistic concurrency; expiry deletes only directories no
retained snapshot references.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_io_experimental_spark.catalog import Catalog
from hive_io_experimental_spark.errors import (
    PartitionExistsError,
    SnapshotError,
)
from hive_io_experimental_spark.input import HiveInput, ScanSpec
from hive_io_experimental_spark.output import HiveOutput, WriteSpec
from hive_io_experimental_spark.schema import HiveTableSchema


def _mk_versioned(warehouse, partitioned: bool) -> Catalog:
    cat = Catalog(warehouse)
    fields = (("id", T.LongType()), ("v", T.DoubleType()))
    cat.create_table(
        "default.tt",
        HiveTableSchema(
            fields, partition_keys=("k",) if partitioned else ()
        ),
        versioned=True,
    )
    return cat


def _rows(spark, data):
    return spark.createDataFrame(data, "id long, v double, k string")


def test_unpartitioned_versions_replace_but_history_remains(spark, warehouse):
    cat = _mk_versioned(warehouse, partitioned=False)
    out = HiveOutput(spark, cat)
    inp = HiveInput(spark, cat)
    out.write_table(WriteSpec("default.tt"),
                    _rows(spark, [(1, 1.0, "a")]).drop("k"))
    out.write_table(WriteSpec("default.tt"),
                    _rows(spark, [(2, 2.0, "a"), (3, 3.0, "a")]).drop("k"))

    assert cat.current_version("default.tt") == 2
    v1 = inp.read_table(ScanSpec(table="default.tt", as_of_version=1))
    v2 = inp.read_table(ScanSpec(table="default.tt"))
    assert [r.id for r in v1.collect()] == [1]
    assert sorted(r.id for r in v2.collect()) == [2, 3]


def test_partitioned_time_travel_and_overwrite_policy(spark, warehouse):
    cat = _mk_versioned(warehouse, partitioned=True)
    out = HiveOutput(spark, cat)
    inp = HiveInput(spark, cat)
    # v1: both partitions in ONE dynamic job
    out.write_dynamic(
        "default.tt", _rows(spark, [(1, 1.0, "a"), (2, 2.0, "b")])
    )
    # overwriting partition a without the drop flag is still a policy error
    with pytest.raises(PartitionExistsError):
        out.write_table(
            WriteSpec("default.tt", {"k": "a"}),
            _rows(spark, [(9, 9.0, "a")]).drop("k"),
        )
    # v2: supersede partition a only
    out.write_table(
        WriteSpec("default.tt", {"k": "a"}, drop_partition=True),
        _rows(spark, [(9, 9.0, "a")]).drop("k"),
    )

    v1 = inp.read_table(ScanSpec(table="default.tt", as_of_version=1))
    v2 = inp.read_table(ScanSpec(table="default.tt", as_of_version=2))
    assert sorted((r.id, r.k) for r in v1.collect()) == [(1, "a"), (2, "b")]
    # partition b's files are SHARED between v1 and v2 (manifest reuse)
    assert sorted((r.id, r.k) for r in v2.collect()) == [(2, "b"), (9, "a")]
    # partition columns come back as strings via basePath discovery
    assert dict(v2.dtypes)["k"] == "string"


def test_partition_filter_prunes_snapshot_scan(spark, warehouse):
    cat = _mk_versioned(warehouse, partitioned=True)
    out = HiveOutput(spark, cat)
    out.write_dynamic(
        "default.tt", _rows(spark, [(1, 1.0, "a"), (2, 2.0, "b")])
    )
    got = (
        HiveInput(spark, cat)
        .read_table(ScanSpec(table="default.tt", partition_filter="k = 'b'"))
        .collect()
    )
    assert [(r.id, r.k) for r in got] == [(2, "b")]


def test_snapshot_conflict_and_unversioned_misuse(spark, warehouse):
    cat = _mk_versioned(warehouse, partitioned=False)
    out = HiveOutput(spark, cat)
    out.write_table(WriteSpec("default.tt"),
                    _rows(spark, [(1, 1.0, "a")]).drop("k"))
    # optimistic concurrency: a stale reserved version must not commit
    with pytest.raises(SnapshotError):
        cat.commit_snapshot("default.tt", 1, [])
    # as-of on an unversioned table is an error, not a silent full read
    cat.create_table(
        "default.plain", HiveTableSchema((("id", T.LongType()),))
    )
    with pytest.raises(SnapshotError):
        HiveInput(spark, cat).read_table(
            ScanSpec(table="default.plain", as_of_version=1)
        )
    with pytest.raises(SnapshotError):
        cat.snapshot_manifest("default.plain")


def test_expire_keeps_shared_files_and_drops_orphans(spark, warehouse):
    cat = _mk_versioned(warehouse, partitioned=True)
    out = HiveOutput(spark, cat)
    inp = HiveInput(spark, cat)
    out.write_dynamic(
        "default.tt", _rows(spark, [(1, 1.0, "a"), (2, 2.0, "b")])
    )
    out.write_table(  # v2 rewrites a; b still points at its v1 dir
        WriteSpec("default.tt", {"k": "a"}, drop_partition=True),
        _rows(spark, [(9, 9.0, "a")]).drop("k"),
    )
    v1_a_dir = [
        p.location
        for p in cat.snapshot_manifest("default.tt", 1)
        if p.values == {"k": "a"}
    ][0]
    deleted = cat.expire_snapshots("default.tt", keep_last=1)
    # only v1's superseded partition-a dir goes; shared b dir survives
    assert deleted == [v1_a_dir]
    assert not os.path.exists(v1_a_dir)
    with pytest.raises(SnapshotError):
        inp.read_table(ScanSpec(table="default.tt", as_of_version=1)).collect()
    assert sorted(
        (r.id, r.k)
        for r in inp.read_table(ScanSpec(table="default.tt")).collect()
    ) == [(2, "b"), (9, "a")]


def test_concurrent_commits_exactly_one_wins(spark, warehouse):
    """Optimistic concurrency under real thread interleaving: N writers
    reserve the same next_version and race commit_snapshot — exactly one
    must win per round, and the loser's SnapshotError must be the typed
    conflict (safe to retry), never a silent double-commit."""
    import threading

    cat = _mk_versioned(warehouse, partitioned=False)
    results: list[str] = []
    lock = threading.Lock()

    def attempt(i: int) -> None:
        v = cat.next_version("default.tt")
        try:
            cat.commit_snapshot(
                "default.tt", v,
                [{"values": {}, "location": f"/tmp/none-{i}", "stats": {}}],
                note=f"writer-{i}",
            )
            with lock:
                results.append("win")
        except SnapshotError:
            with lock:
                results.append("lose")

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # every attempt resolved, at least one won, and the version counter
    # advanced exactly by the number of winners (no lost or double commits)
    assert len(results) == 8 and "win" in results
    assert cat.current_version("default.tt") == results.count("win")


def test_versioned_read_before_first_commit_is_empty(spark, warehouse):
    cat = _mk_versioned(warehouse, partitioned=True)
    df = HiveInput(spark, cat).read_table(ScanSpec(table="default.tt"))
    assert df.count() == 0
    assert set(df.columns) == {"id", "v", "k"}


def test_as_of_timestamp_resolves_to_latest_earlier_commit(spark, warehouse):
    cat = _mk_versioned(warehouse, partitioned=False)
    out = HiveOutput(spark, cat)
    inp = HiveInput(spark, cat)
    out.write_table(WriteSpec("default.tt"),
                    _rows(spark, [(1, 1.0, "a")]).drop("k"))
    t1 = cat.list_snapshots("default.tt")[0]["committed_at"]
    out.write_table(WriteSpec("default.tt"),
                    _rows(spark, [(2, 2.0, "a")]).drop("k"))

    assert cat.version_at("default.tt", t1) == 1
    assert cat.version_at("default.tt", t1 - 10) == 0
    assert cat.version_at("default.tt", t1 + 1e9) == 2
    got = inp.read_table(
        ScanSpec(table="default.tt", as_of_timestamp=t1)
    ).collect()
    assert [r.id for r in got] == [1]
    # pre-first-commit instant reads as the empty view
    empty = inp.read_table(
        ScanSpec(table="default.tt", as_of_timestamp=t1 - 10)
    )
    assert empty.count() == 0
    # both time-travel selectors at once is a usage error
    import pytest as _pytest

    with _pytest.raises(SnapshotError):
        inp.read_table(
            ScanSpec(table="default.tt", as_of_version=1, as_of_timestamp=t1)
        )


def test_snapshots_cli_lists_history(spark, warehouse, capsys):
    from hive_io_experimental_spark.cli import main as cli_main

    cat = _mk_versioned(warehouse, partitioned=False)
    out = HiveOutput(spark, cat)
    out.write_table(WriteSpec("default.tt"),
                    _rows(spark, [(1, 1.0, "a")]).drop("k"))
    out.write_table(WriteSpec("default.tt"),
                    _rows(spark, [(2, 2.0, "a")]).drop("k"))
    rc = cli_main(
        ["snapshots", "--table", "default.tt", "--warehouse", warehouse],
        stop_session=False,
    )
    assert rc == 0
    lines = capsys.readouterr().out.splitlines()
    assert len(lines) == 2
    assert lines[0].startswith(" v1\t") and lines[1].startswith("*v2\t")


def test_append_table_accumulates_versions(spark, warehouse):
    cat = _mk_versioned(warehouse, partitioned=False)
    out = HiveOutput(spark, cat)
    inp = HiveInput(spark, cat)
    out.append_table(WriteSpec("default.tt"),
                     _rows(spark, [(1, 1.0, "a")]).drop("k"))
    out.append_table(WriteSpec("default.tt"),
                     _rows(spark, [(2, 2.0, "a")]).drop("k"))
    assert sorted(
        r.id for r in inp.read_table(ScanSpec(table="default.tt")).collect()
    ) == [1, 2]
    assert [
        r.id
        for r in inp.read_table(
            ScanSpec(table="default.tt", as_of_version=1)
        ).collect()
    ] == [1]
    # append on a partitioned or unversioned table is a usage error
    from hive_io_experimental_spark.errors import PartitionSpecError

    cat.create_table(
        "default.plain2", HiveTableSchema((("id", T.LongType()),))
    )
    with pytest.raises(SnapshotError):
        out.append_table(WriteSpec("default.plain2"),
                         spark.createDataFrame([(1,)], "id long"))
    cat2 = _mk_versioned(warehouse + "/p", partitioned=True)
    with pytest.raises(PartitionSpecError):
        HiveOutput(spark, cat2).append_table(
            WriteSpec("default.tt"), _rows(spark, [(1, 1.0, "a")])
        )


def test_stream_batches_become_snapshots_idempotently(spark, warehouse, tmp_path):
    from hive_io_experimental_spark.streaming.snapshots import (
        append_snapshots_stream,
        snapshot_batch_sink,
    )

    cat = _mk_versioned(warehouse, partitioned=False)
    inp = HiveInput(spark, cat)
    src = str(tmp_path / "src")
    base = _rows(spark, [(1, 1.0, "a"), (2, 2.0, "a")]).drop("k")
    base.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("id long, v double").parquet(src)
    q = append_snapshots_stream(
        stream, warehouse, "default.tt", str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)
    v_after_stream = cat.current_version("default.tt")
    assert v_after_stream >= 1
    assert sorted(
        r.id for r in inp.read_table(ScanSpec(table="default.tt")).collect()
    ) == [1, 2]
    # replaying an already-committed batch_id must be a no-op...
    sink = snapshot_batch_sink(warehouse, "default.tt")
    sink(base, 0)
    assert cat.current_version("default.tt") == v_after_stream
    # ...while a NEW batch_id appends one more version
    sink(_rows(spark, [(3, 3.0, "a")]).drop("k"), 999)
    assert cat.current_version("default.tt") == v_after_stream + 1
    assert sorted(
        r.id for r in inp.read_table(ScanSpec(table="default.tt")).collect()
    ) == [1, 2, 3]


def test_compaction_consolidates_files_and_keeps_history(spark, warehouse):
    import glob
    import os as _os

    from hive_io_experimental_spark.operators.maintenance import (
        compact_snapshots,
    )

    cat = _mk_versioned(warehouse, partitioned=False)
    out = HiveOutput(spark, cat)
    inp = HiveInput(spark, cat)
    for i in range(1, 4):  # three appends -> three small file sets
        out.append_table(
            WriteSpec("default.tt"),
            _rows(spark, [(i, float(i), "a")]).drop("k"),
        )
    assert len(cat.snapshot_manifest("default.tt")) == 3

    v = compact_snapshots(spark, cat, "default.tt")
    assert v == 4
    manifest = cat.snapshot_manifest("default.tt")
    assert len(manifest) == 1  # one consolidated location
    files = [
        f
        for f in glob.glob(
            _os.path.join(manifest[0].location, "*.parquet")
        )
        if not _os.path.basename(f).startswith("_")
    ]
    assert len(files) == 1  # coalesced to one file
    assert sorted(
        r.id for r in inp.read_table(ScanSpec(table="default.tt")).collect()
    ) == [1, 2, 3]
    # pre-compaction history still readable...
    assert sorted(
        r.id
        for r in inp.read_table(
            ScanSpec(table="default.tt", as_of_version=3)
        ).collect()
    ) == [1, 2, 3]
    # ...until expiry reclaims the superseded small files
    deleted = cat.expire_snapshots("default.tt", keep_last=1)
    assert len(deleted) == 3
    assert sorted(
        r.id for r in inp.read_table(ScanSpec(table="default.tt")).collect()
    ) == [1, 2, 3]


def test_compaction_partitioned_one_file_per_partition(spark, warehouse):
    import glob
    import os as _os

    from hive_io_experimental_spark.operators.maintenance import (
        compact_snapshots,
    )

    cat = _mk_versioned(warehouse, partitioned=True)
    out = HiveOutput(spark, cat)
    inp = HiveInput(spark, cat)
    out.write_dynamic(
        "default.tt",
        _rows(spark, [(1, 1.0, "a"), (2, 2.0, "b")]).repartition(4),
    )
    out.write_table(  # second version fragments partition a further
        WriteSpec("default.tt", {"k": "a"}, drop_partition=True),
        _rows(spark, [(1, 1.0, "a"), (3, 3.0, "a")]).drop("k").repartition(3),
    )
    compact_snapshots(spark, cat, "default.tt")
    for p in cat.snapshot_manifest("default.tt"):
        files = [
            f
            for f in glob.glob(_os.path.join(p.location, "*.parquet"))
            if not _os.path.basename(f).startswith("_")
        ]
        assert len(files) == 1, (p.values, files)
    assert sorted(
        (r.id, r.k)
        for r in inp.read_table(ScanSpec(table="default.tt")).collect()
    ) == [(1, "a"), (2, "b"), (3, "a")]


def test_stats_follow_current_snapshot(spark, warehouse):
    cat = _mk_versioned(warehouse, partitioned=True)
    out = HiveOutput(spark, cat)
    out.write_dynamic(
        "default.tt", _rows(spark, [(1, 1.0, "a"), (2, 2.0, "a"), (3, 3.0, "b")])
    )
    out.write_table(
        WriteSpec("default.tt", {"k": "a"}, drop_partition=True),
        _rows(spark, [(9, 9.0, "a")]).drop("k"),
    )
    stats = HiveInput(spark, cat).stats_of(
        ScanSpec(table="default.tt", partition_filter="k = 'a'")
    )
    assert stats.num_rows == 1


def test_lost_writer_cannot_clobber_committed_snapshot(
    spark, warehouse, monkeypatch
):
    """The optimistic-concurrency hazard (ADVICE r5): a slow writer that
    computed next_version N BEFORE a peer committed N must lose cleanly —
    its files become unreferenced orphans and the committed snapshot's
    data is never touched. (The old deterministic snap-dir naming +
    pre-write rmtree deleted the winner's committed files.)"""
    cat = _mk_versioned(warehouse, partitioned=False)
    out = HiveOutput(spark, cat)
    inp = HiveInput(spark, cat)
    # peer B commits v1
    out.write_table(
        WriteSpec("default.tt"), _rows(spark, [(1, 1.0, "a")]).drop("k")
    )
    # writer A captured version 1 before B committed: force the stale
    # number through the public write path
    monkeypatch.setattr(Catalog, "next_version", lambda self, d: 1)
    with pytest.raises(SnapshotError, match="conflict"):
        out.write_table(
            WriteSpec("default.tt"), _rows(spark, [(9, 9.0, "a")]).drop("k")
        )
    monkeypatch.undo()
    # B's committed snapshot is fully intact
    assert [r.id for r in inp.read_table(
        ScanSpec(table="default.tt", as_of_version=1)
    ).collect()] == [1]


def test_expire_clean_orphans_reclaims_lost_attempt_dirs(
    spark, warehouse, monkeypatch
):
    """expire_snapshots(clean_orphans=True) reclaims the unique attempt
    dirs of lost/crashed writers — and never a retained snapshot's."""
    cat = _mk_versioned(warehouse, partitioned=False)
    out = HiveOutput(spark, cat)
    inp = HiveInput(spark, cat)
    out.write_table(
        WriteSpec("default.tt"), _rows(spark, [(1, 1.0, "a")]).drop("k")
    )
    monkeypatch.setattr(Catalog, "next_version", lambda self, d: 1)
    with pytest.raises(SnapshotError):
        out.write_table(
            WriteSpec("default.tt"), _rows(spark, [(9, 9.0, "a")]).drop("k")
        )
    monkeypatch.undo()
    loc = cat.table_location("default.tt")
    snap_dirs = [d for d in os.listdir(loc) if d.startswith("snap-")]
    assert len(snap_dirs) == 2  # winner + loser orphan
    # the seconds-old orphan is protected by the in-flight min-age guard…
    assert cat.expire_snapshots("default.tt", keep_last=1,
                                clean_orphans=True) == []
    # …and reclaimed once past the age threshold (0 = maintenance window)
    deleted = cat.expire_snapshots("default.tt", keep_last=1,
                                   clean_orphans=True, orphan_min_age_s=0)
    assert len(deleted) == 1
    assert [r.id for r in inp.read_table(
        ScanSpec(table="default.tt")
    ).collect()] == [1]
    remaining = [d for d in os.listdir(loc) if d.startswith("snap-")]
    assert len(remaining) == 1


def test_rollback_to_version_restores_content_appendonly(spark, warehouse):
    """rollback_to_version: Iceberg semantics — a NEW version whose
    manifest re-references the target's files; rolled-past versions stay
    time-travel readable; rollback to 0 empties the current view; bad
    versions raise; expire after rollback keeps the current view alive."""
    cat = _mk_versioned(warehouse, partitioned=False)
    out = HiveOutput(spark, cat)
    inp = HiveInput(spark, cat)
    out.write_table(WriteSpec("default.tt"),
                    _rows(spark, [(1, 1.0, "a")]).drop("k"))
    out.write_table(WriteSpec("default.tt"),
                    _rows(spark, [(2, 2.0, "a")]).drop("k"))
    assert cat.current_version("default.tt") == 2

    new_v = cat.rollback_to_version("default.tt", 1)
    assert new_v == 3 and cat.current_version("default.tt") == 3
    # current == v1 content
    assert [r.id for r in inp.read_table(
        ScanSpec(table="default.tt")).collect()] == [1]
    # rolled-past v2 still readable (append-only history)
    assert [r.id for r in inp.read_table(
        ScanSpec(table="default.tt", as_of_version=2)).collect()] == [2]
    # note recorded
    assert cat.list_snapshots("default.tt")[-1]["note"] == "rollback to v1"

    # unknown / expired version raises, current untouched
    with pytest.raises(SnapshotError):
        cat.rollback_to_version("default.tt", 99)
    assert cat.current_version("default.tt") == 3

    # expire down to the rollback snapshot: v1's files survive because
    # v3's manifest references them (deletion set = expired minus retained)
    cat.expire_snapshots("default.tt", keep_last=1)
    assert [r.id for r in inp.read_table(
        ScanSpec(table="default.tt")).collect()] == [1]

    # rollback to the empty pre-first-commit state
    v4 = cat.rollback_to_version("default.tt", 0)
    assert v4 == 4
    assert inp.read_table(ScanSpec(table="default.tt")).count() == 0
