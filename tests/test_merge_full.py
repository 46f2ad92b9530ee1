"""Cross-partition key-move MERGE (operators/merge.py scd1_merge_full).

The partition-local scd1_merge contract forbids a key changing partitions;
scd1_merge_full pays one projection-pruned key scan to allow exactly that.
These tests pin the three behaviors the full-scan variant adds: the stale
row in the OLD partition is deleted, a fully-drained partition disappears
(registration and directory), and when no key moves the result matches the
partition-local variant.
"""

from __future__ import annotations

import os

from pyspark.sql import types as T

from hive_io_experimental_spark.catalog import Catalog
from hive_io_experimental_spark.input import HiveInput, ScanSpec
from hive_io_experimental_spark.operators.merge import scd1_merge, scd1_merge_full
from hive_io_experimental_spark.output import HiveOutput, WriteSpec
from hive_io_experimental_spark.schema import HiveTableSchema


def _mk(spark, warehouse):
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
    out.write_table(
        WriteSpec("default.kv", {"p": "b"}),
        spark.createDataFrame([(3, "old3")], "k long, v string"),
    )
    return cat


def _rows(spark, cat):
    return {
        (r["k"], r["p"]): r["v"]
        for r in HiveInput(spark, cat)
        .read_table(ScanSpec(table="default.kv"))
        .collect()
    }


def test_key_move_deletes_stale_row_in_old_partition(spark, warehouse):
    cat = _mk(spark, warehouse)
    # key 2 moves a -> b; partition-local semantics would leave (2,a,old2)
    updates = spark.createDataFrame([(2, "new2", "b")], "k long, v string, p string")
    scd1_merge_full(spark, cat, "default.kv", updates,
                    key_cols=("k",), partition_col="p")
    assert _rows(spark, cat) == {
        (1, "a"): "old1", (2, "b"): "new2", (3, "b"): "old3",
    }


def test_drained_partition_is_dropped_entirely(spark, warehouse):
    cat = _mk(spark, warehouse)
    # BOTH rows of partition a move to b: a must vanish (catalog + dir)
    updates = spark.createDataFrame(
        [(1, "new1", "b"), (2, "new2", "b")], "k long, v string, p string"
    )
    scd1_merge_full(spark, cat, "default.kv", updates,
                    key_cols=("k",), partition_col="p")
    assert _rows(spark, cat) == {
        (1, "b"): "new1", (2, "b"): "new2", (3, "b"): "old3",
    }
    assert not cat.partition_exists("default.kv", {"p": "a"})
    assert not os.path.isdir(
        Catalog.partition_path(cat.table_location("default.kv"), {"p": "a"})
    )


def test_no_moves_matches_partition_local_merge(spark, warehouse):
    cat_full = _mk(spark, warehouse + "/full")
    cat_local = _mk(spark, warehouse + "/local")
    updates = spark.createDataFrame(
        [(2, "new2", "a"), (4, "new4", "c")], "k long, v string, p string"
    )
    scd1_merge_full(spark, cat_full, "default.kv", updates,
                    key_cols=("k",), partition_col="p")
    scd1_merge(spark, cat_local, "default.kv", updates,
               key_cols=("k",), partition_col="p")
    assert _rows(spark, cat_full) == _rows(spark, cat_local) == {
        (1, "a"): "old1", (2, "a"): "new2",
        (3, "b"): "old3", (4, "c"): "new4",
    }
    assert not cat_full.table_exists("default.kv_merge_staging")


def test_merge_partition_cap_fails_fast(spark, warehouse):
    """hiveio.merge.max_partitions bounds the driver-side partition list."""
    import pytest

    from hive_io_experimental_spark import conf

    cat = _mk(spark, warehouse)
    updates = spark.createDataFrame(
        [(10 + i, f"v{i}", f"p{i}") for i in range(5)],
        "k long, v string, p string",
    )
    prev = conf.MERGE_MAX_PARTITIONS.get(spark)
    conf.MERGE_MAX_PARTITIONS.set(spark, 3)
    try:
        with pytest.raises(ValueError, match="more than 3 distinct"):
            scd1_merge(spark, cat, "default.kv", updates,
                       key_cols=("k",), partition_col="p")
        with pytest.raises(ValueError, match="more than 3 distinct"):
            scd1_merge_full(spark, cat, "default.kv", updates,
                            key_cols=("k",), partition_col="p")
    finally:
        conf.MERGE_MAX_PARTITIONS.set(spark, prev)


def test_erase_keys_deletes_across_partitions(spark, warehouse):
    from hive_io_experimental_spark.operators.merge import erase_keys

    cat = _mk(spark, warehouse)
    # key 1 lives in partition a, key 3 in partition b — the request
    # names only keys; partition b drains completely
    stats = erase_keys(
        spark, cat, "default.kv",
        spark.createDataFrame([(1,), (3,)], "k long"),
        key_cols=("k",), partition_col="p",
    )
    assert stats == {"n_partitions": 2, "n_erased": 2,
                     "skipped_orphans": []}
    left = {
        (r.k, r.v, r.p)
        for r in HiveInput(spark, cat)
        .read_table(ScanSpec(table="default.kv"))
        .collect()
    }
    assert left == {(2, "old2", "a")}
    # drained partition is gone: registration AND directory
    from hive_io_experimental_spark.catalog import TableDesc

    desc = TableDesc.parse("default.kv")
    assert not cat.partition_exists(desc, {"p": "b"})
    assert not os.path.isdir(
        Catalog.partition_path(cat.table_location(desc), {"p": "b"})
    )


def test_erase_keys_absent_key_is_noop(spark, warehouse):
    from hive_io_experimental_spark.operators.merge import erase_keys

    cat = _mk(spark, warehouse)
    stats = erase_keys(
        spark, cat, "default.kv",
        spark.createDataFrame([(99,)], "k long"),
        key_cols=("k",), partition_col="p",
    )
    assert stats == {"n_partitions": 0, "n_erased": 0,
                     "skipped_orphans": []}
    n = (
        HiveInput(spark, cat)
        .read_table(ScanSpec(table="default.kv"))
        .count()
    )
    assert n == 3


def test_erase_keys_uses_bloom_index_fast_path(spark, warehouse):
    """With partition blooms stamped on the key column, the erasure's
    location scan is pre-pruned driver-side: a key in partition b only
    touches b, and an absent key erases nothing without a scan. The
    delete result is identical to the unindexed path."""
    from hive_io_experimental_spark.analyze import analyze_partition_blooms
    from hive_io_experimental_spark.operators.merge import erase_keys

    cat = _mk(spark, warehouse)
    analyze_partition_blooms(
        spark, cat, "default.kv", ("k",), m_bits=4096, k_hashes=3
    )
    stats = erase_keys(
        spark, cat, "default.kv",
        spark.createDataFrame([(3,)], "k long"),
        key_cols=("k",), partition_col="p",
    )
    assert stats == {"n_partitions": 1, "n_erased": 1,
                     "skipped_orphans": []}
    left = {
        (r.k, r.p)
        for r in HiveInput(spark, cat)
        .read_table(ScanSpec(table="default.kv"))
        .collect()
    }
    assert left == {(1, "a"), (2, "a")}
    # absent key: the bloom proves no partition can hold it -> no-op
    # without any Spark location scan
    stats = erase_keys(
        spark, cat, "default.kv",
        spark.createDataFrame([(424242,)], "k long"),
        key_cols=("k",), partition_col="p",
    )
    assert stats == {"n_partitions": 0, "n_erased": 0,
                     "skipped_orphans": []}


def test_erase_keys_reports_orphan_dir_hits(spark, warehouse):
    """Keys living in UNREGISTERED partition directories cannot be erased
    by a partition-scoped rewrite (no registration to swap) — an RTBF
    operator must report them in the audit record, never drop them
    silently. The registered copies of the same keys still erase."""
    from hive_io_experimental_spark.operators.merge import erase_keys

    cat = _mk(spark, warehouse)
    loc = cat.table_location("default.kv")
    orphan = os.path.join(loc, "p=ghost")
    spark.createDataFrame([(1, "ghostrow")], "k long, v string").write.parquet(
        orphan
    )
    stats = erase_keys(
        spark, cat, "default.kv",
        spark.createDataFrame([(1,)], "k long"),
        key_cols=("k",), partition_col="p",
    )
    # key 1's registered copy (partition a) is erased; the orphan hit is
    # surfaced for fsck/vacuum + re-run instead of vanishing
    assert stats["n_partitions"] == 1 and stats["n_erased"] == 1
    assert stats["skipped_orphans"] == ["ghost"]
    survivors = _rows(spark, cat)
    assert (1, "a") not in survivors and (2, "a") in survivors


def test_erase_keys_orphan_dirs_bypass_bloom_fast_path(spark, warehouse):
    """Orphan dirs carry no bloom stamps, so index pruning could skip
    their rows unscanned — with any orphan dir present the operator must
    fall back to the full location scan and still report the orphan hit."""
    from hive_io_experimental_spark.analyze import analyze_partition_blooms
    from hive_io_experimental_spark.operators.merge import erase_keys

    cat = _mk(spark, warehouse)
    analyze_partition_blooms(
        spark, cat, "default.kv", ("k",), m_bits=4096, k_hashes=3
    )
    loc = cat.table_location("default.kv")
    # the target key lives ONLY in the orphan dir: a bloom-pruned scan
    # would see nothing at all
    spark.createDataFrame([(777, "only-here")], "k long, v string") \
        .write.parquet(os.path.join(loc, "p=ghost"))
    stats = erase_keys(
        spark, cat, "default.kv",
        spark.createDataFrame([(777,)], "k long"),
        key_cols=("k",), partition_col="p",
    )
    assert stats["n_partitions"] == 0 and stats["n_erased"] == 0
    assert stats["skipped_orphans"] == ["ghost"]
