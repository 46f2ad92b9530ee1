"""Table maintenance: snapshot compaction for versioned tables.

Streaming appends (streaming/snapshots.py) and frequent small merges leave
a versioned table's current manifest pointing at many small files — the
classic small-files problem that murders scan throughput at scale (every
file is a task + an open/footer-read). Compaction rewrites the CURRENT
content into a new snapshot with consolidated files:

  * reads go through the engine's own scan (so the rewrite sees exactly
    the current version), writes through the engine's own versioned write
    paths — which NEVER delete prior files, so the classic read-overwrite
    hazard of in-place compaction simply cannot occur: the scan streams
    from the old immutable dirs while the new dirs are written;
  * every pre-compaction version stays readable until expire_snapshots
    reclaims it — compaction and retention are independent decisions;
  * partitioned tables repartition by the partition keys first, so each
    partition's rows collapse into one task -> one file per partition;
    unpartitioned tables coalesce to ``target_files``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from hive_io_experimental_spark.catalog import Catalog, TableDesc
from hive_io_experimental_spark.errors import SnapshotError
from hive_io_experimental_spark.input import HiveInput, ScanSpec
from hive_io_experimental_spark.output import HiveOutput, WriteSpec


def compact_snapshots(
    spark: SparkSession,
    catalog: Catalog,
    table: str,
    target_files: int = 1,
) -> int:
    """Rewrite ``table``'s current version into consolidated files as a new
    snapshot; returns the committed version. History is untouched — pair
    with catalog.expire_snapshots to reclaim the superseded small files."""
    desc = TableDesc.parse(table)
    if not catalog.is_versioned(desc):
        raise SnapshotError(
            f"compaction targets versioned tables; {desc} is not versioned "
            f"(unversioned tables are rewritten by their owning job)"
        )
    schema = catalog.get_schema(desc)
    current = HiveInput(spark, catalog).read_table(ScanSpec(table=table))
    out = HiveOutput(spark, catalog)
    if schema.partition_keys:
        body = current.repartition(*schema.partition_keys)
        out.write_dynamic(table, body, drop_partitions=True)
    else:
        # versioned unpartitioned write_table REPLACES content in a new
        # snapshot — exactly compaction semantics
        out.write_table(
            WriteSpec(table), current.coalesce(max(1, target_files))
        )
    return catalog.current_version(desc)


def repartition_table(
    spark: SparkSession,
    catalog: Catalog,
    src_table: str,
    dst_table: str,
    partition_keys: tuple[str, ...],
    storage_format: str | None = None,
    sort_cols: tuple[str, ...] = (),
    versioned: bool = False,
) -> int:
    """Migrate a table to a NEW partition layout in one dynamic write.

    The layout-evolution escape hatch every warehouse eventually needs:
    the original partition choice stops matching the query pattern (too
    granular -> small files; wrong column -> no pruning) and the table
    must be rewritten partitioned differently. This reads the CURRENT
    content through the engine's scan (projection of all columns,
    partition values materialized as ordinary columns), registers
    ``dst_table`` with the new partition keys — which must be existing
    columns — and lands every new partition in ONE dynamic-partition job
    (a thousand partitions cost one shuffle, not a thousand writes).
    The source table is untouched; cut-over (rename/drop) stays an
    explicit caller decision, as in every production migration.

    Returns the number of partitions registered on the destination.
    """
    from pyspark.sql import types as T

    from hive_io_experimental_spark.schema import HiveTableSchema

    src_desc = TableDesc.parse(src_table)
    df = HiveInput(spark, catalog).read_table(ScanSpec(table=src_table))
    missing = set(partition_keys) - set(df.columns)
    if missing:
        raise ValueError(
            f"new partition keys not in table columns: {sorted(missing)}"
        )
    # partition values travel as strings (catalog contract); everything
    # else keeps its scanned type
    data_fields = tuple(
        (f.name, f.dataType)
        for f in df.schema.fields
        if f.name not in partition_keys
    )
    fmt = storage_format or catalog.table_format(src_desc)
    catalog.create_table(
        dst_table,
        HiveTableSchema(data_fields, partition_keys=tuple(partition_keys)),
        storage_format=fmt,
        versioned=versioned,
        sort_cols=sort_cols,
    )
    body = df.withColumns(
        {k: df[k].cast(T.StringType()) for k in partition_keys}
    )
    specs = HiveOutput(spark, catalog).write_dynamic(dst_table, body)
    return len(specs)


def catalog_fsck(catalog: Catalog) -> dict:
    """Metadata <-> filesystem consistency report (fsck for the warehouse).

    The drift every long-lived warehouse accumulates: partitions whose
    directory vanished (manual deletes, failed restores) and data
    directories no catalog entry references (killed jobs' leftovers,
    manual copies). Driver-sized metadata walk, no Spark session.

    Returns {"missing_partition_dirs": [(table, partition_values)...],
    "orphan_partition_dirs": [(table, path)...], "missing_table_dirs":
    [table...]}: empty lists = clean. Repair stays an explicit caller
    decision (drop_partition for the missing, add_partition or delete
    for the orphans) — an fsck that auto-repairs is how metadata loss
    compounds.
    """
    import os

    report = {
        "missing_partition_dirs": [],
        "orphan_partition_dirs": [],
        "missing_table_dirs": [],
    }
    for key in catalog.list_tables():
        desc = TableDesc.parse(key)
        location = catalog.table_location(desc)
        schema = catalog.get_schema(desc)
        parts = catalog.list_partitions(desc)
        if not os.path.isdir(location):
            if parts or not schema.partition_keys:
                report["missing_table_dirs"].append(key)
            continue
        registered = set()
        for p in parts:
            registered.add(os.path.normpath(p.location))
            if not os.path.isdir(p.location):
                report["missing_partition_dirs"].append((key, p.values))
        if schema.partition_keys:
            # one level per partition key: walk registered depth only
            depth = len(schema.partition_keys)
            stack = [(location, 0)]
            while stack:
                d, lvl = stack.pop()
                for name in sorted(os.listdir(d)):
                    sub = os.path.join(d, name)
                    if not os.path.isdir(sub) or name.startswith(
                        ("_", ".")
                    ):
                        continue
                    if lvl + 1 == depth:
                        if os.path.normpath(sub) not in registered:
                            report["orphan_partition_dirs"].append(
                                (key, sub)
                            )
                    else:
                        stack.append((sub, lvl + 1))
    return report


def vacuum_orphans(catalog: Catalog, dry_run: bool = True) -> dict:
    """Reclaim orphan partition directories catalog_fsck reported —
    leftovers of killed jobs, failed restores, and manual copies that no
    catalog entry references.

    VACUUM is fsck's explicit repair arm, split from detection on
    purpose (an fsck that auto-deletes is how a mis-registered warehouse
    loses data): ``dry_run=True`` (the default) only lists what WOULD be
    deleted; ``dry_run=False`` removes exactly the orphan directories
    the report names — never a registered partition, never table roots,
    never missing-dir entries (those are metadata repairs, not file
    deletes). Driver-sized metadata walk + rmtree, no Spark session.
    Returns {"orphans": [(table, path)...], "deleted": n,
    "failed": [(table, path)...]} — ``deleted`` counts only directories
    VERIFIED gone afterwards; a delete that failed (permissions, races)
    lands in ``failed`` instead of inflating the reclaim count.
    """
    import os
    import shutil

    report = catalog_fsck(catalog)
    orphans = report["orphan_partition_dirs"]
    deleted = 0
    failed: list = []
    if not dry_run:
        for table, path in orphans:
            shutil.rmtree(path, ignore_errors=True)
            if os.path.isdir(path):
                failed.append((table, path))
            else:
                deleted += 1
    return {"orphans": orphans, "deleted": deleted, "failed": failed}
