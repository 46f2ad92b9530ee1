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
