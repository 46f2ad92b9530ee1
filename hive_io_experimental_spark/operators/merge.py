"""SCD1 merge (upsert) into a partitioned catalog table.

The reference's write surface is insert-only with a partition-overwrite
escape hatch (drop_partition, output/OutputConf.java:58-59 /
HiveApiOutputFormat.java:417-442); a real warehouse also needs MERGE:
update matching keys, insert new ones. This operator composes it from the
engine's own policy-checked primitives:

  1. affected partitions = DISTINCT partition values of the updates
     (driver-sized metadata — partition VALUES, never rows);
  2. per partition: merged = current ⟕(anti on keys) updates ∪ updates —
     key-only anti join, updates-preferred;
  3. merged lands in a STAGING table first, then replaces the target
     partition via drop_partition. The staging hop exists because a
     partition cannot be overwritten from a plan that is lazily reading
     the same files (the classic read-overwrite hazard); production
     engines do the same dance with a directory swap — a staging table
     through the public API keeps the semantics identical and every write
     policy-checked.

Scale: work is proportional to AFFECTED partitions only (the usual merge
contract); each partition rewrite is one anti join on the merge keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_io_experimental_spark.catalog import Catalog, TableDesc
from hive_io_experimental_spark.input import HiveInput, ScanSpec
from hive_io_experimental_spark.output import HiveOutput, WriteSpec


def scd1_merge(
    spark: SparkSession,
    catalog: Catalog,
    table: str,
    updates: DataFrame,
    key_cols: tuple[str, ...],
    partition_col: str,
) -> None:
    """Upsert ``updates`` (which carry ``partition_col``) into ``table``."""
    inp = HiveInput(spark, catalog)
    out = HiveOutput(spark, catalog)
    desc = TableDesc.parse(table)
    staging_name = f"{desc.database}.{desc.table}_merge_staging"

    part_values = [
        str(r[0])
        for r in updates.select(partition_col).distinct().collect()
    ]
    catalog.create_table(
        staging_name, catalog.get_schema(desc), if_not_exists=True,
        storage_format=catalog.table_format(desc),
    )
    try:
        for pv in part_values:
            upd = updates.filter(F.col(partition_col) == pv).drop(
                partition_col
            )
            if catalog.partition_exists(desc, {partition_col: pv}):
                cur = inp.read_table(
                    ScanSpec(
                        table=table,
                        partition_filter=f"{partition_col} = '{pv}'",
                    )
                ).drop(partition_col)
                merged = cur.join(
                    upd.select(*key_cols), list(key_cols), "left_anti"
                ).unionByName(upd)
            else:
                merged = upd
            out.write_table(
                WriteSpec(staging_name, {partition_col: pv}), merged
            )
        for pv in part_values:
            staged = inp.read_table(
                ScanSpec(
                    table=staging_name,
                    partition_filter=f"{partition_col} = '{pv}'",
                )
            ).drop(partition_col)
            out.write_table(
                WriteSpec(
                    table, {partition_col: pv}, drop_partition=True
                ),
                staged,
            )
    finally:
        catalog.drop_table(staging_name, delete_data=True)
