"""hive_io_experimental_spark — a PySpark-native analytics engine with the
capability surface of facebook/hive-io-experimental, rebuilt Spark-first.

The reference (read-only at /root/reference) is a Hive table I/O library:
programmatic scan/write of warehouse tables with schema/type management,
partition pruning, column projection, and a commit protocol
(see /root/reference/README.md:13-21). This package re-expresses that surface
over the Spark DataFrame API — Catalyst provides pruning/pushdown/parallelism
natively — and extends it with the relational operators and LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing) a
100 TB training-data pipeline needs.

Layout:
    session      SparkSession builder with scale-appropriate defaults
    types        HiveType lattice + widening-only upgrade rules
    schema       table schema model (data columns first, then partition cols)
    catalog      mini-metastore: JSON sidecar catalog with partition stats
    input        HiveInput.read_table(ScanSpec) -> DataFrame
    output       HiveOutput.write_table with the reference's strict policies
    records      typed record accessor shim + bean mapping
    operators/   dedup, similarity, text, multimodal, relational
    streaming/   structured-streaming operators over event streams
    cli          hivetail-equivalent scan/limit/print tool
"""

from hive_io_experimental_spark.session import get_spark
from hive_io_experimental_spark.types import HiveType
from hive_io_experimental_spark.schema import HiveTableSchema
from hive_io_experimental_spark.catalog import Catalog, HiveStats, TableDesc
from hive_io_experimental_spark.input import HiveInput, ScanSpec
from hive_io_experimental_spark.output import HiveOutput, WriteSpec
from hive_io_experimental_spark.profiles import Profiles

__all__ = [
    "get_spark",
    "HiveType",
    "HiveTableSchema",
    "Catalog",
    "HiveStats",
    "TableDesc",
    "HiveInput",
    "ScanSpec",
    "HiveOutput",
    "WriteSpec",
    "Profiles",
]

__version__ = "0.1.0"
