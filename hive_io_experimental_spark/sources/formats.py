"""Format readers with the reference's text conventions.

The reference's delimited-text path decodes '\\N' and empty fields as NULL
(input/parser/array/BytesParser.java:75-77, 96-148) and lets the user force a
parser via conf (Parsers.forcedParser, input/parser/Parsers.java:77-100).
Spark equivalents are reader options; this module centralizes them so every
entry point shares the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def reader_options(fmt: str) -> dict[str, str]:
    """Engine-standard read options per format.

    csv mirrors the reference's BytesParser conventions: tab separator,
    '\\N' as NULL (empty string also decodes NULL when a schema is
    supplied, matching zero-length-field semantics).
    """
    if fmt.lower() == "csv":
        return {
            "sep": "\t",
            "nullValue": "\\N",
            "emptyValue": "",
            "header": "false",
            "mode": "PERMISSIVE",
        }
    return {}


def writer_options(fmt: str) -> dict[str, str]:
    """Engine-standard write options per format — symmetric with
    reader_options so a written table round-trips through the same serde
    conventions (the reference serializes through the table's own serde,
    output/RecordWriterImpl.java:88-131)."""
    if fmt.lower() == "csv":
        return {"sep": "\t", "nullValue": "\\N", "emptyValue": "", "header": "false"}
    return {}


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read parquet/csv/json/orc/text with engine-standard options."""
    fmt = fmt.lower()
    opts = reader_options(fmt)
    opts.update(options or {})
    reader = spark.read.options(**opts)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        reader = reader.option("inferSchema", "true")
    return reader.format(fmt).load(path)
