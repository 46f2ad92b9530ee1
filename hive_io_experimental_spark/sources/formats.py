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


CORRUPT_COL = "_corrupt_record"


def with_corrupt_capture(
    schema: T.StructType,
) -> tuple[T.StructType, str]:
    """(schema + corrupt-capture column, its name): wire a PERMISSIVE
    csv/json scan so unparseable lines land — whole — in one string
    column instead of vanishing, the reference's ``hiveReadRowFailed``
    observer signal (HiveApiInputObserver.java:43-46) made countable in
    aggregate. Pass the returned name to ``ScanMeter.attach(df,
    corrupt_col=...)`` (observers.py) to meter failed reads DURING the
    scan, then drop the column. Spark only populates the capture column
    when an explicit schema carries it, which is why this is a schema
    transform and not a reader option alone. Raises if the schema
    already claims the reserved name."""
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(
            f"with_corrupt_capture: schema already has a "
            f"{CORRUPT_COL!r} column — it collides with the corrupt-"
            f"record capture column. Rename it first."
        )
    # build a NEW StructType: StructType.add appends to self and returns
    # self, so the caller's schema object would silently grow the capture
    # column and poison its next (strict-scan / writer / create_table) use
    return (
        T.StructType(
            list(schema.fields)
            + [T.StructField(CORRUPT_COL, T.StringType(), True)]
        ),
        CORRUPT_COL,
    )


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
