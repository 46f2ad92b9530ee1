"""Streaming windowed aggregation with watermarked late-data handling.

readStream(parquet dir) -> withWatermark -> window(1 hour) -> counts/sums.
The batch twin is operators/relational.py:events_hourly — identical
semantics over a closed input, which is how tests verify correctness
(run the stream with availableNow over the same files, compare).

Scale notes: the streaming state store holds one entry per open
(window x event_type) group; the watermark bounds state size — without it a
100 TB/day stream accretes state forever. Output mode 'append' emits each
window exactly once, when the watermark passes its end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based stream over an events directory (schema locked up front —
    streaming sources require a fixed schema, like the reference's
    metastore-fixed schemas).

    A single-FILE path is handled by streaming its parent directory with a
    pathGlobFilter on the file name: Spark's file stream source requires a
    directory basePath.
    """
    import os

    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        return reader.parquet(os.path.dirname(path))
    return reader.parquet(path)


def windowed_event_counts(
    events: DataFrame, window_duration: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts/sums per event type with late-data watermark."""
    from hive_io_experimental_spark.operators.relational import ensure_event_time

    events = ensure_event_time(events)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
