"""Streaming deduplication: exactly-once rows per key over an event stream.

``withWatermark + dropDuplicates`` is Spark's bounded-state streaming dedup:
the state store keeps one entry per key seen within the watermark horizon,
and late duplicates beyond the horizon are dropped by the watermark itself.
This is the streaming twin of operators/dedup.py:exact_dedup — a training-
data ingest pipeline runs exactly this at the front of the stream (dedup by
content fingerprint before any expensive enrichment).

Scale notes: state is O(distinct keys per watermark window), hash-partitioned
by key; the watermark bounds it — an unbounded dropDuplicates would accrete
state forever at 100 TB/day. dropDuplicatesWithinWatermark (Spark 3.5+)
additionally evicts each key at watermark passage, which we expose as
``within_watermark=True`` for dedup horizons shorter than stream retention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark_delay: str = "2 hours",
    within_watermark: bool = False,
) -> DataFrame:
    """Drop duplicate rows by ``keys`` from a (streaming) events frame.

    The event-time column is watermarked so state stays bounded. With
    ``within_watermark`` the key is guaranteed deduped only within the
    watermark horizon (state evicted at passage) — cheaper, the usual choice
    for content-fingerprint dedup where horizons are short.
    """
    from hive_io_experimental_spark.operators.relational import ensure_event_time

    ev = ensure_event_time(events, ts_col).withWatermark(ts_col, watermark_delay)
    if within_watermark:
        return ev.dropDuplicatesWithinWatermark(list(keys))
    return ev.dropDuplicates(list(keys))


def fingerprint_dedup_stream(
    docs_stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Content-fingerprint streaming dedup: first document per normalized-
    text hash wins (the streaming form of exact_dedup's keep-one rule)."""
    from hive_io_experimental_spark.functions.textfns import normalize_text

    keyed = docs_stream.withColumn(
        "text_hash", F.md5(normalize_text(F.col(text_col)))
    )
    return dedup_stream(
        keyed, keys=("text_hash",), ts_col=ts_col,
        watermark_delay=watermark_delay, within_watermark=True,
    )
