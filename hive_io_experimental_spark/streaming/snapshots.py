"""Streaming sink into a versioned catalog table: one snapshot per batch.

Bridges Structured Streaming and the time-travel layer: each micro-batch
commits as a new APPEND snapshot (output.append_table), so the versioned
table accumulates the stream AND keeps its per-batch history — any past
version reproduces the table as of that batch, and a consumer can diff two
versions to get exactly one batch's rows.

Exactly-once: foreachBatch replays a batch after recovery with the SAME
batch_id. The sink stamps the batch_id into the snapshot note and skips
ids it has already committed, making the commit idempotent — the same
sink-side dedup contract Spark documents for idempotent foreachBatch
sinks. (The note check + commit are not atomic across two concurrent
queries writing the SAME table; one stream per table is the supported
shape, like every single-writer streaming sink.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from hive_io_experimental_spark.catalog import Catalog
from hive_io_experimental_spark.output import HiveOutput, WriteSpec

BATCH_NOTE_PREFIX = "stream-batch-"


def snapshot_batch_sink(warehouse_dir: str, table: str):
    """The foreachBatch callable: commit one append snapshot per batch_id,
    idempotently. Exposed separately so tests (and backfills) can invoke
    it with explicit batch ids."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        cat = Catalog(warehouse_dir)
        note = f"{BATCH_NOTE_PREFIX}{batch_id}"
        already = any(
            s["note"] == note for s in cat.list_snapshots(table)
        )
        if already:  # replayed batch after recovery
            return
        HiveOutput(batch_df.sparkSession, cat).append_table(
            WriteSpec(table), batch_df, note=note
        )

    return sink


def append_snapshots_stream(
    sdf: DataFrame, warehouse_dir: str, table: str, checkpoint_dir: str
):
    """Start the stream: every micro-batch becomes one snapshot version of
    ``table`` (which must exist, be versioned and unpartitioned). Uses an
    availableNow trigger by default shape — callers needing a continuous
    trigger configure the returned query's writeStream themselves."""
    return (
        sdf.writeStream.foreachBatch(snapshot_batch_sink(warehouse_dir, table))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
