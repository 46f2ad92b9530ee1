"""Streaming ingestion against persisted dedup artifacts.

The batch lifecycle in operators/ingestion.py (probe -> accept ->
append), driven by Structured Streaming: each micro-batch of documents
is exact-deduped against the STORED corpus artifacts (bloom pre-filter
+ fingerprint anti-join, zero corpus scans), survivors land in an
accept directory, and the artifacts fold the survivors in before the
next batch — so within one run, batch N+1 deduplicates against
everything batch N accepted, not just the original corpus.

foreachBatch (not a stateful operator) is the right Spark shape here:
the dedup state is the persisted artifact tables themselves — shared
with batch ingestion and sized to the corpus, far beyond what
applyInPandasWithState should hold — and foreachBatch gives exactly-
once-per-batch-id semantics to drive it. Replay safety after recovery:
survivors write to a per-batch subdirectory (overwrite — a replayed
batch id rewrites the same files), and append_to_artifacts is
idempotent on re-delivered keys by construction AND crash-ordered
(bloom committed by pointer-swap BEFORE fingerprints append, delta
built from all batch keys — see its docstring): a crash at any point
inside the append leaves a probe-consistent state that the replayed
batch converges, never a fingerprint the bloom would false-negate.
tests/test_ingestion.py kills the append at each injection point and
replays. The reference has no streaming surface (SURVEY §2.2);
extension operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hive_io_experimental_spark.operators.ingestion import (
    append_to_artifacts,
    ingest_batch,
)


def ingest_batch_sink(
    artifact_path: str,
    accept_dir: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """The foreachBatch callable. Exposed separately (same pattern as
    snapshot_batch_sink) so tests and backfills can invoke it with
    explicit batch ids."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        survivors = ingest_batch(
            batch_df, artifact_path, text_col=text_col, id_col=id_col
        )
        # materialize ONCE: accepted feeds the accept-dir write and the
        # artifact append, and its plan reads the directories the append
        # rewrites (the staleness footgun append guards against — cutting
        # here also avoids re-running the probe per consumer)
        accepted = batch_df.join(
            survivors.select(F.col("id").alias(id_col)), id_col, "left_semi"
        ).localCheckpoint()
        if accepted.isEmpty():
            return
        if accept_dir is not None:
            accepted.write.mode("overwrite").parquet(
                f"{accept_dir}/batch_id={batch_id}"
            )
        append_to_artifacts(
            accepted, artifact_path, text_col=text_col, id_col=id_col
        )

    return sink


def ingest_stream(
    sdf: DataFrame,
    artifact_path: str,
    checkpoint_dir: str,
    accept_dir: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Start the ingestion stream (availableNow trigger by default shape;
    callers needing a continuous trigger configure writeStream
    themselves). ``artifact_path`` must hold a completed
    build_corpus_artifacts manifest — a missing one fails the first
    batch loudly rather than silently accepting everything."""
    return (
        sdf.writeStream.foreachBatch(
            ingest_batch_sink(artifact_path, accept_dir, text_col, id_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
