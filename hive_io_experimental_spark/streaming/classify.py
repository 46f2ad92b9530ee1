"""Streaming NB routing: documents arrive as a stream, labels come from
the PERSISTED model (nb_build_model / nb_update_model) — the online half
of the classifier lifecycle, completing the serve matrix (every stored
artifact here — LSH/PQ/IVF-PQ indexes, now the NB router — has a batch
query path AND a stamp-fenced streaming twin).

Why the scoring lives in foreachBatch (the serve_pq_topk_stream
pattern): per-document totals are a groupBy over the token fan-out and
the winning label is a min_by — neither is expressible in append-mode
streaming — but both are exact per micro-batch because a document's
token rows never cross batches. foreachBatch hands a batch frame, so
``nb_score`` runs unchanged against the pinned model frames, making
stream output row-identical to ``nb_score_from_model`` over the same
closed input by construction.

Model-lifecycle semantics — ONE deliberate difference from the index
serves: an NB ``nb_update_model`` (or rebuild) REPLACES all three model
tables under a new build_id — there is no append that leaves the
planned snapshot's files intact — so there is no serve-through case at
all: ANY model change mid-stream (incremental update included) stops
the stream loudly, and a restart serves the new version. The pre+post
per-batch probes are `_nb_load_model_full`'s fences (empty / pre-stamp
/ mixed-stamp / torn-rebuild) plus the planned-build pin; the post-sink
probe names the epoch whose already-sunk output is suspect when a
replacement lands mid-batch (the check-then-use lesson, r12 ADVICE).

Per micro-batch cost: |batch| token fan-out x label broadcast, one
vocabulary equi-join against the pinned likelihoods, a batch-local
min_by, plus six 1-row stamp probes (three tables x pre/post).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_io_experimental_spark.operators.text import (
    _nb_load_model_full,
    nb_score,
)
from hive_io_experimental_spark.streaming.similarity import (
    _serve_adc_stream,
)


def serve_nb_score_stream(
    spark: SparkSession,
    catalog,
    model_table: str,
    doc_stream: DataFrame,
    sink_fn,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Wire the online NB routing pipeline and return the (unstarted)
    DataStreamWriter — callers pick the trigger/checkpoint and
    .start(). Output rows are (doc_id, label, total_bits, n_tokens),
    row-identical to nb_score_from_model over the same closed input.

    The stored model is probed at plan time (torn-rebuild refusal, the
    batch path's fences) and re-probed around every micro-batch pinned
    to the PLANNED build_id: a model updated or rebuilt mid-stream
    fails the streaming query loudly — an NB update replaces the model
    tables outright, so unlike an index APPEND there is nothing
    consistent left to serve through. Restart to serve the new model
    version."""

    def _validate(expect_build_id=None):
        meta, priors, likelihoods = _nb_load_model_full(
            spark, catalog, model_table, "serve_nb_score_stream"
        )
        if (
            expect_build_id is not None
            and meta["build_id"] != expect_build_id
        ):
            raise ValueError(
                f"serve_nb_score_stream: model {model_table} was "
                f"UPDATED or REBUILT mid-stream (planned against build "
                f"{expect_build_id!r}, now {meta['build_id']!r}) — an "
                f"NB update replaces the model tables, so the stream's "
                f"pinned frames no longer exist. Restart the stream to "
                f"serve the new model version."
            )
        return meta["build_id"]

    planned_build = _validate()
    # pinned snapshot reads: the frames every batch scores against,
    # resolved once at plan time under the build the probe just fenced
    _meta, priors_full, lik_full = _nb_load_model_full(
        spark, catalog, model_table, "serve_nb_score_stream"
    )
    priors = priors_full.select(
        "label", "n_docs", "prior_bits", "unseen_bits"
    )
    likelihoods = lik_full.select("label", "token", "bits")

    def _rank(batch_df: DataFrame) -> DataFrame:
        return nb_score(batch_df, priors, likelihoods, text_col, id_col)

    return _serve_adc_stream(
        doc_stream.select(F.col(id_col), F.col(text_col)),
        planned_build, _validate, _rank, sink_fn,
        op="serve_nb_score_stream",
        batch_hint="nb_score_from_model",
        taint_hint="may mix model versions",
    )
