"""Streaming BPE segmentation from the stored vocab — the tokenizer's
online serve path, completing the stored-artifact serve matrix
(LSH/PQ/IVF-PQ indexes, the NB router, and now the tokenizer each have
a batch query path and a stamp-fenced streaming twin).

Segmentation is row-local (the literal replace chain or the Arrow
applier — no aggregation), so unlike the ANN/NB serves nothing here
NEEDS foreachBatch for correctness; the skeleton is used for the
lifecycle contract alone. And unlike those serves, the plan carries its
own COPY of the merge list (collected once, n_merges-bounded — KBs), so
a mid-stream vocab rebuild cannot corrupt output even in principle.
The per-batch stamp probes exist for a different reason: a tokenizer
that silently keeps serving a SUPERSEDED vocab while every other
consumer picks up the new one produces mixed tokenizations across one
corpus — poison for a training pipeline where token counts, budgets and
packing all assume one tokenizer version. A vocab change mid-stream
therefore stops the stream loudly (restart serves the new vocab), the
same operational semantics as the NB serve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_io_experimental_spark.operators.text import (
    _segment_with,
    bpe_load_vocab,
)
from hive_io_experimental_spark.streaming.similarity import (
    _serve_adc_stream,
)


def serve_bpe_segment_stream(
    spark: SparkSession,
    catalog,
    vocab_table: str,
    doc_stream: DataFrame,
    sink_fn,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Wire the online segmentation pipeline and return the (unstarted)
    DataStreamWriter. Output rows are (doc_id, n_words, n_bpe_tokens),
    row-identical to bpe_segment_from_vocab over the same closed input
    — the batch helper runs unchanged per micro-batch on the merge list
    collected at plan time (same literal-vs-Arrow dispatch).

    The stored vocab is stamp-fenced at plan time (bpe_load_vocab's
    empty/pre-stamp/mixed-stamp/partial-write refusals) and re-probed
    around every micro-batch pinned to the PLANNED build_id: a vocab
    rebuilt mid-stream stops the stream loudly — not because the output
    would be wrong (the plan owns its merges), but because silently
    serving a superseded tokenizer version mixes tokenizations across
    the corpus. Restart to serve the new vocab."""
    from hive_io_experimental_spark.input import HiveInput, ScanSpec
    from hive_io_experimental_spark.operators.similarity import _index_stamp

    def _validate(expect_build_id=None):
        inp = HiveInput(spark, catalog)
        meta = inp.read_table(
            ScanSpec(table=f"{vocab_table}_meta")
        ).first()
        if meta is None:
            raise ValueError(
                f"serve_bpe_segment_stream: empty meta table "
                f"{vocab_table}_meta — run bpe_build_vocab first"
            )
        if int(meta["n_merges"]) > 0:
            stamp = _index_stamp(
                "serve_bpe_segment_stream", vocab_table, "merges",
                inp.read_table(ScanSpec(table=vocab_table)),
                rebuild="bpe_build_vocab",
            )
            if stamp != meta["build_id"]:
                raise ValueError(
                    f"serve_bpe_segment_stream: vocab {vocab_table} has "
                    f"mixed build_id stamps (meta {meta['build_id']!r} "
                    f"vs merges {stamp!r}) — a rebuild was torn mid-way. "
                    f"Re-run bpe_build_vocab."
                )
        if (
            expect_build_id is not None
            and meta["build_id"] != expect_build_id
        ):
            raise ValueError(
                f"serve_bpe_segment_stream: vocab {vocab_table} was "
                f"REBUILT mid-stream (planned against build "
                f"{expect_build_id!r}, now {meta['build_id']!r}) — "
                f"serving on would silently mix tokenizer versions "
                f"across the corpus. Restart the stream to serve the "
                f"new vocab."
            )
        return meta["build_id"]

    planned_build = _validate()
    merges = bpe_load_vocab(spark, catalog, vocab_table)

    def _rank(batch_df: DataFrame) -> DataFrame:
        return _segment_with(batch_df, merges, text_col, id_col)

    return _serve_adc_stream(
        doc_stream.select(F.col(id_col), F.col(text_col)),
        planned_build, _validate, _rank, sink_fn,
        op="serve_bpe_segment_stream",
        batch_hint="bpe_segment_from_vocab",
        taint_hint="may mix tokenizer versions",
    )
