"""Streaming hybrid search: query batches arrive as a stream of
(query_id, terms array<string>, embedding), each micro-batch is served by
the BATCH fusion operator against the static corpus.

Why foreachBatch and not stream-static joins: the BM25 leg needs
per-batch vocabulary aggregations and per-query rank windows over its
candidates — none of which append-mode streaming can express. But hybrid
fusion is PER-QUERY: a query's fused top-k depends only on its own row
plus the static corpus, never on other queries, so serving each
micro-batch through ``hybrid_topk_rrf_batch`` on the batch's (closed)
query frame is row-identical to running the batch operator over the whole
query set at once — the equivalence every streaming module here proves in
pytest.

Scale notes: per trigger the lexical leg re-runs its corpus-sized stages
(tokenize, dl, the corpus aggregate) — the same static-side-re-read trade
streaming/similarity.py documents. The semantic leg's scale path is the
``sem_candidates_fn`` hook: pass a function that serves the batch's
queries from the PERSISTED LSH index (lsh_query_index — shuffle
equi-joins over the stored buckets, no broadcast guard, corpus plane
projection never recomputed), and the per-trigger semantic cost drops to
probed-bucket candidates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def serve_hybrid_topk_stream(
    query_stream: DataFrame,
    docs: DataFrame,
    embeddings: DataFrame,
    sink_fn,
    k: int = 10,
    rrf_k: int = 60,
    candidate_k: int = 50,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    query_vec_col: str = "embedding",
    sem_candidates_fn=None,
):
    """Wire the streaming hybrid pipeline and return the (unstarted)
    DataStreamWriter — callers pick the trigger/checkpoint and .start().

    ``sink_fn(ranked_df, epoch_id)`` receives each micro-batch's fused
    results ((query_id, doc_id, lex_rank, sem_rank, cosine, rrf_score),
    per-query top-k). ``sem_candidates_fn(batch_queries_df)`` optionally
    supplies the semantic leg's (query_id, neighbor_id, cosine)
    candidates — e.g. from the persisted LSH index — instead of the
    default guarded exact broadcast."""
    if not query_stream.isStreaming:
        raise ValueError(
            "serve_hybrid_topk_stream: query_stream is a batch frame — "
            "use hybrid_topk_rrf_batch for batch serving"
        )
    from hive_io_experimental_spark.operators.retrieval import (
        hybrid_topk_rrf_batch,
    )

    def _batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sem = sem_candidates_fn(batch_df) if sem_candidates_fn else None
        out = hybrid_topk_rrf_batch(
            docs, embeddings, batch_df,
            k=k, rrf_k=rrf_k, candidate_k=candidate_k,
            text_col=text_col, doc_id_col=doc_id_col,
            vec_col=vec_col, vec_id_col=vec_id_col,
            query_id_col=query_id_col, terms_col=terms_col,
            query_vec_col=query_vec_col, sem_candidates=sem,
        )
        sink_fn(out, epoch_id)

    return query_stream.writeStream.foreachBatch(_batch)
