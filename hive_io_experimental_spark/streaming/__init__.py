"""Structured Streaming operators over event streams.

The reference is batch-only (SURVEY §2.2: no streaming); this package adds
the streaming surface a modern pipeline expects, with batch twins in
operators/relational.py so every streaming semantics is oracle-checkable in
batch mode (stream-batch equivalence is the test strategy).
"""

from hive_io_experimental_spark.streaming.windows import (
    read_events_stream,
    windowed_event_counts,
)
from hive_io_experimental_spark.streaming.sessions import sessionize_stateful
from hive_io_experimental_spark.streaming.joins import signup_purchase_stream_join
from hive_io_experimental_spark.streaming.lsh import (
    minhash_band_stream,
    minhash_lsh_dedup_stream,
)
from hive_io_experimental_spark.streaming.topk import (
    latest_topk,
    topk_stateful,
)
from hive_io_experimental_spark.streaming.similarity import (
    lsh_candidates_stream,
    serve_ivf_pq_topk_stream,
    serve_lsh_topk_stream,
    serve_pq_topk_stream,
)
from hive_io_experimental_spark.streaming.classify import (
    serve_nb_score_stream,
)
from hive_io_experimental_spark.streaming.tokenize import (
    serve_bpe_segment_stream,
)

__all__ = [
    "lsh_candidates_stream",
    "serve_lsh_topk_stream",
    "serve_pq_topk_stream",
    "serve_ivf_pq_topk_stream",
    "serve_nb_score_stream",
    "serve_bpe_segment_stream",
    "read_events_stream",
    "windowed_event_counts",
    "sessionize_stateful",
    "signup_purchase_stream_join",
    "minhash_band_stream",
    "minhash_lsh_dedup_stream",
    "topk_stateful",
    "latest_topk",
]
