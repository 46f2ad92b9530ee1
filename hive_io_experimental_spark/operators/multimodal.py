"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (the part that matters at 100 TB):
  * media rides in an opaque ``binary`` column next to typed metadata
    columns — parquet stores it page-compressed, Spark never interprets it;
  * decode/feature steps are ``mapInPandas`` stages: Arrow-batched,
    per-partition, zero shuffle — the pipeline shape is scan -> decode ->
    filter/aggregate, and only the (tiny) extracted features ever shuffle;
  * batch size is controlled by ``spark.sql.execution.arrow.maxRecordsPerBatch``
    so a partition of large blobs never materializes at once.

The actual image/audio codecs are NOT present in this environment, so the
byte-level decode is a clearly-marked deterministic fake
(:func:`fake_decode_header`) with the real Spark-side plumbing — schema,
batching, partitioning — fully exercised. Swapping in PIL/ffmpeg is a
one-function change inside the mapInPandas closure.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hive_io_experimental_spark.functions.partitioning import spread

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, channels int, format string"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column (UTF-8 bytes of the text).

    Stand-in for real media bytes: gives the decode stage a genuine
    ``binary``-typed column with per-row variable length.
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def fake_decode_header(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in for an image-header decode.

    REAL DECODERS NOT AVAILABLE IN THIS ENVIRONMENT — this derives plausible
    (width, height, channels, format) purely from the byte content, so tests
    and oracles are deterministic. Replace with e.g. PIL.Image.open for real
    data; the surrounding plumbing does not change.
    """
    n = len(payload)
    width = n % 64 + 16
    height = (n // 64) % 64 + 16
    channels = 3
    fmt = "png" if n % 2 == 0 else "jpeg"
    return width, height, channels, fmt


def decode_media_metadata(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched decode stage: binary payload -> typed metadata columns.

    mapInPandas keeps this a narrow (no-shuffle) stage; each batch is a
    pandas DataFrame of (id, payload) and the decoder runs per row within
    the batch — exactly where PIL/libvips/ffmpeg calls would go.
    """
    cols = spread(df).select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    )

    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # Vectorized twin of fake_decode_header: the fake's header math
            # is pure arithmetic on payload length, so compute it as numpy
            # column ops instead of a per-row Python loop. A REAL codec
            # (PIL/libvips) is inherently per-row — swap this block for
            # `[real_decode(p) for p in pdf["payload"]]` then.
            n = pdf["payload"].str.len().to_numpy(dtype=np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "width": (n % 64 + 16).astype(np.int32),
                    "height": ((n // 64) % 64 + 16).astype(np.int32),
                    "channels": np.full(len(n), 3, dtype=np.int32),
                    "format": np.where(n % 2 == 0, "png", "jpeg"),
                }
            )

    return cols.mapInPandas(decode, DECODE_SCHEMA)


FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, n_distinct_bytes int, mean_byte double, "
    "byte_entropy double"
)


def extract_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Feature-extraction stage: binary payload -> numeric feature columns.

    The byte-level statistics (count/distinct/mean/Shannon entropy) stand in
    for a real embedding/feature model — the pipeline shape is the real one:
    Arrow-batched mapInPandas, numpy per batch, zero shuffle, only the small
    feature vectors flow downstream. Entropy is the classic cheap filter for
    corrupt/compressed/encrypted payloads in ingest pipelines.
    """
    import numpy as np

    cols = spread(df).select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    )

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_rows = len(pdf)
            if n_rows == 0:
                continue
            # Vectorized over the whole Arrow batch: concatenate payloads,
            # build a (row, byte) histogram with ONE bincount on the fused
            # index, then derive all four features as column math — no
            # per-row Python loop (same fix as the decode stage).
            lens = pdf["payload"].str.len().to_numpy(dtype=np.int64)
            all_bytes = np.frombuffer(
                b"".join(pdf["payload"]), dtype=np.uint8
            ).astype(np.int64)
            row_idx = np.repeat(np.arange(n_rows), lens)
            counts = np.bincount(
                row_idx * 256 + all_bytes, minlength=n_rows * 256
            ).reshape(n_rows, 256)
            present = counts > 0
            safe_n = np.maximum(lens, 1)
            probs = counts / safe_n[:, None]
            with np.errstate(divide="ignore", invalid="ignore"):
                plogp = np.where(present, probs * np.log2(probs), 0.0)
            # round to 6 (the engine's float-output convention, same as
            # jaccard/cosine) so the DuckDB oracle twin hash-matches the
            # float sums; `+ 0.0` folds IEEE -0.0 (single-byte docs) to 0.0
            entropy = np.round(-plogp.sum(axis=1), 6) + 0.0
            mean_byte = np.where(
                lens > 0,
                np.round(
                    (counts * np.arange(256)[None, :]).sum(axis=1) / safe_n, 6
                ),
                np.nan,  # -> SQL NULL below: no bytes to average
            )
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": lens,
                    "n_distinct_bytes": present.sum(axis=1).astype(np.int32),
                    "mean_byte": mean_byte,
                    "byte_entropy": entropy,
                }
            )
            out.loc[lens == 0, "mean_byte"] = None
            yield out

    return cols.mapInPandas(features, FEATURES_SCHEMA)


def resize_plan(
    decoded: DataFrame, max_side: int = 32
) -> DataFrame:
    """Compute resize targets (the metadata half of a resize stage).

    Pure column math over the decoded metadata — demonstrates that once
    features are extracted, everything downstream is plain JVM-side SQL.
    Returns scale factor and target dims, aspect-ratio preserved.
    """
    scale = F.round(
        F.least(
            F.lit(max_side) / F.col("width"),
            F.lit(max_side) / F.col("height"),
            F.lit(1.0),
        ),
        6,
    )
    return decoded.select(
        "doc_id",
        "width",
        "height",
        scale.alias("scale"),
        F.floor(F.col("width") * scale).cast("int").alias("target_width"),
        F.floor(F.col("height") * scale).cast("int").alias("target_height"),
    )


def frame_sample_plan(
    df: DataFrame, n_frames: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic frame-sampling plan for video-like payloads.

    Emits (doc_id, frame_index) rows — fps/duration are faked from payload
    length (real decoders would supply them); the explode pattern is the
    real one: sampling plans stay relational so downstream stages
    parallelize per frame.
    """
    n_bytes = F.length(F.col("payload"))
    duration_s = n_bytes % 300 + 1  # fake: derive a duration from content
    step = F.greatest(F.floor(duration_s / n_frames), F.lit(1)).cast("long")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(n_frames - 1).cast("long"))
        ).alias("frame_slot"),
        step.alias("step_s"),
    ).select(
        "doc_id",
        "frame_slot",
        (F.col("frame_slot") * F.col("step_s")).alias("frame_time_s"),
    )


# ---------------------------------------------------------------------------
# content-defined chunking: binary-level dedup units
# ---------------------------------------------------------------------------

CDC_SCHEMA = (
    "doc_id long, chunk_idx long, start long, length long, chunk_hash string"
)


def cdc_chunks(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    window: int = 8,
    base: int = 31,
    mask: int = 63,
) -> DataFrame:
    """Content-defined chunk boundaries + chunk fingerprints per payload.

    The binary counterpart of the text span pass: fixed-offset chunking
    breaks on any byte insertion, so storage/transfer dedup systems cut
    chunks where a ROLLING HASH of the trailing ``window`` bytes hits a
    mask (content-defined chunking; public rsync/LBFS lineage) — an
    inserted byte only reshapes the chunks it touches, and identical
    regions elsewhere keep identical fingerprints.

    Deterministic, engine-portable formulation: H(p) = sum_{i=0}^{w-1}
    b[p-i] * base^i (exact int64 — no modular wraparound at these sizes),
    a cut lands AFTER every position where H % (mask+1) == 0, and the
    chunk fingerprint is md5 of the chunk's UPPERCASE HEX (portable to
    the SQL twin, which cannot md5 blob slices). Average chunk length ~=
    mask+1 bytes. No min/max chunk clamps: those need a sequential scan
    state that breaks position-locality; at ingest scale, clamp by
    re-chunking oversized chunks downstream if needed.

    Execution shape: Arrow-batched mapInPandas, numpy rolling hash per
    payload (the right granularity — real media payloads are MBs), zero
    shuffle; only (offsets, 32-char hash) rows flow out. A payload
    shorter than ``window`` (or empty) is one chunk.
    """
    import numpy as np

    cols = spread(df).select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    )
    weights = None

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        nonlocal weights
        if weights is None:
            weights = np.array(
                [base ** (window - 1 - j) for j in range(window)],
                dtype=np.int64,
            )
        for pdf in batches:
            ids, idxs, starts, lengths, hashes = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                if n >= window:
                    a = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                    h = (
                        np.lib.stride_tricks.sliding_window_view(a, window)
                        @ weights
                    )
                    # h[j] is H(p) at p = j + window - 1
                    cut_after = np.nonzero(h % (mask + 1) == 0)[0] + window
                    cuts = cut_after[cut_after < n]
                    st = np.concatenate(([0], cuts))
                else:
                    st = np.array([0], dtype=np.int64)
                en = np.concatenate((st[1:], [n]))
                hexs = b.hex().upper()
                for i, (s, e) in enumerate(zip(st, en)):
                    ids.append(doc_id)
                    idxs.append(i)
                    starts.append(int(s))
                    lengths.append(int(e - s))
                    hashes.append(
                        hashlib.md5(
                            hexs[2 * s : 2 * e].encode("ascii")
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "chunk_idx": idxs,
                    "start": starts,
                    "length": lengths,
                    "chunk_hash": hashes,
                }
            )

    return cols.mapInPandas(chunk, CDC_SCHEMA)


def cdc_dedup_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    window: int = 8,
    base: int = 31,
    mask: int = 63,
) -> DataFrame:
    """One-row binary-dedup accounting over content-defined chunks.

    (n_chunks, n_dup_occurrences, dup_bytes, total_bytes) where a chunk
    occurrence is "dup" when its fingerprint appears in >= 2 DISTINCT
    payloads — dup_bytes is what chunk-level storage dedup would not
    store twice. All integers; one groupBy-on-hash shuffle."""
    # ch feeds three plan branches (dup groupBy, the semi join, totals)
    # with non-identical downstream shuffles, so the Arrow-batched
    # chunking map re-ran per branch after the r5 persist removal (1.69x,
    # BENCH_r06). reuse() materializes the chunk table once,
    # operator-scoped (functions/reuse.py; hiveio.reuse.strategy).
    from hive_io_experimental_spark.functions.reuse import reuse

    ch = reuse(cdc_chunks(df, payload_col, id_col, window, base, mask))
    dup = (
        ch.groupBy("chunk_hash")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("chunk_hash")
    )
    marked = ch.join(dup, "chunk_hash", "left_semi")
    return (
        ch.agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("length").cast("long").alias("total_bytes"),
        )
        .crossJoin(
            F.broadcast(
                marked.agg(
                    F.count(F.lit(1)).alias("n_dup_occurrences"),
                    F.coalesce(F.sum("length"), F.lit(0))
                    .cast("long")
                    .alias("dup_bytes"),
                )
            )
        )
        .select("n_chunks", "n_dup_occurrences", "dup_bytes", "total_bytes")
    )
