"""Streaming ANN serving: query vectors arrive as a stream, candidates come
from the PERSISTED LSH bucket index via stream-static equi-joins.

The batch serving path (operators/similarity.py:lsh_query_index) is already
all lazy shuffle equi-joins; this module is its Structured Streaming twin —
the online half of the index lifecycle (build/append offline, serve online):

  queries (readStream)
    -> row-local bucket hash into the STORED plane family (one map, the
       exact lsh_bucket_expr the index was built with)
    -> Hamming-probe fan-out CARRYING the query vector (a stream-stream
       self-join would need watermarks and unbounded state; carrying the
       vector through the bounded x(1+planes[+C(planes,2)]) fan-out keeps
       the whole plan stream-static)
    -> equi-join against the static bucket table (candidates)
    -> equi-join against the static corpus (candidate vectors only)
    -> exact round-6 cosine rescore

Per-query top-k needs a rank, which Structured Streaming cannot express on
an unbounded stream (no window functions in append mode) — but each query's
candidate rows are confined to its arrival micro-batch by construction (the
fan-out never crosses batches), so the rank is exact per batch:
``lsh_topk_foreach_batch`` ranks inside foreachBatch with the same
(cosine desc, neighbor_id) total order as the batch operator, making
stream output row-identical to lsh_query_index over the same closed input
(the test strategy every streaming module here uses).

Scale notes: per micro-batch work is |batch| x num_planes dot products
(map-side), one shuffle join against the bucket table keyed by bucket, one
id-join to fetch candidate vectors, and a batch-local rank — the static
sides are re-read per trigger but never re-projected (the plane projection
lives in the stored index; Spark caches static-side file listings across
triggers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_io_experimental_spark.functions.vectors import l2_norm
from hive_io_experimental_spark.operators.similarity import (
    _as_double,
    _hamming_probe_buckets,
    _pair_cosine,
    lsh_bucket_expr,
)


def _validate_index_stamps(
    spark: SparkSession,
    catalog,
    index_table: str,
    expect_build_id: str | None,
    op: str = "lsh_candidates_stream",
):
    """The batch path's empty/pre-stamp/torn-rebuild fences over the
    stored LSH index, as a reusable probe: returns (meta_row, buckets_df)
    or raises. Two 1-row jobs (meta first(), one sampled bucket stamp) —
    cheap enough to run per micro-batch. ``expect_build_id`` additionally
    pins the stamps to the build the stream was PLANNED against: an index
    rebuilt mid-stream (even cleanly) must stop the stream, because the
    stored plane family changed under the query-side bucket hash baked
    into the plan. ``op`` names the raising entry point in every error."""
    from hive_io_experimental_spark.input import HiveInput, ScanSpec
    from hive_io_experimental_spark.operators.similarity import _index_stamp

    inp = HiveInput(spark, catalog)
    meta = inp.read_table(ScanSpec(table=f"{index_table}_meta")).first()
    if meta is None:
        raise ValueError(f"{op}: empty meta table {index_table}_meta")
    buckets = inp.read_table(ScanSpec(table=index_table))
    b_stamp = _index_stamp(
        op, index_table, "buckets", buckets, rebuild="lsh_build_index",
    )
    if b_stamp != meta["build_id"]:
        raise ValueError(
            f"{op}: index {index_table} has mixed "
            f"build_id stamps (meta {meta['build_id']!r} vs buckets "
            f"{b_stamp!r}) — a rebuild was torn mid-way. "
            f"Re-run lsh_build_index before serving."
        )
    if expect_build_id is not None and b_stamp != expect_build_id:
        raise ValueError(
            f"{op}: index {index_table} was REBUILT "
            f"mid-stream (planned against build {expect_build_id!r}, "
            f"now {b_stamp!r}) — the stream's query-side bucket hash is "
            f"bound to the old plane family. Restart the stream to serve "
            f"the new index."
        )
    return meta, buckets


def lsh_candidates_stream(
    spark: SparkSession,
    catalog,
    index_table: str,
    query_stream: DataFrame,
    corpus: DataFrame,
    probe_bits: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    _meta=None,
) -> DataFrame:
    """Streaming (query_id, neighbor_id, cosine): multiprobe candidates
    from the stored bucket table, exact-rescored — everything EXCEPT the
    per-query rank (see lsh_topk_foreach_batch / serve_lsh_topk_stream).

    The stored geometry (num_planes, dim, build_id) is probed once at
    plan-construction time from the meta table; a torn rebuild (mixed
    build_id stamps between meta and buckets) is refused exactly like the
    batch path. Snapshot semantics: the versioned read pins the PLANNED
    snapshot's manifest, so every micro-batch scans that snapshot's
    files — an APPEND mid-stream never changes (or tears) the served
    candidate set (pytest-pinned; restart to serve appended vectors),
    while a REBUILD deletes the planned files out from under the scan.
    Use serve_lsh_topk_stream (which re-validates the stamps around
    every batch) for long-running serving; a raw candidates stream has
    no mid-stream rebuild detection of its own.
    ``corpus`` supplies candidate vectors for the rescore and must be the
    corpus the index was built over (static frame).
    """
    if probe_bits not in (0, 1, 2):
        raise ValueError(f"probe_bits must be 0, 1 or 2, got {probe_bits}")
    if not query_stream.isStreaming:
        raise ValueError(
            "lsh_candidates_stream: query_stream is a batch frame — use "
            "lsh_query_index for batch serving"
        )
    if _meta is None:
        _meta, buckets = _validate_index_stamps(
            spark, catalog, index_table, expect_build_id=None
        )
    else:
        # caller (serve_lsh_topk_stream) already validated and passes its
        # meta snapshot through, so geometry and the pinned build_id come
        # from ONE read — a rebuild between two separate meta reads would
        # bake the old plane count into the plan while pinning the new
        # build_id, and every per-batch check would then pass while
        # serving wrong-geometry candidates
        from hive_io_experimental_spark.input import HiveInput, ScanSpec

        buckets = HiveInput(spark, catalog).read_table(
            ScanSpec(table=index_table)
        )
    meta = _meta
    num_planes, dim = int(meta["num_planes"]), int(meta["dim"])
    q = query_stream.select(
        F.col(id_col).alias("query_id"),
        _as_double(vec_col).alias("qv"),
        lsh_bucket_expr(num_planes, dim, vec_col).alias("bucket"),
    ).withColumn("qnrm", l2_norm(F.col("qv")))
    probes = q.select(
        "query_id", "qv", "qnrm",
        F.explode(
            F.array(*_hamming_probe_buckets(num_planes, probe_bits))
        ).alias("bucket"),
    )
    cand = (
        buckets.select(F.col("id").alias("neighbor_id"), "bucket")
        .join(probes, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
    ).withColumn("cnrm", l2_norm(F.col("cv")))
    return cand.join(c, "neighbor_id").select(
        "query_id", "neighbor_id",
        _pair_cosine("qv", "qnrm", "cv", "cnrm").alias("cosine"),
    )


def lsh_topk_foreach_batch(k: int, sink_fn):
    """The per-micro-batch rank step: returns a foreachBatch function that
    ranks the scored candidates with the batch operator's exact total
    order ((cosine desc, neighbor_id asc), rank <= k) and hands
    (ranked_df, epoch_id) to ``sink_fn``. Correct because a query's
    candidates never span micro-batches (the fan-out is row-local to the
    query's arrival batch)."""

    def _batch(df: DataFrame, epoch_id: int) -> None:
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
        ranked = df.withColumn(
            "rank", F.row_number().over(w).cast("long")
        ).filter(F.col("rank") <= k)
        sink_fn(ranked, epoch_id)

    return _batch


def serve_lsh_topk_stream(
    spark: SparkSession,
    catalog,
    index_table: str,
    query_stream: DataFrame,
    corpus: DataFrame,
    sink_fn,
    k: int = 10,
    probe_bits: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Wire the full online-serving pipeline and return the (unstarted)
    DataStreamWriter — callers pick the trigger/checkpoint and .start().
    Output rows are (query_id, neighbor_id, cosine, rank), row-identical
    to lsh_query_index over the same closed input.

    The stored index's stamps are re-validated INSIDE every micro-batch,
    both BEFORE the batch's rank+sink and again AFTER the sink returns
    (two fresh 1-row probes each side): the candidates plan pins the
    PLANNED snapshot's manifest, so a mid-stream REBUILD (drop +
    recreate) deletes the planned files out from under the scan — a
    plan-construction-time check alone would surface that as an opaque
    missing-file error at best, or stale-cache wrong-plane candidates
    at worst (r11 ADVICE). An APPEND, by contrast, keeps the build_id
    AND leaves the planned snapshot's files intact: the stream serves
    through it on the planned snapshot (snapshot isolation,
    pytest-pinned) and appended vectors become servable on restart. The pre-check alone
    was check-then-use: the bucket table is actually READ while the sink
    materializes the batch, so a rebuild landing between the check and
    the read could still serve one batch from the new plane family
    (r12 ADVICE). Stamps unchanged across the batch prove the read was
    consistent; a post-sink stamp change fails the streaming query
    loudly AND names the epoch whose already-sunk output must be
    discarded — at most one batch is exposed, never silently. Restart
    to serve the new build."""
    # ONE meta read supplies BOTH the plan geometry and the pinned
    # build_id (two separate reads left a window where a rebuild between
    # them baked the old plane count into the plan while pinning the NEW
    # build_id — the per-batch checks would then pass forever while
    # serving wrong-geometry candidates)
    meta, _ = _validate_index_stamps(
        spark, catalog, index_table, expect_build_id=None,
        op="serve_lsh_topk_stream",
    )
    scored = lsh_candidates_stream(
        spark, catalog, index_table, query_stream, corpus,
        probe_bits=probe_bits, vec_col=vec_col, id_col=id_col,
        _meta=meta,
    )
    planned_build = meta["build_id"]
    ranked = lsh_topk_foreach_batch(k, sink_fn)

    def _checked_batch(df: DataFrame, epoch_id: int) -> None:
        _validate_index_stamps(
            spark, catalog, index_table, expect_build_id=planned_build,
            op="serve_lsh_topk_stream",
        )
        ranked(df, epoch_id)
        # post-sink revalidation: the pre-check was check-then-use (the
        # bucket table is re-read while ranked() materializes the batch),
        # so a rebuild landing mid-batch could serve THIS batch from the
        # wrong plane family with the pre-check green. Unchanged stamps
        # across the batch prove the read was consistent; a change here
        # fails loudly naming the epoch whose sunk output is suspect.
        try:
            _validate_index_stamps(
                spark, catalog, index_table,
                expect_build_id=planned_build,
                op="serve_lsh_topk_stream",
            )
        except ValueError as exc:
            raise ValueError(
                f"serve_lsh_topk_stream: index {index_table} changed "
                f"WHILE micro-batch {epoch_id} was being served — the "
                f"output already sunk for this epoch may mix plane "
                f"families and should be discarded. ({exc})"
            ) from exc

    return scored.writeStream.foreachBatch(_checked_batch)
