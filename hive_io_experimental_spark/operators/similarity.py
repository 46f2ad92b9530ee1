"""Similarity search over embedding columns (array<float>).

Two tiers, matching how real vector pipelines scale:

  cosine_topk             exact brute-force top-k: queries x corpus theta-join,
                          cosine JVM-side, window rank. The correctness
                          baseline; cost O(|Q| * |corpus|), fine when |Q| is
                          small or the corpus fits a broadcast.
  hyperplane_lsh_buckets  random-hyperplane LSH bucketing: the scale path.
                          Bucket key = sign bits of dot(v, plane_i). Search
                          within buckets only -> candidate set shrinks by
                          ~2^planes; planes are derived deterministically
                          from md5 so results are portable/oracle-checkable.
  cosine_topk_bucketed    top-k restricted to LSH-bucket collisions.

At 100 TB: broadcast the query set (it is always the small side), never the
corpus; bucket join keys are (plane-bits), evenly distributed by
construction. A numpy/Arrow batched variant (mapInPandas, BLAS dot products)
is provided for wide-embedding workloads where per-element codegen loses to
vectorized C — switch via ``use_pandas=True``.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hive_io_experimental_spark.functions.partitioning import spread
from hive_io_experimental_spark.functions.vectors import dot_product, l2_norm


def _as_double(vec_col: str):
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _pair_cosine(a_vec: str, a_nrm: str, b_vec: str, b_nrm: str):
    """Cosine from precomputed norms: per-pair work is one fold (the cross
    dot); norms are computed once per vector, with the same sequential fold
    the oracle uses, so results stay bit-identical. try_divide: a zero-norm
    vector yields NULL cosine instead of an ANSI divide-by-zero error."""
    return F.round(
        F.try_divide(
            dot_product(F.col(a_vec), F.col(b_vec)),
            F.col(a_nrm) * F.col(b_nrm),
        ),
        6,
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_pandas: bool = False,
) -> DataFrame:
    """Exact top-k nearest corpus vectors per query vector, by cosine.

    Returns (query_id, neighbor_id, cosine, rank), self-matches excluded.
    The join broadcasts the query side explicitly — queries << corpus is
    the contract, ENFORCED (> _MAX_BROADCAST_QUERIES raises, pointing at
    cosine_topk_bucketed), and it keeps the corpus scan shuffle-free.
    The guard makes construction EAGER (one bounded limit+count job runs
    before the plan is returned) and incompatible with a streaming
    ``queries`` frame — see _require_small_query_side; use
    cosine_topk_bucketed (lazy, no broadcast) where that matters.
    """
    c = spread(corpus).select(F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"))
    if use_pandas:
        return _cosine_topk_pandas(c, q, k)
    _require_small_query_side(q, "cosine_topk")
    c = c.withColumn("cnrm", l2_norm(F.col("cv")))
    q = q.withColumn("qnrm", l2_norm(F.col("qv")))
    cos = _pair_cosine("qv", "qnrm", "cv", "cnrm")
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


# Cap on driver-collected/broadcast query vectors for EVERY broadcast
# top-k path — pandas closure AND the JVM F.broadcast(q) joins. An explicit
# broadcast hint bypasses autoBroadcastJoinThreshold, so without this check
# a large query side turns into an executor OOM instead of a helpful error
# (~64 KB/vector at dim 64 -> ~4 GB worst case is already too big).
# Reference discipline: strict precondition checks before work
# (output/HiveApiOutputFormat.java:240-262).
_MAX_BROADCAST_QUERIES = 65_536


def _require_small_query_side(
    q: DataFrame,
    caller: str,
    cap: int | None = None,
    escape: str = "cosine_topk_bucketed or quantized_cosine_topk_bucketed",
) -> None:
    """Enforce the queries-<<-corpus contract before broadcasting.

    limit(cap+1).count() stops the scan as soon as the cap is disproved,
    so the guard costs one bounded job, never a full count of a large
    query frame. NOTE: that one job makes every caller EAGER — building
    the plan runs Spark work, and a streaming query frame (which cannot
    be counted) is rejected outright. That is deliberate: the guarded
    paths collect/broadcast the query side, which is equally impossible
    on a stream. Streaming callers route per-microbatch frames through
    these operators inside foreachBatch, or use the *_bucketed variants
    (no broadcast, no guard, fully lazy).

    ``cap`` overrides the default limit for callers whose broadcast
    payload is a MULTIPLE of the query row count (multi-probe fan-out
    broadcasts queries x (1 + probes) rows, so its effective cap is the
    default divided by the fan-out); ``escape`` names the no-broadcast
    operator the error should route large query sets to."""
    limit = _MAX_BROADCAST_QUERIES if cap is None else max(1, cap)
    n_q = q.limit(limit + 1).count()
    if n_q > limit:
        raise ValueError(
            f"{caller} broadcasts the query side to every task; got > "
            f"{limit} query vectors. Use {escape} "
            f"(LSH candidate generation, no broadcast) for large query "
            f"sets."
        )


def _cosine_topk_pandas(c: DataFrame, q: DataFrame, k: int) -> DataFrame:
    """Arrow-batched exact top-k: numpy matmul per corpus partition.

    The query matrix rides along as a broadcast-joined literal-free pattern:
    collected once on the driver (queries are small by contract) and closed
    over — each executor computes Q x batch^T with BLAS. The contract is
    ENFORCED: more than ``_MAX_BROADCAST_QUERIES`` queries raises before
    anything is collected — use :func:`cosine_topk_bucketed` for large
    query sets.
    """
    import numpy as np

    _require_small_query_side(q, "cosine_topk(use_pandas=True)")
    q_rows = q.collect()
    q_ids = np.array([r["query_id"] for r in q_rows])
    q_mat = np.array([r["qv"] for r in q_rows], dtype=np.float64)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    spark = c.sparkSession

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_mat = np.array(list(pdf["cv"]), dtype=np.float64)
            c_norm = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = q_norm @ c_norm.T  # |Q| x |batch|
            n_ids = pdf["neighbor_id"].to_numpy()
            for qi, qid in enumerate(q_ids):
                mask = n_ids != qid
                yield pd.DataFrame(
                    {
                        "query_id": qid,
                        "neighbor_id": n_ids[mask],
                        "cosine": np.round(sims[qi][mask], 6),
                    }
                )

    scored = c.mapInPandas(
        score, "query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


# ---------------------------------------------------------------------------
# LSH bucketing
# ---------------------------------------------------------------------------

def _plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random +-1 for (plane, dim) from one md5 bit.

    Portable: DuckDB computes the identical value from the same formula, so
    bucket assignments are oracle-checkable. Bit source: low bit of the
    first hex char of md5('<plane>:<dim>').
    """
    import hashlib

    nib = int(hashlib.md5(f"{plane}:{dim}".encode()).hexdigest()[0], 16)
    return 1.0 if nib & 1 == 1 else -1.0


def hyperplane_lsh_buckets_pandas(
    df: DataFrame,
    num_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """BLAS twin of :func:`hyperplane_lsh_buckets` for wide embeddings.

    Identical bucket assignments (same md5-derived plane matrix, and
    sign(dot) is exact for both summation orders here because the planes
    are ±1 and the margin from zero is far above float noise for real
    data — verified by the equivalence test), but computed as one Arrow
    batch matmul per partition: |batch| x dim @ dim x planes. Wins over
    per-element codegen once dim x planes is large (the HOF fold runs
    interpreted); still a pure map — zero shuffle at any scale.
    """
    import numpy as np

    if dim is None:
        dim = df.select(F.size(F.col(vec_col))).first()[0]
    planes = np.array(
        [[_plane_component(p, d) for p in range(num_planes)] for d in range(dim)],
        dtype=np.float64,
    )  # dim x planes — a few KB closed over, broadcast with the task
    weights = (1 << np.arange(num_planes)).astype(np.int64)

    def bucketize(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(list(pdf["v"]), dtype=np.float64)
            bits = (mat @ planes) >= 0  # |batch| x planes
            yield pd.DataFrame(
                {"id": pdf["id"], "bucket": bits @ weights}
            )

    v = spread(df).select(
        F.col(id_col).alias("id"), _as_double(vec_col).alias("v")
    )
    return v.mapInPandas(bucketize, "id long, bucket long")


# Auto-sized LSH: with a FIXED plane count, bucket occupancy grows
# linearly with the corpus, so within-bucket pair work grows as
# n^2 / 2^planes — quietly quadratic at scale (measured: knn_label_accuracy
# was the worst gate at 100x data before auto-sizing, BENCH_SCALING_100X).
_LSH_MIN_PLANES = 8        # floor: never fewer buckets than the r7 dial
_LSH_TARGET_BUCKET_SIZE = 64  # ~64 bucket-mates: plenty of candidates for
#   k<=10 top-k / k-NN votes, and within-bucket pair work stays ~64n
#   (e.g. n=1e9 -> 24 planes, 16M buckets, 6.4e10 distributed pairs —
#   versus n^2/256 = 3.9e15 at the old fixed dial)


def resolve_num_planes(n: int, min_planes: int = _LSH_MIN_PLANES,
                       target_bucket_size: int = _LSH_TARGET_BUCKET_SIZE) -> int:
    """Scale-aware hyperplane count: max(min_planes, ceil(log2(n/target))).

    Keeps expected bucket occupancy near ``target_bucket_size`` as the
    corpus grows, so within-bucket pair work stays ~n * target instead of
    n^2 / 2^min_planes. Clamped at 30 planes (2^30 buckets is beyond any
    realistic corpus/target ratio; the clamp just guards the int shift).
    """
    import math

    if n <= target_bucket_size:
        return min_planes
    return min(30, max(min_planes, math.ceil(math.log2(n / target_bucket_size))))


def hyperplane_lsh_buckets(
    df: DataFrame,
    num_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_pandas: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """(id, bucket) — sign-of-dot-product LSH bucket per vector.

    bucket = sum over planes of 2^i * [dot(v, plane_i) >= 0]. The plane
    matrix is derived ONCE on the driver (a few KB of +-1 literals baked
    into the plan — an earlier formulation computed the md5-derived
    component inside the per-element lambda: |corpus| x planes x dim
    interpreted md5 calls, 6x slower) and the per-vector work is just the
    fold; at 100 TB this is a pure map over the corpus with zero shuffle.
    The fold is left-to-right, bit-identical to the oracle's
    list_dot_product. Vector dim is probed from the first row (embedding
    columns are fixed-width by contract) unless the caller passes ``dim``
    — operators that bucket two frames with one shared layout probe once
    and pass it to both calls, saving a scheduled job per call.
    ``use_pandas=True`` switches to the Arrow/BLAS twin
    (:func:`hyperplane_lsh_buckets_pandas`) for wide embeddings — same
    buckets, vectorized matmul instead of the fold.
    """
    if use_pandas:
        return hyperplane_lsh_buckets_pandas(
            df, num_planes, vec_col, id_col, dim=dim
        )
    df = spread(df)
    if dim is None:
        dim = df.select(F.size(F.col(vec_col))).first()[0]
    return df.select(
        F.col(id_col).alias("id"),
        lsh_bucket_expr(num_planes, dim, vec_col).alias("bucket"),
    )


def lsh_bucket_expr(num_planes: int, dim: int, vec_col: str = "embedding"):
    """The LSH bucket as a single column EXPRESSION — the reusable core of
    hyperplane_lsh_buckets, exposed so stream-side bucketing (which must
    keep the vector column alongside and cannot probe/repartition) hashes
    queries into the exact same family.

    One literal plane array per plane + a zip_with/aggregate fold. (Two
    rejected alternatives, measured at sf0.1: md5-per-(plane,dim) inside
    the lambda = 1M interpreted md5 calls, 6x slower; fully unrolled
    512-term element_at expression = codegen blowup, 3x slower than the
    fold. The fold's 1M interpreted multiply-adds are the cheapest seat.)
    """
    v = _as_double(vec_col)
    bucket = None
    for p in range(num_planes):
        plane = F.array(*[F.lit(_plane_component(p, d)) for d in range(dim)])
        dot = F.aggregate(
            F.zip_with(v, plane, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        bit = F.when(dot >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bit if bucket is None else bucket + bit
    return bucket


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    centroid_stride: int = 50,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_pandas: bool = True,
) -> DataFrame:
    """IVF-flat approximate top-k: inverted-file search with a deterministic
    coarse quantizer.

    Index structure (the FAISS IVF shape, built relationally):
      1. centroids = corpus vectors with id % centroid_stride == 0 — a
         deterministic sample as the coarse quantizer (a trained KMeans
         would drop in here; the sampled quantizer keeps the whole operator
         oracle-checkable in SQL and needs no iterative fit).
      2. every corpus vector is assigned to its nearest centroid (max
         cosine, ties to the lowest centroid id) -> the inverted lists.
      3. each query probes its ``nprobe`` nearest centroids and scores only
         those lists -> candidates shrink by ~ncentroids/nprobe.

    Scale notes: the assignment step is |corpus| x |centroids| — it runs
    BY DEFAULT as a mapInPandas BLAS pass against broadcast centroids
    (same shape as embedding_neardup's candidate stage, zero corpus-side
    shuffle); ``use_pandas=False`` selects the relational form, which
    keeps every intermediate oracle-checkable and serves as the
    cross-check tier. Search is an equi-join on centroid id: no theta
    join anywhere.
    """
    cents = corpus.filter(F.col(id_col) % centroid_stride == 0).select(
        F.col(id_col).alias("cid"), _as_double(vec_col).alias("cv")
    )
    return _ivf_search(
        corpus, queries, cents, k, nprobe, vec_col, id_col, use_pandas
    )


def ivf_topk_trained(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    seed: int = 7,
    max_iter: int = 10,
    sample_per_centroid: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-flat with a KMeans-TRAINED coarse quantizer (the quality path).

    ``sample_per_centroid`` defaults from the session conf
    (hiveio.similarity.sample_per_centroid).

    Same index/search shape as :func:`ivf_topk`, but the centroids come from
    spherical k-means trained on a bounded, deterministic corpus sample.
    Iterative fitting is not SQL-expressible, so this operator has NO DuckDB
    oracle — tests bound its recall against the brute-force baseline instead
    (the honest check for an ANN index).

    Training design (the FAISS shape, and the right one at 100 TB): the
    quantizer is fit on at most ``sample_per_centroid * n_centroids``
    vectors — pulled with a deterministic hash-stride filter (one narrow
    scan), trained DRIVER-LOCAL with numpy, and the resulting few-KB
    centroid table broadcast back. Coarse quantizers converge on tiny
    samples; running the Lloyd iterations as cluster jobs (the previous
    formulation, via pyspark.ml) pays per-iteration job-scheduling overhead
    that dwarfs the arithmetic at any sample size (54 s -> sub-second).
    Spherical (unit-normalized, cosine-assignment) k-means matches the
    cosine search metric.
    """
    cent_df = fit_spherical_kmeans(
        corpus, n_centroids, seed, max_iter, sample_per_centroid,
        vec_col, id_col,
    )
    return _ivf_search(corpus, queries, cent_df, k, nprobe, vec_col, id_col)


def fit_spherical_kmeans(
    corpus: DataFrame,
    n_centroids: int = 8,
    seed: int = 7,
    max_iter: int = 10,
    sample_per_centroid: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Train the IVF coarse quantizer; returns (cid, cv array<double>).

    Bounded, deterministic: at most ``sample_per_centroid * n_centroids``
    vectors reach the driver (hash-stride sample, id-sorted so the fit is
    independent of scan order), Lloyd iterations run driver-local in
    numpy, and the output is a few-KB DataFrame ready to broadcast or
    persist (see ivf_build_index). See ivf_topk_trained for the design
    rationale.
    """
    import numpy as np

    from hive_io_experimental_spark import conf as _conf

    if sample_per_centroid is None:
        sample_per_centroid = _conf.IVF_SAMPLE_PER_CENTROID.get(
            corpus.sparkSession
        )

    n = corpus.count()  # one probe job (metadata-cheap only on a raw scan)
    target = sample_per_centroid * n_centroids
    stride = max(1, n // max(target, 1))
    train = corpus
    if stride > 1:
        # deterministic pseudo-random sample: ~n/stride rows, no shuffle
        train = train.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(stride)) == 0
        )
    pdf = (
        train.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
        .toPandas()
        .sort_values("id")  # row order independence -> deterministic fit
    )
    mat = np.array(list(pdf["v"]), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    unit = np.divide(mat, norms, out=np.zeros_like(mat), where=norms != 0)

    rng = np.random.RandomState(seed)
    cents = unit[rng.choice(len(unit), size=min(n_centroids, len(unit)),
                            replace=False)].copy()
    for _ in range(max_iter):
        assign = np.argmax(unit @ cents.T, axis=1)
        for c in range(len(cents)):
            members = unit[assign == c]
            if len(members) == 0:  # dead centroid: reseed deterministically
                cents[c] = unit[rng.randint(len(unit))]
                continue
            m = members.mean(axis=0)
            nm = np.linalg.norm(m)
            if nm > 0:
                cents[c] = m / nm

    spark = corpus.sparkSession
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cid long, cv array<double>",
    )


def ivf_build_index(
    spark,
    catalog,
    index_table: str,
    corpus: DataFrame,
    n_centroids: int = 8,
    seed: int = 7,
    max_iter: int = 10,
    sample_per_centroid: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Train and PERSIST an IVF coarse quantizer as a catalog table.

    The index lifecycle a warehouse needs: train once (expensive-ish scan
    + driver fit), store the few-KB centroid table under the catalog's
    write policies, then serve any number of queries from the stored
    quantizer without refitting (ivf_query_index). Rebuilding after
    corpus drift is just calling this again with drop semantics — the
    snapshot/versioning machinery applies to index tables like any other
    table. (FAISS persists its quantizer inside the index file; a
    catalog-registered table is this engine's equivalent, and keeps the
    index queryable AS DATA — auditable with plain SQL.)

    Deliberately NO append sibling (unlike lsh/pq/ivf_pq_append_to_
    index): this tier's only persisted artifact is the quantizer, and
    serving (ivf_query_index) takes the corpus as data — corpus growth
    costs nothing here. What ages is quantizer QUALITY as the
    distribution drifts; embedding_centroid_drift monitors that, and
    the answer is an explicit retrain, not an append.
    """
    from pyspark.sql import types as T

    from hive_io_experimental_spark.output import HiveOutput, WriteSpec
    from hive_io_experimental_spark.schema import HiveTableSchema

    cents = fit_spherical_kmeans(
        corpus, n_centroids, seed, max_iter, sample_per_centroid,
        vec_col, id_col,
    )
    # rebuild = drop + recreate: the unpartitioned write path enforces the
    # reference's table-must-be-empty precondition, so index refreshes go
    # through an explicit drop — never a silent in-place overwrite
    if catalog.table_exists(index_table):
        catalog.drop_table(index_table, delete_data=True)
    catalog.create_table(
        index_table,
        HiveTableSchema((
            ("cid", T.LongType()),
            ("cv", T.ArrayType(T.DoubleType())),
        )),
    )
    HiveOutput(spark, catalog).write_table(WriteSpec(table=index_table), cents)


def ivf_query_index(
    spark,
    catalog,
    index_table: str,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k search against a quantizer persisted by ivf_build_index."""
    from hive_io_experimental_spark.input import HiveInput, ScanSpec

    cents = HiveInput(spark, catalog).read_table(ScanSpec(table=index_table))
    return _ivf_search(corpus, queries, cents, k, nprobe, vec_col, id_col)


def ivf_recall_check(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    seed: int = 7,
    max_iter: int = 10,
    min_avg_recall: float = 0.5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Cross-engine invariant for the trained-IVF path: k-means centroids
    are not SQL-expressible, but the index's QUALITY CONTRACT is — the
    IVF top-k must recover at least ``min_avg_recall`` of the exact
    brute-force top-k. Returns ONE row an exact-SQL oracle reproduces:

      n_queries       — query vectors (exact, both engines);
      n_exact_results — n_queries * k, the recall denominator (exact —
                        the brute-force path always fills k for any
                        corpus with >= k non-self vectors);
      recall_ok       — TRUE iff micro-averaged recall@k >= the floor
                        (invariant; a degraded quantizer flips it and
                        the gate hash-fails).

    Runs BOTH the approximate and the exact search, so the gate times the
    full quality-audit workload, not a toy.
    """
    approx = ivf_topk_trained(
        corpus, queries, k, n_centroids, nprobe, seed, max_iter,
        vec_col=vec_col, id_col=id_col,
    ).select("query_id", "neighbor_id")
    exact = cosine_topk(corpus, queries, k, vec_col, id_col).select(
        "query_id", "neighbor_id"
    )
    joined = exact.join(
        approx.withColumn("_hit", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    )
    return joined.agg(
        F.countDistinct("query_id").cast("long").alias("n_queries"),
        F.count(F.lit(1)).cast("long").alias("n_exact_results"),
        (
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            / F.count(F.lit(1))
            >= F.lit(min_avg_recall)
        ).alias("recall_ok"),
    )


def ivf_sq8_recall_check(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    centroid_stride: int = 50,
    nprobe: int = 2,
    min_avg_recall: float = 0.5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall audit for the COMPOSED IVF-SQ8 path (ivf_quantized_topk)
    against the fp32 exact brute-force top-k — the number the int8
    brute/bucketed tier already has (quantization_quality_report) but
    for the tier that stacks IVF pruning on top of quantization, so a
    recall loss from EITHER stage (too-narrow nprobe, quantizer drift)
    shows up in one row.

    Unlike ivf_recall_check (trained k-means, invariant-only oracle),
    every stage here is SQL-expressible — sampled coarse quantizer,
    deterministic assignment, exact int64 code scoring — so the DuckDB
    twin reproduces the EXACT hit count, not just the pass/fail bit:

      n_queries       — query vectors (exact);
      n_exact_results — n_queries * k, the recall denominator (exact);
      n_hits          — exact-top-k slots the IVF-SQ8 path recovered
                        (exact — both engines compute the identical
                        candidate set and ranking);
      recall_ok       — n_hits / n_exact_results >= the floor.

    Runs BOTH searches, so the gate times the full audit workload.
    tools/quantization_report.py commits this number at sf1 next to the
    brute-tier quality record (r8 verdict task 6).
    """
    approx = ivf_quantized_topk(
        corpus, queries, k, centroid_stride, nprobe, vec_col, id_col
    ).select("query_id", "neighbor_id")
    exact = cosine_topk(corpus, queries, k, vec_col, id_col).select(
        "query_id", "neighbor_id"
    )
    joined = exact.join(
        approx.withColumn("_hit", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    )
    hits = F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
    return joined.agg(
        F.countDistinct("query_id").cast("long").alias("n_queries"),
        F.count(F.lit(1)).cast("long").alias("n_exact_results"),
        hits.cast("long").alias("n_hits"),
        (hits / F.count(F.lit(1)) >= F.lit(min_avg_recall)).alias(
            "recall_ok"
        ),
    )


def ivf_index_consistency_check(
    spark,
    catalog,
    index_table: str,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    seed: int = 7,
    max_iter: int = 10,
    sample_per_centroid: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Cross-engine invariant for the PERSISTED index lifecycle: after
    ivf_build_index, the stored quantizer must be bit-identical to a
    deterministic refit (parquet round-trips doubles exactly), and
    serving from the stored index must return exactly what the in-memory
    trained path returns. Returns ONE row of integers:

      n_vectors           — corpus size (exact, both engines);
      n_centroids         — stored centroid rows (the build parameter);
      n_centroid_mismatch — stored vs refit centroid vectors that differ
                            (invariant: 0 — persistence fidelity);
      n_serve_mismatch    — (query_id, rank) slots where stored-index
                            serving disagrees with the in-memory path
                            (invariant: 0 — read-path fidelity).
    """
    from hive_io_experimental_spark.input import HiveInput, ScanSpec

    stored = HiveInput(spark, catalog).read_table(
        ScanSpec(table=index_table)
    )
    refit = fit_spherical_kmeans(
        corpus, n_centroids, seed, max_iter, sample_per_centroid,
        vec_col, id_col,
    )
    cent_mismatch = (
        stored.select("cid", F.col("cv").alias("cv_stored"))
        .join(refit.select("cid", F.col("cv").alias("cv_refit")), "cid",
              "full")
        .filter(
            F.col("cv_stored").isNull()
            | F.col("cv_refit").isNull()
            | (F.col("cv_stored") != F.col("cv_refit"))
        )
    )
    served = ivf_query_index(
        spark, catalog, index_table, corpus, queries, k, nprobe,
        vec_col, id_col,
    ).select("query_id", "rank", F.col("neighbor_id").alias("n_stored"))
    mem = ivf_topk_trained(
        corpus, queries, k, n_centroids, nprobe, seed, max_iter,
        sample_per_centroid, vec_col, id_col,
    ).select("query_id", "rank", F.col("neighbor_id").alias("n_mem"))
    serve_mismatch = served.join(mem, ["query_id", "rank"], "full").filter(
        F.col("n_stored").isNull()
        | F.col("n_mem").isNull()
        | (F.col("n_stored") != F.col("n_mem"))
    )

    nv = corpus.agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
    nc = stored.agg(F.count(F.lit(1)).cast("long").alias("n_centroids"))
    cm = cent_mismatch.agg(
        F.count(F.lit(1)).cast("long").alias("n_centroid_mismatch")
    )
    sm = serve_mismatch.agg(
        F.count(F.lit(1)).cast("long").alias("n_serve_mismatch")
    )
    return (
        nv.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(cm))
        .crossJoin(F.broadcast(sm))
    )


def _assign_pandas(
    side: DataFrame, sid: str, vname: str, nrmname: str,
    cent_rows: list, keep: int,
) -> DataFrame:
    """Arrow/BLAS twin of the relational ``nearest`` assignment.

    One matmul per batch against the closed-over centroid matrix (KBs —
    the same data the relational form broadcasts). Ordering matches the
    relational form: cosine descending, ties to the lowest centroid id
    (stable argsort over cid-sorted centroids). BLAS summation order can
    differ from the sequential fold at the last ulp — irrelevant for
    assignment, where centroid separation dwarfs float noise; the
    relational path stays the oracle-checkable tier and this is the
    wide-embedding scale path (ROADMAP: assignment step at scale).
    """
    import numpy as np

    cent_rows = sorted(cent_rows, key=lambda r: r["cid"])
    cids = np.array([r["cid"] for r in cent_rows], dtype=np.int64)
    C = np.array([r["cv"] for r in cent_rows], dtype=np.float64)
    c_norms = np.linalg.norm(C, axis=1)
    c_norms[c_norms == 0] = np.inf  # zero-norm centroid never wins

    # bound the per-chunk cosine matrix to ~16 MB so a WIDE centroid set
    # (semantic_dedup's stride quantizer grows its cluster count with
    # the corpus — 10k+ centroids at sf10) neither materializes a
    # rows x centroids giant nor pays a full argsort when only the
    # argmax is needed
    chunk_rows = max(1, 2_000_000 // max(len(cids), 1))

    def assign(batches):
        for pdf in batches:
            for lo in range(0, len(pdf), chunk_rows):
                part = pdf.iloc[lo:lo + chunk_rows]
                if len(part) == 0:
                    continue
                M = np.array(list(part[vname]), dtype=np.float64)
                m_norms = part[nrmname].to_numpy(dtype=np.float64).copy()
                m_norms[m_norms == 0] = np.inf
                cos = (M @ C.T) / (m_norms[:, None] * c_norms[None, :])
                if keep == 1:
                    # np.argmax returns the FIRST max: ties to the
                    # lowest cid (C is cid-sorted) — same tie rule as
                    # the stable argsort, at O(k) per row not O(k log k)
                    order = np.argmax(cos, axis=1)[:, None]
                else:
                    # stable sort: primary -cos desc, ties keep cid order
                    order = np.argsort(-cos, axis=1, kind="stable")[:, :keep]
                n = len(part)
                reps = order.shape[1]
                out = part.iloc[np.repeat(np.arange(n), reps)].copy()
                out["cid"] = cids[order.ravel()]
                yield out

    sid_type = dict(side.dtypes)[sid]
    schema = (
        f"{sid} {sid_type}, {vname} array<double>, {nrmname} double, cid long"
    )
    return side.mapInPandas(assign, schema)


def _ivf_assign(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    vec_col: str,
    id_col: str,
    use_pandas: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Shared assign/probe stage: returns (inverted, probes).

    inverted: (cid, neighbor_id, nv, nnrm) — every corpus vector in its
    nearest-centroid list; probes: (cid, query_id, qv, qnrm) — each
    query replicated to its ``nprobe`` nearest lists. Assignment runs as
    the Arrow/BLAS map-side pass by default (broadcast centroid matrix,
    zero corpus-side exchange); ``use_pandas=False`` keeps the
    relational (oracle cross-check) form. Both scoring tiers — fp32
    (_ivf_search) and int8 (ivf_quantized_topk) — build on this.

    The probe table (queries x nprobe) is broadcast by the scoring
    joins, so the queries-<<-corpus contract is enforced here once for
    every IVF path — same strict-precondition discipline as the exact
    broadcast top-ks. The guard's bounded limit+count job makes every
    IVF constructor EAGER and unusable on a streaming query frame
    (_require_small_query_side documents why); stream callers invoke
    per-microbatch inside foreachBatch.
    """
    _require_small_query_side(
        queries.select(F.col(id_col)), "IVF top-k (broadcast probes)"
    )
    cents = F.broadcast(centroids.withColumn("cnrm", l2_norm(F.col("cv"))))
    # ONE centroid collect serves both assignment closures — the corpus
    # and query sides each collected the same (often corpus-derived)
    # centroid frame, i.e. one redundant scan job per IVF call (r15
    # optimization round, guide §1.2)
    cent_rows = (
        [r.asDict() for r in centroids.collect()] if use_pandas else None
    )

    def nearest(side: DataFrame, sid: str, vname: str, nrmname: str, keep: int):
        if use_pandas:
            return _assign_pandas(side, sid, vname, nrmname, cent_rows, keep)
        cos = F.try_divide(
            dot_product(F.col(vname), F.col("cv")),
            F.col(nrmname) * F.col("cnrm"),
        )
        w = Window.partitionBy(sid).orderBy(cos.desc(), F.col("cid").asc())
        return (
            side.crossJoin(cents)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= keep)
            .drop("_rn", "cv", "cnrm")
        )

    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("nv")
    ).withColumn("nnrm", l2_norm(F.col("nv")))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    ).withColumn("qnrm", l2_norm(F.col("qv")))

    inverted = nearest(c, "neighbor_id", "nv", "nnrm", keep=1)
    probes = nearest(q, "query_id", "qv", "qnrm", keep=nprobe)
    return inverted, probes


def _ivf_search(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int,
    nprobe: int,
    vec_col: str,
    id_col: str,
    use_pandas: bool = True,
) -> DataFrame:
    """Shared IVF machinery: assign -> probe -> list-equi-join -> rank.

    ``centroids`` must have columns (cid, cv: array<double>).

    Assignment DEFAULTS to the Arrow/BLAS map-side twin (broadcast
    centroid matrix, one matmul + argmax per batch, ZERO corpus-side
    exchanges): the relational variant crossJoins the corpus against the
    centroids and ranks with a window over ``sid`` — a shuffle of
    corpus x n_centroids rows, an 8-64x amplification for an argmax at
    100 TB (r5 audit). ``use_pandas=False`` keeps the relational form as
    the oracle cross-check tier (every intermediate SQL-expressible);
    equivalence of the two is pinned by
    test_ivf_pandas_assignment_matches_relational.
    """
    inverted, probes = _ivf_assign(
        corpus, queries, centroids, nprobe, vec_col, id_col, use_pandas
    )
    cos = _pair_cosine("qv", "qnrm", "nv", "nnrm")
    scored = (
        inverted.join(F.broadcast(probes), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def cosine_topk_bucketed(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates limited to same-LSH-bucket vectors.

    Recall < 1 by construction (that is the approximation); the equi-join on
    bucket replaces the all-pairs product, turning an O(n^2) scan into a
    bucketed join both Catalyst and AQE know how to distribute.

    ``num_planes=None`` (default) auto-sizes the bucket count from the
    corpus cardinality (see resolve_num_planes) so bucket occupancy —
    and with it within-bucket pair work — stays flat as the corpus grows
    instead of going quadratic at a fixed dial. Pass an explicit int to
    pin the bucket layout (oracle twins do). Corpus count and vector dim
    come from ONE probe job, shared by both bucketing passes.
    """
    corpus = spread(corpus)
    probe = corpus.agg(
        F.count(F.lit(1)).alias("n"),
        F.first(F.size(F.col(vec_col))).alias("dim"),
    ).first()
    if num_planes is None:
        num_planes = resolve_num_planes(probe["n"])
    cb = hyperplane_lsh_buckets(
        corpus, num_planes, vec_col, id_col, dim=probe["dim"]
    )
    qb = hyperplane_lsh_buckets(
        queries, num_planes, vec_col, id_col, dim=probe["dim"]
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")).join(
        cb.withColumnRenamed("id", "neighbor_id"), "neighbor_id"
    ).withColumn("cnrm", l2_norm(F.col("cv")))
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")).join(
        qb.withColumnRenamed("id", "query_id"), "query_id"
    ).withColumn("qnrm", l2_norm(F.col("qv")))
    cos = _pair_cosine("qv", "qnrm", "cv", "cnrm")
    scored = (
        c.join(
            F.broadcast(q),
            (c["bucket"] == q["bucket"]) & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def ivf_quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    centroid_stride: int = 50,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_pandas: bool = True,
) -> DataFrame:
    """IVF-SQ8: inverted-file candidate pruning + int8 in-list scoring —
    the memory-lean serving tier (the FAISS "IVF,SQ8" shape).

    Assignment and probing run on fp32 against the deterministic sampled
    coarse quantizer (identical candidate structure to :func:`ivf_topk`,
    BLAS map-side by default); the FINAL scoring pass reads only the
    4x-smaller int8 codes and runs the same exact int64 arithmetic as
    quantized_cosine_topk (per-vector scales cancel in cosine). Both
    stages are deterministic, so the DuckDB twin composes the IVF
    assignment SQL with the quantizer SQL and checks values with zero
    tolerance. At 100 TB the wins stack: candidates shrink by
    ~ncentroids/nprobe AND the scored payload shrinks 4x.

    Returns (query_id, neighbor_id, qcosine, rank).
    """
    cents = corpus.filter(F.col(id_col) % centroid_stride == 0).select(
        F.col(id_col).alias("cid"), _as_double(vec_col).alias("cv")
    )
    inverted, probes = _ivf_assign(
        corpus, queries, cents, nprobe, vec_col, id_col, use_pandas
    )
    return _ivf_quantized_score(
        corpus, queries, inverted, probes, k, vec_col, id_col
    )


def _ivf_quantized_score(
    corpus: DataFrame,
    queries: DataFrame,
    inverted: DataFrame,
    probes: DataFrame,
    k: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Shared IVF-SQ8 scoring: join the int8 codes onto the inverted
    lists / probe table and rank by the exact int64 quantized cosine.
    Used by both the sampled-quantizer and trained-quantizer tiers."""
    cq = (
        quantize_embeddings(spread(corpus), vec_col, id_col)
        .select(F.col(id_col).alias("neighbor_id"), F.col("codes").alias("cc"))
        .withColumn("cn", _int64_fold(F.transform(F.col("cc"), lambda x: x * x)))
    )
    qq = (
        quantize_embeddings(queries, vec_col, id_col)
        .select(F.col(id_col).alias("query_id"), F.col("codes").alias("qc"))
        .withColumn("qn", _int64_fold(F.transform(F.col("qc"), lambda x: x * x)))
    )
    inv = inverted.select("cid", "neighbor_id").join(cq, "neighbor_id")
    prb = probes.select("cid", "query_id").join(qq, "query_id")
    scored = (
        inv.join(F.broadcast(prb), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _quantized_cosine().alias("qcosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivf_quantized_topk_trained(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    seed: int = 7,
    max_iter: int = 10,
    sample_per_centroid: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-SQ8 with the KMeans-TRAINED coarse quantizer — the quality
    path of :func:`ivf_quantized_topk`, same relationship
    :func:`ivf_topk_trained` has to :func:`ivf_topk`.

    The quantizer is fit driver-local on a bounded deterministic sample
    (fit_spherical_kmeans); candidates come from the trained lists;
    scoring reads only the int8 codes (exact int64, scales cancel).
    Iterative fitting is not SQL-expressible, so like ivf_topk_trained
    this has NO DuckDB oracle — tests bound recall against the
    brute-force baseline instead.
    """
    cents = fit_spherical_kmeans(
        corpus, n_centroids, seed, max_iter, sample_per_centroid,
        vec_col, id_col,
    )
    inverted, probes = _ivf_assign(
        corpus, queries, cents, nprobe, vec_col, id_col
    )
    return _ivf_quantized_score(
        corpus, queries, inverted, probes, k, vec_col, id_col
    )


def cosine_topk_auto(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quantized: bool = False,
) -> DataFrame:
    """Route top-k by MEASURED query-side size — the serving entry point
    that never OOMs and never errors on shape.

    <= _MAX_BROADCAST_QUERIES query vectors -> the exact broadcast path
    (cosine_topk / quantized_cosine_topk: corpus scan stays
    shuffle-free); larger -> the LSH-bucketed path (cosine_topk_bucketed
    / quantized_cosine_topk_bucketed: equi-join on auto-sized buckets,
    recall < 1 by construction — the documented trade for unbounded
    query sets). The size probe is the same bounded
    limit(cap+1).count() the guards use, so routing costs one early-stop
    job. ``quantized=True`` serves from int8 codes on either route
    (score column ``qcosine``; fp32 routes emit ``cosine``).
    """
    n_q = queries.limit(_MAX_BROADCAST_QUERIES + 1).count()
    if n_q <= _MAX_BROADCAST_QUERIES:
        fn = quantized_cosine_topk if quantized else cosine_topk
        return fn(corpus, queries, k, vec_col, id_col)
    fn = (
        quantized_cosine_topk_bucketed if quantized else cosine_topk_bucketed
    )
    return fn(corpus, queries, k, None, vec_col, id_col)


def label_centroid_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Per-label centroid profile + nearest-centroid self-classification.

    The embedding-space health check every labeled corpus needs: for each
    label, the centroid (elementwise mean), how tight the cluster is (mean
    cosine of members to their own centroid) and how separable it is (how
    many members' NEAREST centroid — over all labels, by cosine — is their
    own).

    Plan shape, sized for 100 TB: posexplode to (label, dim, value) and
    aggregate — ONE shuffle whose volume is rows x dims scalar pairs, with
    map-side partial aggregation collapsing each partition to at most
    |labels| x dims rows; the resulting centroid table (|labels| rows) is
    collected into a broadcast join, so the scoring pass is a pure map over
    the corpus scan. No corpus-sized state ever sits on one node.

    Determinism across engines: each component is rounded to 6 then summed
    as exact DECIMAL(18,6) (order-independent — double-sum drift cannot
    flip a value hash); centroids are therefore bit-identical, and the
    member-to-centroid cosine is the usual sequential fold both engines
    share. Ties in the nearest-centroid argmax break toward the smaller
    label. Returns (label, n_vectors, centroid_norm, avg_cos_centroid,
    n_nearest_own).
    """
    v = spread(df).select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_lbl"),
        _as_double(vec_col).alias("_v"),
    )
    dims = (
        v.select("_lbl", F.posexplode("_v").alias("_dim", "_x"))
        .groupBy("_lbl", "_dim")
        .agg(
            (
                F.sum(F.round(F.col("_x"), 6).cast("decimal(18,6)"))
                .cast("double")
                / F.count(F.lit(1))
            ).alias("_c")
        )
    )
    centroids = (
        dims.groupBy(F.col("_lbl").alias("_clbl"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_dim"), F.col("_c")))
            ).alias("_pairs")
        )
        .select(
            "_clbl",
            F.transform(F.col("_pairs"), lambda s: s["_c"]).alias("_cv"),
        )
        .withColumn("_cnrm", l2_norm(F.col("_cv")))
    )
    member = v.withColumn("_nrm", l2_norm(F.col("_v")))
    scored = member.crossJoin(F.broadcast(centroids)).select(
        "_id",
        "_lbl",
        "_clbl",
        "_cnrm",
        _pair_cosine("_v", "_nrm", "_cv", "_cnrm").alias("_cos"),
    )
    w = Window.partitionBy("_id").orderBy(
        F.col("_cos").desc(), F.col("_clbl").asc()
    )
    ranked = scored.withColumn("_rn", F.row_number().over(w))
    own = ranked.filter(F.col("_lbl") == F.col("_clbl"))
    return (
        own.groupBy(F.col("_lbl").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.first("_cnrm"), 6).alias("centroid_norm"),
            (
                F.sum(F.col("_cos").cast("decimal(10,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_cos_centroid"),
            F.sum(F.when(F.col("_rn") == 1, 1).otherwise(0)).alias(
                "n_nearest_own"
            ),
        )
    )


def knn_label_accuracy(
    df: DataFrame,
    k: int = 5,
    num_planes: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Leave-one-out kNN self-classification over LSH-bucketed candidates:
    every vector is classified by majority label of its k nearest
    bucket-mates, and accuracy is reported per label — the standard "are
    these embeddings any good" evaluation, at the scale-safe candidate set.

    NO all-pairs product: candidates come from the same equi-join on the
    hyperplane bucket that backs cosine_topk_bucketed, so cost scales with
    bucket occupancy, not n^2 — and ``num_planes=None`` (default)
    auto-sizes the bucket count from the corpus cardinality
    (resolve_num_planes) so occupancy stays near-constant as the corpus
    grows; pass an int to pin the layout (oracle twins do). Vectors alone
    in their bucket are unclassifiable and excluded (reported coverage =
    n_classified). Majority ties break toward the smaller label; neighbor
    ties toward the smaller id. Returns (label, n_classified, n_correct,
    accuracy).
    """
    base = spread(df).select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_lbl"),
        _as_double(vec_col).alias("_v"),
    )
    probe = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.first(F.size(F.col("_v"))).alias("dim"),
    ).first()
    if num_planes is None:
        num_planes = resolve_num_planes(probe["n"])
    bk = hyperplane_lsh_buckets(
        base.withColumnRenamed("_v", vec_col), num_planes, vec_col, "_id",
        dim=probe["dim"],
    ).withColumnRenamed("id", "_id")
    v = (
        base.join(bk, "_id")
        .withColumn("_nrm", l2_norm(F.col("_v")))
        .select("_id", "_lbl", "_v", "_nrm", "bucket")
    )
    a = v.select(
        F.col("_id").alias("qid"), F.col("_lbl").alias("qlbl"),
        F.col("_v").alias("qv"), F.col("_nrm").alias("qnrm"),
        F.col("bucket"),
    )
    b = v.select(
        F.col("_id").alias("nid"), F.col("_lbl").alias("nlbl"),
        F.col("_v").alias("cv"), F.col("_nrm").alias("cnrm"),
        F.col("bucket").alias("_b2"),
    )
    pairs = a.join(
        b, (F.col("bucket") == F.col("_b2")) & (F.col("qid") != F.col("nid"))
    ).select(
        "qid", "qlbl", "nid", "nlbl",
        _pair_cosine("qv", "qnrm", "cv", "cnrm").alias("cos"),
    )
    w_rank = Window.partitionBy("qid").orderBy(
        F.col("cos").desc(), F.col("nid").asc()
    )
    topk = pairs.withColumn("_rn", F.row_number().over(w_rank)).filter(
        F.col("_rn") <= k
    )
    votes = topk.groupBy("qid", "qlbl", "nlbl").agg(
        F.count(F.lit(1)).alias("_c")
    )
    w_vote = Window.partitionBy("qid").orderBy(
        F.col("_c").desc(), F.col("nlbl").asc()
    )
    pred = votes.withColumn("_vr", F.row_number().over(w_vote)).filter(
        F.col("_vr") == 1
    )
    return (
        pred.groupBy(F.col("qlbl").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_classified"),
            F.sum(
                F.when(F.col("nlbl") == F.col("qlbl"), 1).otherwise(0)
            ).alias("n_correct"),
        )
        .select(
            "label",
            "n_classified",
            "n_correct",
            F.round(F.col("n_correct") / F.col("n_classified"), 6).alias(
                "accuracy"
            ),
        )
    )


def embedding_centroid_drift(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Embedding-space drift monitor: per label, the L2 distance between
    the reference corpus's centroid and the current one's.

    The vector-space counterpart of the PSI value monitor
    (profile.histogram_drift): an embedding pipeline re-checks that each
    class's representation hasn't moved between snapshots/batches before
    trusting thresholds tuned on the reference. Plan: one posexplode +
    (label, dim) aggregate per side — shuffle volume is rows × dims
    scalar pairs with map-side partials, centroid tables are |labels| ×
    dims rows.

    Determinism: per-dim means use the decimal-exact sum trick
    (label_centroid_stats); squared dim deltas round to 6 and sum as
    DECIMAL(18,6), so the final sqrt sees a bit-identical total in any
    partitioning/engine. Returns (label, n_ref, n_cur, l2_shift).
    """
    def dims(df: DataFrame) -> DataFrame:
        v = spread(df).select(
            F.col(label_col).alias("label"), _as_double(vec_col).alias("_v")
        )
        return (
            v.select("label", F.posexplode("_v").alias("dim", "x"))
            .groupBy("label", "dim")
            .agg(
                (
                    F.sum(F.round(F.col("x"), 6).cast("decimal(18,6)"))
                    .cast("double")
                    / F.count(F.lit(1))
                ).alias("c")
            )
        )

    a = dims(ref).withColumnRenamed("c", "ca")
    b = dims(cur).withColumnRenamed("c", "cb")
    shift = (
        a.join(b, ["label", "dim"])
        .select(
            "label",
            F.round(
                (F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb")), 6
            ).cast("decimal(18,6)").alias("sq"),
        )
        .groupBy("label")
        .agg(F.round(F.sqrt(F.sum("sq").cast("double")), 6).alias("l2_shift"))
    )
    nr = ref.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_ref")
    )
    nc = cur.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_cur")
    )
    return (
        nr.join(nc, "label", "full")
        .join(shift, "label", "left")
        .select(
            "label",
            F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
            "l2_shift",
        )
    )


# ---------------------------------------------------------------------------
# random projection (Johnson-Lindenstrauss dimensionality reduction)
# ---------------------------------------------------------------------------

def _rp_component(j: int, d: int) -> float:
    """Deterministic ±1 for projection row j, input dim d — the
    _plane_component md5-bit family under its own 'rp:' namespace (so a
    projection composed with LSH bucketing is not correlated with the
    plane matrix). Portable: DuckDB derives the identical value from
    md5('rp:<j>:<d>')."""
    import hashlib

    nib = int(hashlib.md5(f"rp:{j}:{d}".encode()).hexdigest()[0], 16)
    return 1.0 if nib & 1 == 1 else -1.0


# literal sign-matrix plan budget: the literal path bakes out_dim × dim
# F.lit nodes into ONE Select — fine at the gate's 64→16 (1,024 cells),
# but 1024→64 (a real encoder output) is 65,536 literal nodes, the same
# Catalyst plan-size ceiling _MAX_LITERAL_MERGES fences on the BPE
# applier. Past the budget the broadcast sign-TABLE path carries the
# matrix as data (one 1-row broadcast), plan-size-independent and
# bit-identical (same zip_with products, same sequential fold).
_MAX_RP_LITERAL_CELLS = 8192


def random_projection(
    corpus: DataFrame,
    out_dim: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    out_col: str = "projected",
    method: str = "auto",
) -> DataFrame:
    """Johnson-Lindenstrauss sign projection: embed ``vec_col`` (dim d)
    into ``out_dim`` components, y_j = Σ_d x_d · s(j, d), s ∈ {±1} from
    the deterministic md5 family (_rp_component).

    Why it exists at 100 TB: every downstream per-vector cost here —
    LSH plane dots, IVF centroid dots, exact rescores, pairwise MMR sims
    — is linear in dimension, so projecting 64→16 (or 1024→64 for real
    encoder outputs) cuts the ANN tiers' arithmetic and shuffle widths
    4-16x while JL keeps angles approximately intact (sign/Achlioptas
    projections carry the same guarantee as Gaussian ones, Achlioptas
    JCSS 2003). Compose: project → any tier (the tiers only assume an
    array column).

    Determinism/oracle: each y_j is the engine-standard sequential fold
    over the same ±1.0 doubles (md5 computed driver-side), so components
    are bit-identical in Spark, Python and the DuckDB twin — on BOTH
    methods (the sign values enter zip_with identically whether they are
    plan literals or broadcast data). The conventional 1/sqrt(out_dim)
    JL scale is intentionally OMITTED: consumers are cosine/angle-based
    (uniform scales cancel), and leaving it off keeps components exact
    ± sums with no irrational factor.

    Two plan shapes, routed by ``method``:
      * ``"literal"`` — the sign matrix as out_dim × dim plan-time
        literals, pure codegen, the fastest shape at gate-sized dims but
        capped at ``_MAX_RP_LITERAL_CELLS`` cells (the BPE applier's
        Catalyst plan-size lesson: 1024→64 would be 65,536 literal nodes
        in one Select);
      * ``"table"`` — the matrix as ONE broadcast row of
        array<array<double>> cross-joined in (the module's 1-row
        broadcast idiom), components via transform over the sign rows —
        plan-size-independent, for encoder-scale dims.
      * ``"auto"`` (default) routes literal under the budget, table past
        it — parity is pytest-pinned bit-for-bit.

    Fail-loud contract (r12 ADVICE): rows whose ``vec_col`` is NULL or
    whose length differs from ``dim`` raise IN-PLAN (zip_with would
    otherwise NULL-pad them into silently-NULL components). Both methods
    stay one map-side projection over the corpus scan — no shuffle, no
    UDF, no state. Returns (id_col, out_col) with ``out_dim``
    components.
    """
    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1, got {out_dim}")
    if method not in ("auto", "literal", "table"):
        raise ValueError(
            f"random_projection: method must be 'auto', 'literal' or "
            f"'table', got {method!r}"
        )
    if dim is None:
        probe = corpus.select(
            F.first(F.size(F.col(vec_col)), ignorenulls=True).alias("d")
        ).first()
        if probe is None or probe["d"] is None:
            raise ValueError(
                "random_projection: empty corpus (or every embedding is "
                "NULL) — cannot probe the input dimension"
            )
        dim = int(probe["d"])
    if out_dim >= dim:
        raise ValueError(
            f"random_projection: out_dim ({out_dim}) must be < input dim "
            f"({dim}) — projecting up is never what you want"
        )
    cells = out_dim * dim
    if method == "auto":
        method = "literal" if cells <= _MAX_RP_LITERAL_CELLS else "table"
    if method == "literal" and cells > _MAX_RP_LITERAL_CELLS:
        raise ValueError(
            f"random_projection: out_dim × dim = {cells} literal sign "
            f"cells exceeds the plan-size budget "
            f"({_MAX_RP_LITERAL_CELLS}) — a Select this wide stalls "
            f"Catalyst planning/codegen regardless of data volume. Use "
            f"method='table' (or 'auto'): the identical projection with "
            f"the sign matrix as one broadcast row."
        )
    from hive_io_experimental_spark.functions.vectors import dot_product

    # in-plan fail-loud guard: a NULL or wrong-length vector must raise,
    # not NULL-pad through zip_with into all-NULL components (the
    # mmr_diversified_topk raise_error discipline)
    vec = F.when(
        F.col(vec_col).isNull() | (F.size(F.col(vec_col)) != dim),
        F.raise_error(
            F.concat(
                F.lit("random_projection: row "),
                F.col(id_col).cast("string"),
                F.lit(
                    f" has a NULL embedding or length != dim ({dim}) — "
                    f"the sign matrix is sized to dim, so this row would "
                    f"project to silently-NULL components. Filter or fix "
                    f"the vector column first."
                ),
            )
        ).cast("array<double>"),
    ).otherwise(_as_double(vec_col))
    if method == "literal":
        comps = [
            dot_product(
                vec,
                F.array(*[F.lit(_rp_component(j, d)) for d in range(dim)]),
            )
            for j in range(out_dim)
        ]
        return corpus.select(
            F.col(id_col), F.array(*comps).alias(out_col)
        )
    # table path: the whole sign matrix as ONE broadcast row — the plan
    # holds a single column reference however large out_dim × dim gets.
    # The internal column name must not collide with a corpus column
    # (a prior projection stage could legitimately carry one — r13
    # ADVICE); fail loud rather than risk ambiguous resolution.
    if "_rp_signs" in corpus.columns:
        raise ValueError(
            "random_projection: corpus already has a `_rp_signs` column "
            "— it collides with the internal broadcast sign-matrix "
            "column. Rename or drop it first."
        )
    signs = corpus.sparkSession.createDataFrame(
        [([[
            _rp_component(j, d) for d in range(dim)
        ] for j in range(out_dim)],)],
        "_rp_signs array<array<double>>",
    )
    return (
        corpus.crossJoin(F.broadcast(signs))
        .select(
            F.col(id_col),
            F.transform(
                F.col("_rp_signs"), lambda s: dot_product(vec, s)
            ).alias(out_col),
        )
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization (memory-bound ANN at corpus scale)
# ---------------------------------------------------------------------------

def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: (id, scale, codes).

    The memory lever for corpus-scale ANN: float32 embeddings quantized
    to int8 codes are 4x smaller in cache/shuffle/storage, and quantized
    COSINE needs no dequantization at all — per-vector scales cancel in
    the normalization, so similarity is computed on raw integer codes
    (see quantized_cosine_topk).

      scale   = max_i |v_i| / 127          (0.0 for the zero vector)
      code_i  = floor(v_i / scale + 0.5)   in [-127, 127]

    Every step is IEEE-exact arithmetic (float->double widening, one
    division, one multiply-free floor — no pow/exp/rounding-mode
    ambiguity), so codes are bit-identical across engines and the DuckDB
    oracle checks them EXACTLY, unlike typical quantizer implementations
    whose banker's-rounding differs per library. Pure column expressions;
    narrow map over the scan, no shuffle, no Python.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = (
        F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
        / F.lit(127.0)
    )
    return spread(df).select(
        F.col(id_col),
        scale.alias("scale"),
        F.when(scale == 0, F.transform(v, lambda x: F.lit(0).cast("int")))
        .otherwise(
            F.transform(
                v,
                lambda x: F.floor(x / scale + F.lit(0.5)).cast("int"),
            )
        )
        .alias("codes"),
    )


def dequantize_embeddings(
    qdf: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Inverse of quantize_embeddings: (id, embedding array<double>).

    v̂_i = code_i * scale; reconstruction error per component is bounded
    by scale/2 = max|v|/254."""
    return qdf.select(
        F.col(id_col),
        F.transform(
            F.col("codes"), lambda c: c.cast("double") * F.col("scale")
        ).alias("embedding"),
    )


def quantized_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine over int8-quantized vectors.

    cos(s_a * a, s_b * b) = cos(a, b): the per-vector scales cancel, so
    similarity runs directly on the integer codes — the dot product and
    squared norms are exact int64 sums (max |code| = 127 -> a 4096-dim
    dot stays < 2^37, nowhere near overflow), and the final
    divide+sqrt are correctly-rounded IEEE ops, making the ranking
    bit-reproducible across engines (exact DuckDB twin, no tolerance).
    Same broadcast-queries shape as cosine_topk — and the same ENFORCED
    queries << corpus contract (> _MAX_BROADCAST_QUERIES raises before
    any work; broadcast hints bypass autoBroadcastJoinThreshold, so an
    unchecked large query side would OOM executors): the corpus scan
    stays shuffle-free; at 100 TB the win is the 4x smaller corpus-side
    payload in memory and in the broadcast. The guard's bounded
    limit+count job makes construction EAGER and rejects streaming
    query frames — quantized_cosine_topk_bucketed is the lazy,
    no-broadcast alternative.

    Returns (query_id, neighbor_id, qcosine, rank), self-matches
    excluded, rank by (qcosine desc, neighbor_id asc).
    """
    _require_small_query_side(
        queries.select(F.col(id_col)), "quantized_cosine_topk"
    )
    c = quantize_embeddings(spread(corpus), vec_col, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("codes").alias("cc")
    )
    q = quantize_embeddings(queries, vec_col, id_col).select(
        F.col(id_col).alias("query_id"), F.col("codes").alias("qc")
    )
    c = c.withColumn(
        "cn", _int64_fold(F.transform(F.col("cc"), lambda x: x * x))
    )
    q = q.withColumn(
        "qn", _int64_fold(F.transform(F.col("qc"), lambda x: x * x))
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", _quantized_cosine().alias("qcosine")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _int64_fold(col):
    """Exact int64 sum fold over an int array column (codes fit: max
    |code| = 127, so even 4096-dim dots stay < 2^37)."""
    return F.aggregate(
        col, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
    )


def _quantized_cosine():
    """Cosine from int64 code dot/norm columns (qc/cc/qn/cn): the
    per-vector quantization scales cancel, so this is exact integer
    arithmetic up to the final correctly-rounded divide+sqrt."""
    dot = _int64_fold(
        F.zip_with(F.col("qc"), F.col("cc"), lambda a, b: a * b)
    )
    return F.round(
        F.try_divide(
            dot.cast("double"),
            F.sqrt(F.col("qn").cast("double"))
            * F.sqrt(F.col("cn").cast("double")),
        ),
        6,
    )


def quantized_cosine_topk_bucketed(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_bits: int = 0,
) -> DataFrame:
    """Approximate top-k over int8 codes with LSH-bucketed candidates —
    the production ANN shape for LARGE query sets at corpus scale.

    This is where the guarded broadcast paths (cosine_topk,
    quantized_cosine_topk) send callers whose query side exceeds the
    broadcast cap: candidates come from an equi-join on the hyperplane
    bucket (no query-side broadcast, no cap — Catalyst/AQE distribute
    the join), the corpus payload is the 4x-smaller int8 codes, planes
    auto-size with the corpus (resolve_num_planes) so bucket occupancy
    stays flat as data grows, and within-bucket scoring is the same
    exact int64 arithmetic as quantized_cosine_topk — scales cancel in
    cosine, so the DuckDB twin checks values with zero tolerance.

    ``probe_bits`` (0/1/2, default 0 = single-probe) turns on multi-probe
    candidate generation (Lv et al. VLDB 2007): each query also searches
    every bucket within that Hamming distance — the cosine_topk_multiprobe
    recall fix composed with the int8 payload shrink, completing the
    LSH x {fp32, int8} x {single, multi} matrix. Only the query side fans
    out (x(1 + planes [+ C(planes, 2)])); the corpus-side bucket layout
    and codes are untouched, and the join stays a shuffle equi-join —
    no broadcast, no guard, candidate volume grows by ~the probe factor.

    Returns (query_id, neighbor_id, qcosine, rank); recall < 1 by
    bucket construction, like cosine_topk_bucketed.
    """
    if probe_bits not in (0, 1, 2):
        raise ValueError(f"probe_bits must be 0, 1 or 2, got {probe_bits}")
    corpus = spread(corpus)
    probe = corpus.agg(
        F.count(F.lit(1)).alias("n"),
        F.first(F.size(F.col(vec_col))).alias("dim"),
    ).first()
    if num_planes is None:
        num_planes = resolve_num_planes(probe["n"])
    cb = hyperplane_lsh_buckets(
        corpus, num_planes, vec_col, id_col, dim=probe["dim"]
    ).withColumnRenamed("id", "neighbor_id")
    qb = hyperplane_lsh_buckets(
        queries, num_planes, vec_col, id_col, dim=probe["dim"]
    )
    if probe_bits:
        qb = qb.select(
            "id",
            F.explode(
                F.array(*_hamming_probe_buckets(num_planes, probe_bits))
            ).alias("bucket"),
        )
    qb = qb.withColumnRenamed("id", "query_id").withColumnRenamed(
        "bucket", "_qbucket"
    )
    c = (
        quantize_embeddings(corpus, vec_col, id_col)
        .select(F.col(id_col).alias("neighbor_id"), F.col("codes").alias("cc"))
        .join(cb, "neighbor_id")
        .withColumn("cn", _int64_fold(F.transform(F.col("cc"), lambda x: x * x)))
    )
    q = (
        quantize_embeddings(queries, vec_col, id_col)
        .select(F.col(id_col).alias("query_id"), F.col("codes").alias("qc"))
        .join(qb, "query_id")
        .withColumn("qn", _int64_fold(F.transform(F.col("qc"), lambda x: x * x)))
    )
    scored = c.join(
        q,
        (F.col("bucket") == F.col("_qbucket"))
        & (F.col("query_id") != F.col("neighbor_id")),
    ).select("query_id", "neighbor_id", _quantized_cosine().alias("qcosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def quantization_quality_report(
    df: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_mod: int = 50,
) -> DataFrame:
    """One-row audit: recall@k of int8-quantized cosine vs exact fp32.

    The pre-flight check before switching a serving path to quantized
    vectors: every ``query_mod``-th vector queries both rankings and the
    report gives the overlap@k hit count plus the corpus-wide max
    per-component reconstruction error bound (max scale / 2, from
    quantize_embeddings). All-integer overlap counting; one row out of
    ONE action — n_queries rides the same aggregation as the hit total
    (left join from the query-id set, so zero-hit queries still count),
    and the error bound is a broadcast-crossJoined 1-row aggregate, not
    a separate driver count() job.
    """
    queries = df.filter(F.col(id_col) % query_mod == 0)
    exact = cosine_topk(df, queries, k, vec_col, id_col).select(
        "query_id", "neighbor_id"
    )
    quant = quantized_cosine_topk(df, queries, k, vec_col, id_col).select(
        "query_id", "neighbor_id"
    )
    overlap = (
        exact.join(quant, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    per_query = queries.select(F.col(id_col).alias("query_id")).join(
        overlap, "query_id", "left"
    )
    err_bound = quantize_embeddings(df, vec_col, id_col).agg(
        (F.max("scale") / F.lit(2.0)).alias("max_err_bound")
    )
    return (
        per_query.agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            F.coalesce(F.sum("hits"), F.lit(0))
            .cast("long")
            .alias("total_hits"),
        )
        .crossJoin(F.broadcast(err_bound))
        .select(
            "n_queries",
            F.lit(k).cast("long").alias("k"),
            "total_hits",
            "max_err_bound",
        )
    )


# ---------------------------------------------------------------------------
# product quantization (PQ / ADC)
# ---------------------------------------------------------------------------

def _unit_vectors(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """(id, v) unit-normalized with the sequential JVM fold (bit-identical
    to the DuckDB twin's list_dot_product); zero-norm vectors are dropped
    on both sides, so ADC inner products ARE cosines."""
    nrm = l2_norm(_as_double(vec_col))
    return (
        df.select(
            F.col(id_col).alias("id"),
            _as_double(vec_col).alias("_raw"),
            nrm.alias("_nrm"),
        )
        .filter(F.col("_nrm") > 0)
        .select(
            "id",
            F.transform(
                F.col("_raw"), lambda x: x / F.col("_nrm")
            ).alias("v"),
        )
    )


def pq_codebooks_sampled(
    corpus: DataFrame,
    num_subspaces: int = 4,
    centroid_stride: int = 50,
    max_codes: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic-sample PQ codebooks: (j, code, cv array<double>).

    Product quantization (Jégou, Douze, Schmid, "Product quantization
    for nearest neighbor search", TPAMI 2011): split the d-dim space
    into ``num_subspaces`` contiguous subspaces and quantize each
    independently. The codewords here are the SUBVECTORS of every
    ``centroid_stride``-th vector — the same deterministic sampled
    quantizer ivf_topk uses, which keeps the whole PQ pipeline
    SQL-expressible and the gate twin an exact hash oracle
    (pq_codebooks_trained is the k-means quality tier). Codes are dense
    per-subspace indices (row_number over the sampled ids), so the code
    value is a position in the LUT row, independent of the sample's id
    gaps. Codebook size: num_subspaces * (n / centroid_stride) rows of
    d / num_subspaces doubles — KBs, always the broadcast side.

    ``max_codes`` caps the codebook at the FIRST max_codes sampled ids
    per subspace (code < max_codes — still pure SQL). Set it for any
    corpus whose size grows: a stride-only codebook grows with n, which
    makes the n x ksub encode pass quadratic at scale; a capped
    codebook keeps encode linear (the same fixed-work-per-row rule the
    r8 gate reshape enforced on query sets).
    """
    u = _unit_vectors(
        corpus.filter(F.col(id_col) % centroid_stride == 0), vec_col, id_col
    )
    dsub_probe = u.select(F.size("v").alias("d")).first()
    if dsub_probe is None:
        raise ValueError(
            "pq_codebooks_sampled: no vector id hits the centroid_stride "
            f"({centroid_stride}); lower the stride"
        )
    d = dsub_probe["d"]
    if d % num_subspaces != 0:
        raise ValueError(
            f"embedding dim {d} is not divisible by num_subspaces="
            f"{num_subspaces}"
        )
    dsub = d // num_subspaces
    w = Window.partitionBy("j").orderBy(F.col("id").asc())
    cb = (
        u.select(
            "id",
            F.explode(F.sequence(F.lit(0), F.lit(num_subspaces - 1))).alias("j"),
            "v",
        )
        .select(
            "j",
            (F.row_number().over(w) - 1).cast("int").alias("code"),
            F.slice(F.col("v"), F.col("j") * dsub + 1, dsub).alias("cv"),
        )
    )
    if max_codes is not None:
        cb = cb.filter(F.col("code") < max_codes)
    return cb


def pq_codebooks_trained(
    corpus: DataFrame,
    num_subspaces: int = 4,
    codes_per_subspace: int = 16,
    seed: int = 7,
    max_iter: int = 10,
    sample_rows: int = 4096,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """K-means PQ codebooks (the quality tier): per-subspace Lloyd
    iterations on a bounded deterministic sample, driver-local numpy —
    the fit_spherical_kmeans design (hash-stride sample, id-sorted for
    scan-order independence, centroid table back as a few-KB DataFrame).
    Iterative fitting is not SQL-expressible, so operators built on this
    tier are recall-bound tested (pq_recall_check), not hash-oracled —
    the ivf_topk_trained discipline. Returns (j, code, cv)."""
    import numpy as np

    n = corpus.count()
    stride = max(1, n // max(sample_rows, 1))
    train = corpus
    if stride > 1:
        train = train.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(stride)) == 0
        )
    pdf = (
        _unit_vectors(train, vec_col, id_col)
        .toPandas()
        .sort_values("id")
    )
    if len(pdf) == 0:
        raise ValueError("pq_codebooks_trained: empty training sample")
    mat = np.array(list(pdf["v"]), dtype=np.float64)
    d = mat.shape[1]
    if d % num_subspaces != 0:
        raise ValueError(
            f"embedding dim {d} is not divisible by num_subspaces="
            f"{num_subspaces}"
        )
    dsub = d // num_subspaces
    rng = np.random.RandomState(seed)
    rows = []
    for j in range(num_subspaces):
        sub = mat[:, j * dsub:(j + 1) * dsub]
        ksub = min(codes_per_subspace, len(sub))
        cents = sub[rng.choice(len(sub), size=ksub, replace=False)].copy()
        for _ in range(max_iter):
            # squared-L2 assignment: argmin ||x-c||^2 = argmax x.c - .5c.c
            score = sub @ cents.T - 0.5 * (cents * cents).sum(axis=1)
            assign = np.argmax(score, axis=1)
            for c in range(ksub):
                members = sub[assign == c]
                if len(members) == 0:
                    cents[c] = sub[rng.randint(len(sub))]
                else:
                    cents[c] = members.mean(axis=0)
        rows.extend(
            (j, c, [float(x) for x in cents[c]]) for c in range(ksub)
        )
    return corpus.sparkSession.createDataFrame(
        rows, "j int, code int, cv array<double>"
    )


def _pq_encode_pandas(
    u: DataFrame, cb_rows: list, num_subspaces: int, dsub: int
) -> DataFrame:
    """Arrow/BLAS encode: one matmul per (batch, subspace) against the
    closed-over codebook matrices; squared-L2 assignment with stable
    ties to the lowest code — matches the relational tier the same way
    _assign_pandas matches its relational twin (last-ulp BLAS summation
    differences cannot flip assignments whose codeword separation dwarfs
    float noise)."""
    import numpy as np

    mats, biases = [], []
    for j in range(num_subspaces):
        rows = sorted(
            (r for r in cb_rows if r["j"] == j), key=lambda r: r["code"]
        )
        C = np.array([r["cv"] for r in rows], dtype=np.float64)
        mats.append(C)
        biases.append(0.5 * (C * C).sum(axis=1))

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.array(list(pdf["v"]), dtype=np.float64)
            codes = np.empty((len(pdf), num_subspaces), dtype=np.int64)
            for j in range(num_subspaces):
                sub = M[:, j * dsub:(j + 1) * dsub]
                score = sub @ mats[j].T - biases[j]
                # np.argmax returns the FIRST max: ties to the lowest code
                codes[:, j] = score.argmax(axis=1)
            out = pdf[["id"]].copy()
            out["codes"] = list(codes)
            yield out

    sid_type = dict(u.dtypes)["id"]
    return u.mapInPandas(encode, f"id {sid_type}, codes array<long>")


def _ivf_pq_encode_assign_pandas(
    c: DataFrame,
    cent_rows: list,
    cb_rows: list,
    num_subspaces: int,
    dsub: int,
) -> DataFrame:
    """ONE Arrow pass over the raw vectors producing BOTH the IVF-PQ
    index halves: (id, cid, codes) — the coarse nearest-centroid
    assignment (_assign_pandas keep=1 math, cosine over raw vectors)
    and the PQ codes (_pq_encode_pandas math, squared-L2 over the
    unit-normalized rows). ivf_pq_build_index / ivf_pq_append_to_index
    previously ran the two as separate passes, i.e. two full reads of
    the raw embedding column — at 100 TB the dominant build cost (r14
    optimization round, guide §1.2: remove unnecessary passes).

    Bit-identity with the two single-purpose functions: the centroid
    cosine and the per-subspace scores are the same BLAS expressions on
    the same doubles (IEEE division x/nrm matches _unit_vectors' JVM
    per-element division exactly), argmax tie rules identical, and both
    are row-independent so batching/partitioning differences cannot
    change any row's result. Rows with a zero (or NULL) norm keep their
    assignment but carry codes=NULL — mirroring _unit_vectors dropping
    them from the encode. ``c`` must be (id, _v array<double>, _nrm);
    spread it first (single-row-group inputs otherwise serialize the
    whole pass into one task)."""
    import numpy as np

    cent_rows = sorted(cent_rows, key=lambda r: r["cid"])
    cids = np.array([r["cid"] for r in cent_rows], dtype=np.int64)
    C = np.array([r["cv"] for r in cent_rows], dtype=np.float64)
    c_norms = np.linalg.norm(C, axis=1)
    c_norms[c_norms == 0] = np.inf  # zero-norm centroid never wins
    mats, biases = [], []
    for j in range(num_subspaces):
        rows = sorted(
            (r for r in cb_rows if r["j"] == j), key=lambda r: r["code"]
        )
        Cb = np.array([r["cv"] for r in rows], dtype=np.float64)
        mats.append(Cb)
        biases.append(0.5 * (Cb * Cb).sum(axis=1))
    chunk_rows = max(1, 2_000_000 // max(len(cids), 1))

    def run(batches):
        for pdf in batches:
            for lo in range(0, len(pdf), chunk_rows):
                part = pdf.iloc[lo:lo + chunk_rows]
                if len(part) == 0:
                    continue
                M = np.array(list(part["_v"]), dtype=np.float64)
                raw_norms = part["_nrm"].to_numpy(dtype=np.float64)
                m_norms = raw_norms.copy()
                m_norms[m_norms == 0] = np.inf
                cos = (M @ C.T) / (m_norms[:, None] * c_norms[None, :])
                # np.argmax returns the FIRST max: ties to the lowest
                # cid (C is cid-sorted) — _assign_pandas keep=1 rule
                out = part[["id"]].copy()
                out["cid"] = cids[np.argmax(cos, axis=1)]
                nz = raw_norms > 0  # NULL norm -> nan -> False, like
                # _unit_vectors' _nrm > 0 filter
                codes_col: list = [None] * len(part)
                if nz.any():
                    U = M[nz] / raw_norms[nz][:, None]
                    codes = np.empty(
                        (int(nz.sum()), num_subspaces), dtype=np.int64
                    )
                    for j in range(num_subspaces):
                        sub = U[:, j * dsub:(j + 1) * dsub]
                        score = sub @ mats[j].T - biases[j]
                        # FIRST max: ties to the lowest code
                        codes[:, j] = score.argmax(axis=1)
                    k = 0
                    for i, flag in enumerate(nz):
                        if flag:
                            codes_col[i] = codes[k]
                            k += 1
                out["codes"] = codes_col
                yield out

    sid_type = dict(c.dtypes)["id"]
    return c.mapInPandas(
        run, f"id {sid_type}, cid long, codes array<long>"
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame | None = None,
    num_subspaces: int = 4,
    centroid_stride: int = 50,
    max_codes: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_pandas: bool = True,
) -> DataFrame:
    """Encode every vector as ``num_subspaces`` dense codebook indices:
    (id, codes array<long>) — the m-byte-per-vector representation that
    makes a 100 TB embedding corpus a ~1 TB codes table (64-dim fp32 =
    256 B -> 4 codes; the codebook rides along in KBs). Assignment is
    squared-L2 per subspace (argmax x.c - 0.5*c.c, ties to the lowest
    code). Map-side BLAS against the closure codebooks by default —
    zero corpus-side exchange; ``use_pandas=False`` is the relational
    oracle tier (explode by subspace, broadcast-join the codebook,
    window argmax — SQL-expressible end to end)."""
    if codebooks is None:
        codebooks = pq_codebooks_sampled(
            corpus, num_subspaces, centroid_stride, max_codes,
            vec_col, id_col,
        )
    u = _unit_vectors(spread(corpus), vec_col, id_col)
    if use_pandas:
        # geometry comes from the codebooks (the collect the encoder
        # needs anyway) — the corpus-side size probe job this path used
        # to run duplicated information the codebook rows already carry
        # (r14 optimization round: one fewer corpus-scan job per encode)
        cb_rows = [r.asDict() for r in codebooks.collect()]
        if not cb_rows:
            raise ValueError("pq_encode: empty codebook frame")
        dsub = len(cb_rows[0]["cv"])
        return _pq_encode_pandas(u, cb_rows, num_subspaces, dsub)
    probe = u.select(F.size("v").alias("d")).first()
    if probe is None:
        return corpus.sparkSession.createDataFrame(
            [], "id long, codes array<long>"
        )
    dsub = probe["d"] // num_subspaces
    cb = F.broadcast(
        codebooks.withColumn("_csq", dot_product(F.col("cv"), F.col("cv")))
    )
    w = Window.partitionBy("id", "j").orderBy(
        (
            dot_product(F.col("_sub"), F.col("cv"))
            - F.lit(0.5) * F.col("_csq")
        ).desc(),
        F.col("code").asc(),
    )
    assigned = (
        u.select(
            "id",
            F.explode(
                F.sequence(F.lit(0), F.lit(num_subspaces - 1))
            ).alias("j"),
            "v",
        )
        .select(
            "id", "j",
            F.slice(F.col("v"), F.col("j") * dsub + 1, dsub).alias("_sub"),
        )
        .join(cb, "j")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    return (
        assigned.groupBy("id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("j", "code"))
            ).alias("_jc")
        )
        .select(
            "id",
            F.transform(
                F.col("_jc"), lambda s: s["code"].cast("long")
            ).alias("codes"),
        )
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_subspaces: int = 4,
    centroid_stride: int = 50,
    max_codes: int | None = None,
    codebooks: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_pandas: bool = True,
) -> DataFrame:
    """PQ top-k by asymmetric distance computation (ADC): queries stay
    fp32, the corpus is scanned as codes, and each candidate's score is
    m LUT lookups + adds instead of a d-term dot product — O(m) per
    pair, reading m bytes per vector instead of 4d.

    Pipeline: encode the corpus (pq_encode — map-side, zero exchange) ->
    build each query's LUT (query subvector . codeword, the exact JVM
    fold, grouped into an m x ksub array) -> broadcast the LUT table ->
    score = ordered fold over subspaces of lut[j][codes[j]], rounded to
    6 like every cosine in this module. Both sides unit-normalized, so
    the ADC score approximates cosine and ranks against the exact
    brute-force path (pq_recall_check grades the loss).

    Everything is SQL-expressible with sampled codebooks, so the gate
    twin reproduces scores and ranks exactly. Queries are guarded small
    (the broadcast-LUT contract — same eager probe as the other exact
    paths; stream callers go per-microbatch)."""
    _require_small_query_side(
        queries.select(F.col(id_col)), "pq_topk (broadcast query LUTs)"
    )
    if codebooks is None:
        codebooks = pq_codebooks_sampled(
            corpus, num_subspaces, centroid_stride, max_codes,
            vec_col, id_col,
        )
    codes = pq_encode(
        corpus, codebooks, num_subspaces, centroid_stride, max_codes,
        vec_col, id_col, use_pandas,
    )
    qu = _unit_vectors(queries, vec_col, id_col)
    probe = qu.select(F.size("v").alias("d")).first()
    if probe is None:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, adc_score double, rank long"
        )
    dsub = probe["d"] // num_subspaces
    return _pq_adc_topk(codes, qu, codebooks, k, num_subspaces, dsub)


def _pq_query_luts(
    qu: DataFrame, codebooks: DataFrame, num_subspaces: int, dsub: int
) -> DataFrame:
    """Per-query ADC lookup tables: (query_id, _lut array<array<double>>)
    where _lut[j][code] = query subvector j . codeword — the m x ksub
    table ADC scoring folds over. Codebooks are KBs (broadcast); the LUT
    table is queries x m x ksub doubles, broadcast by callers under the
    same small-query-side contract as the exact top-k paths."""
    ql = (
        qu.select(
            F.col("id").alias("query_id"),
            F.explode(
                F.sequence(F.lit(0), F.lit(num_subspaces - 1))
            ).alias("j"),
            "v",
        )
        .select(
            "query_id", "j",
            F.slice(F.col("v"), F.col("j") * dsub + 1, dsub).alias("_qsub"),
        )
        .join(F.broadcast(codebooks), "j")
        .select(
            "query_id", "j", "code",
            dot_product(F.col("_qsub"), F.col("cv")).alias("_pdot"),
        )
    )
    lut_rows = ql.groupBy("query_id", "j").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("code", "_pdot"))),
            lambda s: s["_pdot"],
        ).alias("_row")
    )
    return lut_rows.groupBy("query_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("j", "_row"))),
            lambda s: s["_row"],
        ).alias("_lut")
    )


def _adc_score(num_subspaces: int):
    """ADC score expression over (_lut, codes): the ordered left fold
    sum_j lut[j][codes[j]], rounded to 6 like every cosine here (the
    DuckDB twin's list_reduce is the same sequential fold)."""
    return F.round(
        F.aggregate(
            F.sequence(F.lit(0), F.lit(num_subspaces - 1)),
            F.lit(0.0),
            lambda acc, j: acc
            + F.element_at(
                F.element_at(F.col("_lut"), j.cast("int") + 1),
                F.element_at(F.col("codes"), j.cast("int") + 1).cast("int")
                + 1,
            ),
        ),
        6,
    )


def _pq_adc_topk(
    codes: DataFrame,
    qu: DataFrame,
    codebooks: DataFrame,
    k: int,
    num_subspaces: int,
    dsub: int,
) -> DataFrame:
    """Shared ADC scoring stage: (id, codes) x unit queries -> ranked
    top-k. Used by pq_topk (fresh encode) and pq_query_index (codes
    served from the persisted index — the 100 TB path, where the raw
    embedding column is never rescanned)."""
    luts = _pq_query_luts(qu, codebooks, num_subspaces, dsub)
    scored = (
        codes.crossJoin(F.broadcast(luts))
        .filter(F.col("query_id") != F.col("id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            _adc_score(num_subspaces).alias("adc_score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)


def resolve_ivf_stride(n: int, min_stride: int = 50) -> int:
    """Scale-aware IVF coarse-quantizer stride: max(min_stride, ceil(sqrt(n))).

    nlist = n/stride = sqrt(n) is the FAISS sizing rule: assignment work
    is n * nlist = n^1.5 and per-query in-list candidates are
    nprobe * stride = nprobe * sqrt(n) — both the honest sub-quadratic
    contract (a FIXED stride leaves assignment quietly quadratic at
    scale, the exact trap resolve_semantic_stride closed for SemDeDup).
    The floor keeps small corpora on the oracle twins' constant (50),
    the resolve_num_planes discipline.
    """
    import math

    return max(min_stride, math.ceil(math.sqrt(max(n, 1))))


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    centroid_stride: int | None = None,
    nprobe: int = 2,
    num_subspaces: int = 4,
    pq_stride: int = 5,
    max_codes: int | None = 128,
    codebooks: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_pandas: bool = True,
) -> DataFrame:
    """IVF-PQ: inverted-file candidate pruning + PQ-ADC in-list scoring —
    the billion-scale serving composition (the FAISS "IVFx,PQy" index,
    Jégou et al. TPAMI 2011 §V), and the last cell of this module's ANN
    matrix (exact/LSH/IVF x fp32/int8/PQ).

    Assignment and probing run on fp32 against the deterministic sampled
    coarse quantizer — the identical candidate structure to
    :func:`ivf_topk` and :func:`ivf_quantized_topk` (Arrow/BLAS map-side
    by default, zero corpus-side exchange). The FINAL scoring pass never
    touches raw vectors: each candidate costs m LUT lookups + adds over
    its m-byte PQ codes (pq_stride/max_codes-capped sampled codebooks, so
    encode stays linear — the r8 gate-shape rule). At 100 TB the wins
    stack: candidates shrink by ~ncentroids/nprobe AND the scored payload
    shrinks 32-64x (4 code bytes vs 256 fp32 bytes at dim 64).

    Every stage is deterministic and SQL-expressible, so the DuckDB twin
    composes the IVF assignment CTEs with the PQ codebook/encode/LUT CTEs
    and checks scores with zero tolerance (trained coarse quantizers /
    codebooks drop in via ``codebooks=`` + fit_spherical_kmeans for the
    recall-bound quality tier, the ivf_topk_trained discipline).

    Returns (query_id, neighbor_id, adc_score, rank). Queries are guarded
    small (broadcast probe + LUT contract; large query sets belong on
    quantized_cosine_topk_bucketed, as the guard's error says).
    ``centroid_stride=None`` (default) auto-sizes the coarse quantizer at
    sqrt(n) lists via resolve_ivf_stride. That dial costs one count JOB
    over the corpus frame (metadata-cheap only when the frame is a raw
    parquet scan; a filtered/derived frame pays a real pass — the
    probe-once discipline, same as the other auto-dials) so assignment
    work stays n^1.5, not n^2/stride; the floor resolves to the twins'
    constant (50) at fixture scales.
    """
    if centroid_stride is None:
        centroid_stride = resolve_ivf_stride(corpus.count())
    if centroid_stride < 1:
        raise ValueError(
            f"centroid_stride must be >= 1, got {centroid_stride}"
        )
    cents = corpus.filter(F.col(id_col) % centroid_stride == 0).select(
        F.col(id_col).alias("cid"), _as_double(vec_col).alias("cv")
    )
    if codebooks is None:
        codebooks = pq_codebooks_sampled(
            corpus, num_subspaces, pq_stride, max_codes, vec_col, id_col
        )
    qu = _unit_vectors(queries, vec_col, id_col)
    if use_pandas:
        # ONE fused Arrow pass over the raw corpus yields BOTH the
        # coarse assignment and the PQ codes (r15 optimization round —
        # the same _ivf_pq_encode_assign_pandas the persisted-index
        # build/append/repair paths use; previously the direct operator
        # ran a separate assignment pass and encode pass, i.e. two full
        # reads of the embedding column, plus two centroid collects and
        # a query-side dimension probe job). Bit-identity with the
        # two-pass shape is the r14 argument, oracle-pinned.
        from hive_io_experimental_spark.functions.reuse import (
            reuse, run_concurrently,
        )

        _require_small_query_side(
            queries.select(F.col(id_col)), "IVF top-k (broadcast probes)"
        )
        cent_rows, cb_rows = run_concurrently(
            lambda: [r.asDict() for r in cents.collect()],
            lambda: [r.asDict() for r in codebooks.collect()],
        )
        if not cb_rows:
            raise ValueError("ivf_pq_topk: empty codebook frame")
        dsub = len(cb_rows[0]["cv"])
        c = spread(corpus).select(
            F.col(id_col).alias("id"), _as_double(vec_col).alias("_v")
        ).withColumn("_nrm", l2_norm(F.col("_v")))
        fused = reuse(_ivf_pq_encode_assign_pandas(
            c, cent_rows, cb_rows, num_subspaces, dsub
        ))
        inverted = fused.select("cid", F.col("id").alias("neighbor_id"))
        codes = fused.filter(F.col("codes").isNotNull()).select(
            "id", "codes"
        )
        q = queries.select(
            F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
        ).withColumn("qnrm", l2_norm(F.col("qv")))
        probes = _assign_pandas(
            q, "query_id", "qv", "qnrm", cent_rows, keep=nprobe
        )
        luts = _pq_query_luts(
            qu, _local_codebooks(corpus.sparkSession, cb_rows),
            num_subspaces, dsub,
        )
    else:
        inverted, probes = _ivf_assign(
            corpus, queries, cents, nprobe, vec_col, id_col, use_pandas
        )
        codes = pq_encode(
            corpus, codebooks, num_subspaces, pq_stride, max_codes,
            vec_col, id_col, use_pandas,
        )
        probe = qu.select(F.size("v").alias("d")).first()
        if probe is None:
            return corpus.sparkSession.createDataFrame(
                [],
                "query_id long, neighbor_id long, adc_score double, "
                "rank long",
            )
        dsub = probe["d"] // num_subspaces
        luts = _pq_query_luts(qu, codebooks, num_subspaces, dsub)
    inv = inverted.select("cid", "neighbor_id").join(
        codes.withColumnRenamed("id", "neighbor_id"), "neighbor_id"
    )
    prb = probes.select("cid", "query_id").join(luts, "query_id")
    scored = (
        inv.join(F.broadcast(prb), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            _adc_score(num_subspaces).alias("adc_score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)


def ivf_pq_recall_check(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    centroid_stride: int | None = None,
    nprobe: int = 2,
    num_subspaces: int = 4,
    pq_stride: int = 5,
    max_codes: int | None = 128,
    codebooks: DataFrame | None = None,
    min_avg_recall: float = 0.1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall audit for the composed IVF-PQ path against the fp32 exact
    top-k — the same one-row exact-hit-count contract as
    ivf_sq8_recall_check / pq_recall_check (n_queries, n_exact_results,
    n_hits, recall_ok). The composition loses recall BOTH ways (pruned
    lists AND lossy codes), so its floor sits below either tier's own —
    the honest number a serving team reads before picking this index
    shape. With sampled codebooks every stage is SQL-expressible and the
    DuckDB twin reproduces the EXACT hit count; with trained codebooks
    pass ``codebooks=`` and read the row as a recall-bound invariant.
    Runs BOTH searches, so the gate times the full audit workload."""
    approx = ivf_pq_topk(
        corpus, queries, k, centroid_stride, nprobe, num_subspaces,
        pq_stride, max_codes, codebooks, vec_col, id_col,
    ).select("query_id", "neighbor_id")
    exact = cosine_topk(corpus, queries, k, vec_col, id_col).select(
        "query_id", "neighbor_id"
    )
    joined = exact.join(
        approx.withColumn("_hit", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    )
    hits = F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
    return joined.agg(
        F.countDistinct("query_id").cast("long").alias("n_queries"),
        F.count(F.lit(1)).cast("long").alias("n_exact_results"),
        hits.cast("long").alias("n_hits"),
        (hits / F.count(F.lit(1)) >= F.lit(min_avg_recall)).alias(
            "recall_ok"
        ),
    )


def pq_recall_check(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_subspaces: int = 4,
    centroid_stride: int = 50,
    max_codes: int | None = None,
    codebooks: DataFrame | None = None,
    min_avg_recall: float = 0.2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall audit for the PQ-ADC path against the fp32 exact top-k —
    the same one-row exact-hit-count contract as ivf_sq8_recall_check
    (n_queries, n_exact_results, n_hits, recall_ok). With sampled
    codebooks every stage is SQL-expressible, so the DuckDB twin
    reproduces the EXACT hit count; with trained codebooks pass the
    codebook frame and treat the row as a recall-bound invariant. Runs
    BOTH searches, so the gate times the full audit workload."""
    approx = pq_topk(
        corpus, queries, k, num_subspaces, centroid_stride, max_codes,
        codebooks, vec_col, id_col,
    ).select("query_id", "neighbor_id")
    exact = cosine_topk(corpus, queries, k, vec_col, id_col).select(
        "query_id", "neighbor_id"
    )
    joined = exact.join(
        approx.withColumn("_hit", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    )
    hits = F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
    return joined.agg(
        F.countDistinct("query_id").cast("long").alias("n_queries"),
        F.count(F.lit(1)).cast("long").alias("n_exact_results"),
        hits.cast("long").alias("n_hits"),
        (hits / F.count(F.lit(1)) >= F.lit(min_avg_recall)).alias(
            "recall_ok"
        ),
    )


def pq_build_index(
    spark,
    catalog,
    index_table: str,
    corpus: DataFrame,
    num_subspaces: int = 4,
    centroid_stride: int = 50,
    max_codes: int | None = None,
    codebooks: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Encode and PERSIST a PQ index as two catalog tables: the codes
    table ``{index_table}`` (id, codes array<long> — m longs per vector,
    the 32-64x-smaller stand-in for the embedding column) and the
    codebook table ``{index_table}_codebooks`` (j, code, cv). The
    ivf_build_index lifecycle: build once per corpus snapshot, serve any
    number of query batches from the stored tables (pq_query_index)
    without rescanning the raw embeddings; rebuild = explicit drop +
    recreate under the catalog's strict write preconditions (reference
    OutputConf parity — never a silent in-place overwrite). Pass a
    trained codebook frame (pq_codebooks_trained) for the quality tier;
    default is the sampled SQL-checkable tier."""
    from pyspark.sql import types as T

    from hive_io_experimental_spark.output import HiveOutput, WriteSpec
    from hive_io_experimental_spark.schema import HiveTableSchema

    if codebooks is None:
        codebooks = pq_codebooks_sampled(
            corpus, num_subspaces, centroid_stride, max_codes,
            vec_col, id_col,
        )
    # collect the (KB-sized by design) codebooks ONCE and serve both
    # consumers — the encoder's closure and the codebook-table write —
    # from the local rows; previously the codebook plan (sample +
    # explode + window shuffle) ran twice per build (r14 optimization
    # round, guide §1.2). Doubles round-trip py4j exactly (IEEE 64-bit
    # both sides), so the written rows are bit-identical.
    from pyspark.sql import types as _T

    cb_schema = _T.StructType([
        _T.StructField("j", _T.IntegerType()),
        _T.StructField("code", _T.IntegerType()),
        _T.StructField("cv", _T.ArrayType(_T.DoubleType())),
    ])
    cb_local = spark.createDataFrame(
        [(r["j"], r["code"], r["cv"]) for r in codebooks.collect()],
        cb_schema,
    )
    codebooks = cb_local
    codes = pq_encode(
        corpus, codebooks, num_subspaces, centroid_stride, max_codes,
        vec_col, id_col,
    )
    cb_table = f"{index_table}_codebooks"
    out = HiveOutput(spark, catalog)
    # the codes table is VERSIONED: pq_append_to_index folds new vectors
    # in as snapshot appends (and time-travel reads the index as-of any
    # tick); the codebooks are the immutable geometry. Both tables carry
    # one shared build_id: the drop-then-write across two tables is not
    # atomic, and a crash between them leaves NEW codebooks with
    # OLD-codebook codes — mixed stamps, which the read paths REFUSE
    # instead of serving silently-wrong ADC scores (the ivf_pq fence).
    import uuid

    from hive_io_experimental_spark.functions.reuse import run_concurrently

    bid = uuid.uuid4().hex
    tables = (
        (
            cb_table,
            HiveTableSchema((
                ("j", T.IntegerType()),
                ("code", T.IntegerType()),
                ("cv", T.ArrayType(T.DoubleType())),
                ("build_id", T.StringType()),
            )),
            codebooks,
            False,
        ),
        (
            index_table,
            HiveTableSchema((
                ("id", corpus.schema[id_col].dataType),
                ("codes", T.ArrayType(T.LongType())),
                ("build_id", T.StringType()),
            )),
            codes,
            True,
        ),
    )
    for tbl, schema, _df, versioned in tables:
        if catalog.table_exists(tbl):
            catalog.drop_table(tbl, delete_data=True)
        catalog.create_table(tbl, schema, versioned=versioned)
    # independent writes (a mid-way crash leaves mixed stamps / an empty
    # table, both refused by the read paths): the KB-sized codebook
    # write rides the corpus-encode write's task tail (guide §2.6)
    run_concurrently(*(
        (lambda t=tbl, fr=df: out.write_table(
            WriteSpec(table=t), fr.withColumn("build_id", F.lit(bid))
        ))
        for tbl, _s, df, _v in tables
    ))


def pq_append_to_index(
    spark,
    catalog,
    index_table: str,
    new_vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> int:
    """Incremental PQ index maintenance — lsh/ivf_pq_append_to_index's
    sibling for the flat-ADC tier: encode NEW vectors with the STORED
    codebooks and commit them as one snapshot APPEND to the codes table.
    No retrain, no re-encode of the existing corpus; per tick the work
    is |batch| × ksub encode dots plus one narrow anti-join against the
    stored ids (idempotent — a re-delivered batch appends nothing and
    the version does not advance). The codebooks are the index identity
    and are untouched, so every consumer keeps serving mid-append; only
    ONE table moves, so there is no torn-APPEND state at all (unlike
    IVF-PQ's two-table append). A torn REBUILD (crash between the
    codebook and codes rewrites) is a different tear — stamp-fenced:
    appending onto mixed build_id stamps is refused, as is serving them
    (pq_query_index). Returns the committed snapshot version (or the
    current one on a no-op).

    The IVF tier needs no sibling: its persisted artifact is only the
    trained coarse quantizer (ivf_build_index) — serving takes the
    corpus as data, so corpus growth costs nothing there (quantizer
    DRIFT is a quality question, monitored by embedding_centroid_drift,
    answered by an explicit rebuild)."""
    from hive_io_experimental_spark.input import HiveInput, ScanSpec
    from hive_io_experimental_spark.output import HiveOutput, WriteSpec

    from hive_io_experimental_spark.functions.reuse import run_concurrently

    inp = HiveInput(spark, catalog)
    # the codebook collect answers the stamp fence, the geometry probe
    # AND the encoder's closure in ONE job (previously three jobs over
    # the same KB-sized parquet — r14 optimization round, guide §1.2);
    # it overlaps the independent codes stamp probe (guide §2.6)
    codes = inp.read_table(ScanSpec(table=index_table))
    (cb_rows, cb_stamp), c_stamp = run_concurrently(
        lambda: _collect_stamped(
            "pq_append_to_index", index_table, "codebooks",
            inp.read_table(ScanSpec(table=f"{index_table}_codebooks")),
            rebuild="pq_build_index",
        ),
        lambda: _index_stamp(
            "pq_append_to_index", index_table, "codes", codes,
            rebuild="pq_build_index",
        ),
    )
    stamps = {"codebooks": cb_stamp, "codes": c_stamp}
    if len(set(stamps.values())) > 1:
        raise ValueError(
            f"pq_append_to_index: index {index_table} has mixed build_id "
            f"stamps across its tables ({stamps}) — a rebuild was torn "
            f"mid-way; appending would entrench the tear (new-codebook "
            f"encodings into an old-codebook codes table). Re-run "
            f"pq_build_index first."
        )
    bid = stamps["codes"]
    if cb_rows[0]["cv"] is None:
        raise ValueError(
            f"pq_append_to_index: empty codebook table "
            f"{index_table}_codebooks — run pq_build_index first"
        )
    num_subspaces = int(max(r["j"] for r in cb_rows) + 1)
    dsub = len(cb_rows[0]["cv"])
    codebooks = _local_codebooks(spark, cb_rows)
    if not _check_append_batch(
        "pq_append_to_index", new_vectors, num_subspaces * dsub,
        vec_col, id_col,
    ):
        return catalog.current_version(index_table)  # empty batch: no-op
    new_codes = pq_encode(
        new_vectors, codebooks.select("j", "code", "cv"), num_subspaces,
        vec_col=vec_col, id_col=id_col,
    )
    fresh = (
        new_codes.join(codes.select("id"), "id", "left_anti")
        .withColumn("build_id", F.lit(bid))
        # cut lineage: the plan anti-joins the very table the append
        # rewrites (the same-path-scan lesson, ingestion.py:377-384).
        # eager=False + count(): ONE job materializes the checkpoint AND
        # answers the emptiness probe (was checkpoint + isEmpty = two)
        .localCheckpoint(eager=False)
    )
    if fresh.count() == 0:
        return catalog.current_version(index_table)
    return HiveOutput(spark, catalog).append_table(
        WriteSpec(table=index_table), fresh, note="pq_append_to_index"
    )


def _check_append_batch(
    op: str,
    new_vectors: DataFrame,
    expect_dim: int,
    vec_col: str,
    id_col: str,
) -> bool:
    """One-job batch-hygiene fence shared by the index appends; returns
    False for an empty batch (callers no-op). A batch holding the SAME
    id twice would commit duplicate index rows (the anti-join dedups
    only against STORED ids — idempotency is cross-batch, not
    within-batch), and a NULL or wrong-dimension embedding would be
    silently dropped by the unit-vector stage or mis-sliced by the
    encoder. Both are upstream delivery bugs; both raise here naming
    the row counts (the random_projection fail-loud discipline)."""
    row = new_vectors.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(F.col(id_col)).alias("n_ids"),
        F.count(F.when(F.col(id_col).isNull(), 1)).alias("n_null_ids"),
        F.count(
            F.when(F.size(F.col(vec_col)) == expect_dim, 1)
        ).alias("n_good"),
    ).first()
    if row is None or row["n"] == 0:
        return False
    # NULL ids first, with their own message: countDistinct SKIPS NULLs,
    # so without this a NULL-id batch fell through to the duplicate
    # branch with a wrong diagnosis (and an all-NULL-id batch reported
    # "n-0 duplicates") — r13 ADVICE.
    if row["n_null_ids"] > 0:
        raise ValueError(
            f"{op}: {row['n_null_ids']} of {row['n']} batch rows have a "
            f"NULL {id_col} — index rows need a stable id for the "
            f"anti-join idempotency fence. Fix the batch's id column "
            f"first."
        )
    if row["n_ids"] < row["n"]:
        raise ValueError(
            f"{op}: the batch holds {row['n'] - row['n_ids']} duplicate "
            f"{id_col} rows — within-batch duplicates would commit twice "
            f"(the anti-join dedups only against stored ids). Dedup the "
            f"batch first."
        )
    if row["n_good"] < row["n"]:
        raise ValueError(
            f"{op}: {row['n'] - row['n_good']} of {row['n']} batch rows "
            f"have a NULL embedding or length != {expect_dim} — they "
            f"would be silently dropped or mis-encoded. Fix or filter "
            f"the batch first."
        )
    return True


def pq_query_index(
    spark,
    catalog,
    index_table: str,
    queries: DataFrame,
    k: int = 5,
    num_subspaces: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k served ENTIRELY from a persisted PQ index: the corpus
    side reads only the codes table (m longs per vector) plus the few-KB
    codebooks — the raw embedding column is never rescanned, which is
    the point of the index at 100 TB. Same small-query broadcast
    contract as pq_topk.

    Serving preconditions (raise, never silently-wrong scores — the
    ivf_pq_query_index fence): the two tables' ``build_id`` stamps must
    agree (a crash between the codebook and codes rewrites leaves NEW
    codebooks scoring OLD-codebook codes), and ``num_subspaces`` must
    match the stored codebooks' subspace count (a mismatch sums the
    wrong LUT cells — truncated or NULL scores, no error, with ANSI
    off)."""
    from hive_io_experimental_spark.input import HiveInput, ScanSpec

    _require_small_query_side(
        queries.select(F.col(id_col)), "pq_query_index (broadcast LUTs)"
    )
    from hive_io_experimental_spark.functions.reuse import run_concurrently

    inp = HiveInput(spark, catalog)
    # one codebook collect answers the stamp fence, the geometry probe
    # and the broadcast LUT build (previously three jobs over the same
    # KB-sized parquet — r14 optimization round, guide §1.2); it
    # overlaps the independent codes stamp probe (guide §2.6)
    codes = inp.read_table(ScanSpec(table=index_table))
    (cb_rows, cb_stamp), c_stamp = run_concurrently(
        lambda: _collect_stamped(
            "pq_query_index", index_table, "codebooks",
            inp.read_table(ScanSpec(table=f"{index_table}_codebooks")),
            rebuild="pq_build_index",
        ),
        lambda: _index_stamp(
            "pq_query_index", index_table, "codes", codes,
            rebuild="pq_build_index",
        ),
    )
    stamps = {"codebooks": cb_stamp, "codes": c_stamp}
    if len(set(stamps.values())) > 1:
        raise ValueError(
            f"pq_query_index: index {index_table} has mixed build_id "
            f"stamps across its tables ({stamps}) — a rebuild was torn "
            f"mid-way. Re-run pq_build_index before serving."
        )
    codes = codes.select("id", "codes")
    if cb_rows[0]["cv"] is None:
        raise ValueError(
            f"pq_query_index: empty codebook table {index_table}_codebooks"
        )
    m = int(max(r["j"] for r in cb_rows) + 1)
    if m != num_subspaces:
        raise ValueError(
            f"pq_query_index: num_subspaces={num_subspaces} does not "
            f"match the stored index ({index_table}_codebooks holds "
            f"{m} subspaces). Pass num_subspaces={m} — "
            f"a mismatch would misindex the stored codes."
        )
    dsub = len(cb_rows[0]["cv"])
    codebooks = _local_codebooks(spark, cb_rows)
    qu = _unit_vectors(queries, vec_col, id_col)
    return _pq_adc_topk(codes, qu, codebooks, k, num_subspaces, dsub)


def pq_index_consistency_check(
    spark,
    catalog,
    index_table: str,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_subspaces: int = 4,
    centroid_stride: int = 50,
    max_codes: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One-row proof the persisted index serves EXACTLY what the direct
    operator computes (same sampled codebooks -> same codes -> same
    ranked rows): n_queries, n_served (ranked rows from the stored
    index), n_mismatch (full-row anti-join both ways, must be 0). The
    ivf_index_consistency_check contract, for PQ.

    ONE plan, each leg materialized once (r14 optimization round):
    reuse() + aggregate-branch counts — the previous eager .count()
    calls recomputed the served leg 3x and the direct leg (a full
    corpus re-encode) 2x (guide §1.2; §5 reuse). The two legs are
    independent (stored-table reads vs corpus re-encode), and reuse()
    BLOCKS while AQE runs the leg's stages — so they build
    concurrently (guide §2.6: overlap independent jobs)."""
    from hive_io_experimental_spark.functions.reuse import (
        reuse, run_concurrently,
    )

    cols = ["query_id", "neighbor_id", "adc_score", "rank"]
    served, direct = run_concurrently(
        lambda: reuse(pq_query_index(
            spark, catalog, index_table, queries, k, num_subspaces,
            vec_col, id_col,
        ).select(cols)),
        lambda: reuse(pq_topk(
            corpus, queries, k, num_subspaces, centroid_stride, max_codes,
            None, vec_col, id_col,
        ).select(cols)),
    )
    mism = served.exceptAll(direct).unionAll(
        direct.exceptAll(served)
    ).agg(F.count(F.lit(1)).cast("long").alias("n_mismatch"))
    n_q = queries.select(F.col(id_col)).distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_queries")
    )
    n_served = served.agg(
        F.count(F.lit(1)).cast("long").alias("n_served")
    )
    return n_q.crossJoin(F.broadcast(n_served)).crossJoin(
        F.broadcast(mism)
    )


def ivf_pq_build_index(
    spark,
    catalog,
    index_table: str,
    corpus: DataFrame,
    centroid_stride: int | None = None,
    num_subspaces: int = 4,
    pq_stride: int = 5,
    max_codes: int | None = 128,
    codebooks: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Persist the full IVF-PQ serving structure as four catalog tables:
    the codes table ``{index_table}`` (id, codes array<long>), the
    codebook table ``{index_table}_codebooks`` (j, code, cv), the coarse
    quantizer ``{index_table}_centroids`` (cid, cv), and the inverted
    lists ``{index_table}_lists`` (cid, id). The ivf/pq_build_index
    lifecycle completed for the composed tier: build once per corpus
    snapshot, then serve any number of query batches
    (ivf_pq_query_index) touching only codes + lists (m longs + one long
    per vector — the raw embedding column is never rescanned, which is
    the point at 100 TB). Rebuild = explicit drop + recreate under the
    catalog's strict write preconditions (reference OutputConf parity —
    never a silent in-place overwrite). ``centroid_stride=None``
    auto-sizes nlist at sqrt(n) (resolve_ivf_stride); pass trained
    centroids/codebooks frames for the quality tier.

    The four tables are COUPLED (codes only make sense against the
    codebooks they were encoded with; lists against their centroids), and
    the drop-then-write sequence is not atomic: a mid-rebuild crash
    leaves mixed geometry. Every table therefore carries a shared
    ``build_id`` stamp, and ivf_pq_query_index REFUSES to serve a set of
    tables whose stamps disagree — a torn rebuild is a loud error, never
    silently-wrong scores. (The same crash-visible-not-crash-silent rule
    as the ingestion artifacts' commit order, operators/ingestion.py.)"""
    from pyspark.sql import types as T

    from hive_io_experimental_spark.output import HiveOutput, WriteSpec
    from hive_io_experimental_spark.schema import HiveTableSchema

    from hive_io_experimental_spark.functions.reuse import run_concurrently

    if centroid_stride is None:
        centroid_stride = resolve_ivf_stride(corpus.count())
    cents = corpus.filter(F.col(id_col) % centroid_stride == 0).select(
        F.col(id_col).alias("cid"), _as_double(vec_col).alias("cv")
    )
    if codebooks is None:
        codebooks = pq_codebooks_sampled(
            corpus, num_subspaces, pq_stride, max_codes, vec_col, id_col
        )
    # serve BOTH consumers of each geometry table (the Arrow closures
    # and the table writes) from one collect — previously the centroid
    # filter-scan and the codebook sample/explode/window plans each ran
    # twice per build (r14 optimization round, guide §1.2); doubles
    # round-trip py4j exactly, so the written rows are bit-identical.
    # The two collects are independent corpus-side jobs — overlapped
    # (guide §2.6).
    cent_rows, cb_rows = run_concurrently(
        lambda: [r.asDict() for r in cents.collect()],
        lambda: [r.asDict() for r in codebooks.collect()],
    )
    if not cent_rows:
        raise ValueError(
            "ivf_pq_build_index: no vector id hits the centroid_stride "
            f"({centroid_stride}); lower the stride"
        )
    if not cb_rows:
        raise ValueError("ivf_pq_build_index: empty codebook frame")
    from pyspark.sql import types as _T

    id_type = corpus.schema[id_col].dataType
    cents = spark.createDataFrame(
        [(r["cid"], r["cv"]) for r in cent_rows],
        _T.StructType([
            _T.StructField("cid", id_type),
            _T.StructField("cv", _T.ArrayType(_T.DoubleType())),
        ]),
    )
    codebooks = _local_codebooks(spark, cb_rows)
    dsub = len(cb_rows[0]["cv"])
    # ONE corpus pass yields BOTH index halves (was two: a centroid-
    # assignment pass plus a PQ-encode pass — each a full read of the
    # raw embedding column); reuse() materializes the narrow fused rows
    # once and both table writes read the blocks. spread() first: the
    # assignment pass previously ran unspread, i.e. one task on a
    # single-row-group input (r14 optimization round, guide §1.2/§2).
    from hive_io_experimental_spark.functions.reuse import reuse

    c = spread(corpus).select(
        F.col(id_col).alias("id"), _as_double(vec_col).alias("_v")
    ).withColumn("_nrm", l2_norm(F.col("_v")))
    fused = reuse(_ivf_pq_encode_assign_pandas(
        c, cent_rows, cb_rows, num_subspaces, dsub
    ))
    lists = fused.select("cid", "id")
    codes = fused.filter(F.col("codes").isNotNull()).select("id", "codes")
    out = HiveOutput(spark, catalog)
    id_type = corpus.schema[id_col].dataType
    # one stamp per rebuild; a torn rebuild leaves mixed stamps, which
    # ivf_pq_query_index rejects instead of serving mixed geometry
    import uuid

    bid = uuid.uuid4().hex
    # lists + codes are VERSIONED: ivf_pq_append_to_index folds new
    # vectors in as snapshot appends (and time-travel reads the index
    # as-of any tick); centroids + codebooks are the immutable geometry
    tables = (
        (
            f"{index_table}_centroids",
            HiveTableSchema((
                ("cid", id_type),
                ("cv", T.ArrayType(T.DoubleType())),
                ("build_id", T.StringType()),
            )),
            cents,
            False,
        ),
        (
            f"{index_table}_lists",
            HiveTableSchema((
                ("cid", id_type),
                ("id", id_type),
                ("build_id", T.StringType()),
            )),
            lists,
            True,
        ),
        (
            f"{index_table}_codebooks",
            HiveTableSchema((
                ("j", T.IntegerType()),
                ("code", T.IntegerType()),
                ("cv", T.ArrayType(T.DoubleType())),
                ("build_id", T.StringType()),
            )),
            codebooks,
            False,
        ),
        (
            index_table,
            HiveTableSchema((
                ("id", id_type),
                ("codes", T.ArrayType(T.LongType())),
                ("build_id", T.StringType()),
            )),
            codes,
            True,
        ),
    )
    for tbl, schema, _df, versioned in tables:
        if catalog.table_exists(tbl):
            catalog.drop_table(tbl, delete_data=True)
        catalog.create_table(tbl, schema, versioned=versioned)
    # the four writes are independent (any mid-way crash leaves mixed
    # stamps or an empty table, which every read path refuses) — run
    # them concurrently so the big lists/codes jobs overlap and the
    # tiny geometry writes ride their task tails (guide §2.6); lists
    # and codes both project from the reuse()d fused rows
    run_concurrently(*(
        (lambda t=tbl, fr=df: out.write_table(
            WriteSpec(table=t), fr.withColumn("build_id", F.lit(bid))
        ))
        for tbl, _s, df, _v in tables
    ))


def ivf_pq_query_index(
    spark,
    catalog,
    index_table: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    num_subspaces: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ top-k served ENTIRELY from a persisted index: queries are
    assigned to their ``nprobe`` nearest stored centroids (few-KB
    centroid table, Arrow/BLAS map-side), then scored by ADC against
    only the probed lists' stored codes. The corpus-side scan reads the
    lists table (one long per vector) and the codes table (m longs) —
    never the raw embeddings. Same small-query broadcast contract as
    ivf_pq_topk.

    Serving preconditions (raise, never silently-wrong scores): the four
    tables' ``build_id`` stamps must agree (a torn rebuild is refused —
    four limit-1 probe jobs, no full scans), and ``num_subspaces`` must
    match the stored codebooks' subspace count (a mismatch would index
    past the stored codes/LUT arrays and, with ANSI off, surface as
    silent NULL scores)."""
    from hive_io_experimental_spark.input import HiveInput, ScanSpec

    _require_small_query_side(
        queries.select(F.col(id_col)),
        "ivf_pq_query_index (broadcast probes + LUTs)",
    )
    from hive_io_experimental_spark.functions.reuse import run_concurrently

    inp = HiveInput(spark, catalog)
    # torn-rebuild fence: every table must carry the SAME build stamp.
    # The two KB-sized geometry tables are collected ONCE each — their
    # rows answer the stamp fence, the geometry probe AND the Arrow/LUT
    # closures (previously: four stamp probe jobs plus a centroid
    # collect plus a codebook geometry job — r14 optimization round,
    # guide §1.2); the corpus-sized lists/codes tables keep their
    # one-sampled-row stamp probes (no full scan). All four probe jobs
    # are independent reads of different tables — overlapped (§2.6).
    lists = inp.read_table(ScanSpec(table=f"{index_table}_lists"))
    codes = inp.read_table(ScanSpec(table=index_table))
    (cents_rows, cent_stamp), (cb_rows, cb_stamp), l_stamp, c_stamp = (
        run_concurrently(
            lambda: _collect_stamped(
                "ivf_pq_query_index", index_table, "centroids",
                inp.read_table(ScanSpec(table=f"{index_table}_centroids")),
                rebuild="ivf_pq_build_index",
            ),
            lambda: _collect_stamped(
                "ivf_pq_query_index", index_table, "codebooks",
                inp.read_table(ScanSpec(table=f"{index_table}_codebooks")),
                rebuild="ivf_pq_build_index",
            ),
            lambda: _index_stamp(
                "ivf_pq_query_index", index_table, "lists", lists,
                rebuild="ivf_pq_build_index",
            ),
            lambda: _index_stamp(
                "ivf_pq_query_index", index_table, "codes", codes,
                rebuild="ivf_pq_build_index",
            ),
        )
    )
    stamps = {"centroids": cent_stamp, "codebooks": cb_stamp,
              "lists": l_stamp, "codes": c_stamp}
    if len(set(stamps.values())) > 1:
        raise ValueError(
            f"ivf_pq_query_index: index {index_table} has mixed build_id "
            f"stamps across its tables ({stamps}) — a rebuild was torn "
            f"mid-way. Re-run ivf_pq_build_index before serving."
        )
    lists = lists.select("cid", "id")
    codes = codes.select("id", "codes")
    cent_rows = [{"cid": r["cid"], "cv": r["cv"]} for r in cents_rows]
    if cb_rows[0]["cv"] is None:
        raise ValueError(
            f"ivf_pq_query_index: empty codebook table "
            f"{index_table}_codebooks"
        )
    m = int(max(r["j"] for r in cb_rows) + 1)
    if m != num_subspaces:
        raise ValueError(
            f"ivf_pq_query_index: num_subspaces={num_subspaces} does not "
            f"match the stored index ({index_table}_codebooks holds "
            f"{m} subspaces). Pass num_subspaces={m} — "
            f"a mismatch would misindex the stored codes."
        )
    dsub = len(cb_rows[0]["cv"])
    codebooks = _local_codebooks(spark, cb_rows)
    return _ivf_pq_adc_rank(
        lists, codes, queries, cent_rows, codebooks, k, nprobe,
        num_subspaces, dsub, vec_col, id_col,
    )


def _ivf_pq_adc_rank(
    lists: DataFrame,
    codes: DataFrame,
    queries: DataFrame,
    cent_rows: list,
    codebooks: DataFrame,
    k: int,
    nprobe: int,
    num_subspaces: int,
    dsub: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """The IVF-PQ serving plan proper — nprobe centroid assignment
    (Arrow map-side over the collected few-KB centroid rows), per-query
    ADC LUTs, probed-lists-only scoring, exact rank. Shared by
    ivf_pq_query_index and the streaming twin's foreachBatch
    (streaming/similarity.py), so stream output is batch output by
    construction."""
    qv = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("_qv")
    ).withColumn("_qnrm", l2_norm(F.col("_qv")))
    probes = _assign_pandas(
        qv, "query_id", "_qv", "_qnrm", cent_rows, keep=nprobe
    ).select("cid", "query_id")
    qu = _unit_vectors(queries, vec_col, id_col)
    luts = _pq_query_luts(qu, codebooks, num_subspaces, dsub)
    inv = lists.withColumnRenamed("id", "neighbor_id").join(
        codes.withColumnRenamed("id", "neighbor_id"), "neighbor_id"
    )
    prb = probes.join(luts, "query_id")
    scored = (
        inv.join(F.broadcast(prb), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            _adc_score(num_subspaces).alias("adc_score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)


def ivf_pq_index_consistency_check(
    spark,
    catalog,
    index_table: str,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    centroid_stride: int | None = None,
    num_subspaces: int = 4,
    pq_stride: int = 5,
    max_codes: int | None = 128,
    codebooks: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One-row proof the persisted IVF-PQ index serves EXACTLY what the
    direct operator computes (same coarse lists -> same candidates; same
    codebooks -> same codes -> same ranked rows): n_queries, n_served,
    n_mismatch (full-row anti-join both ways, must be 0). The
    ivf/pq_index_consistency_check contract, for the composed tier.
    Build-parity parameters must mirror the ivf_pq_build_index call that
    produced the index — including ``codebooks=`` when the index was
    built with trained codebooks (the direct path would otherwise
    recompute sampled ones and report spurious mismatches)."""
    from hive_io_experimental_spark.functions.reuse import (
        reuse, run_concurrently,
    )

    cols = ["query_id", "neighbor_id", "adc_score", "rank"]
    # ONE plan, each leg materialized once (r14 optimization round):
    # reuse() + aggregate-branch counts — the previous eager .count()
    # calls recomputed the served leg 3x and the direct leg (a full
    # corpus re-encode + re-assign) 2x (guide §1.2 / §5). The legs are
    # independent and reuse() blocks while AQE runs a leg's stages, so
    # they build concurrently (guide §2.6).
    served, direct = run_concurrently(
        lambda: reuse(ivf_pq_query_index(
            spark, catalog, index_table, queries, k, nprobe,
            num_subspaces, vec_col, id_col,
        ).select(cols)),
        lambda: reuse(ivf_pq_topk(
            corpus, queries, k, centroid_stride, nprobe, num_subspaces,
            pq_stride, max_codes, codebooks, vec_col, id_col,
        ).select(cols)),
    )
    mism = served.exceptAll(direct).unionAll(
        direct.exceptAll(served)
    ).agg(F.count(F.lit(1)).cast("long").alias("n_mismatch"))
    n_q = queries.select(F.col(id_col)).distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_queries")
    )
    n_served = served.agg(
        F.count(F.lit(1)).cast("long").alias("n_served")
    )
    return n_q.crossJoin(F.broadcast(n_served)).crossJoin(
        F.broadcast(mism)
    )


def ivf_pq_append_to_index(
    spark,
    catalog,
    index_table: str,
    new_vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> int:
    """Incremental IVF-PQ index maintenance — the lsh_append_to_index
    sibling for the strongest-recall persisted tier: encode NEW vectors
    with the STORED codebooks and assign them to the STORED centroids,
    then commit them as snapshot APPENDs to the lists and codes tables.
    No corpus rescan, no retrain: at 100 TB this is the difference
    between a nightly delta job (|batch| × nlist assignment dots +
    |batch| × ksub encode dots) and a full re-encode of the corpus.

    Geometry is the index identity and appends never change it: the
    centroid and codebook tables are untouched, and appended rows carry
    the ORIGINAL ``build_id`` — the torn-REBUILD fence stays valid, and
    time-travel reads serve the index as-of any tick. Appending onto an
    index whose stamps already disagree is refused (fix the rebuild
    first; appending would entrench the tear).

    Two tables move, and the two appends are not atomic — the torn-
    APPEND story is therefore designed to be harmless-and-repairable
    rather than fenced: serving inner-joins lists ⋈ codes, so a vector
    present in only one table is simply not served yet (a consistent
    subset — never a wrong score), and each append anti-joins its OWN
    table's stored ids, so re-running the same batch completes whichever
    half is missing and appends nothing twice (idempotent re-delivery,
    same as the artifact appends). Lists append first, codes second;
    returns the committed snapshot version of the codes table (or the
    current one on a no-op).
    """
    from hive_io_experimental_spark.input import HiveInput, ScanSpec
    from hive_io_experimental_spark.output import HiveOutput, WriteSpec

    from hive_io_experimental_spark.functions.reuse import (
        reuse, run_concurrently,
    )

    inp = HiveInput(spark, catalog)
    # one collect per KB-sized geometry table answers stamp + geometry
    # + Arrow closures; lists/codes keep sampled-row stamp probes
    # (r14 optimization round, guide §1.2 — was 4 probes + collect +
    # geometry job). All four probe jobs are independent reads of
    # different tables — overlapped (guide §2.6).
    lists = inp.read_table(ScanSpec(table=f"{index_table}_lists"))
    codes = inp.read_table(ScanSpec(table=index_table))
    (cents_rows, cent_stamp), (cb_rows, cb_stamp), l_stamp, c_stamp = (
        run_concurrently(
            lambda: _collect_stamped(
                "ivf_pq_append_to_index", index_table, "centroids",
                inp.read_table(ScanSpec(table=f"{index_table}_centroids")),
                rebuild="ivf_pq_build_index",
            ),
            lambda: _collect_stamped(
                "ivf_pq_append_to_index", index_table, "codebooks",
                inp.read_table(ScanSpec(table=f"{index_table}_codebooks")),
                rebuild="ivf_pq_build_index",
            ),
            lambda: _index_stamp(
                "ivf_pq_append_to_index", index_table, "lists", lists,
                rebuild="ivf_pq_build_index",
            ),
            lambda: _index_stamp(
                "ivf_pq_append_to_index", index_table, "codes", codes,
                rebuild="ivf_pq_build_index",
            ),
        )
    )
    stamps = {"centroids": cent_stamp, "codebooks": cb_stamp,
              "lists": l_stamp, "codes": c_stamp}
    if len(set(stamps.values())) > 1:
        raise ValueError(
            f"ivf_pq_append_to_index: index {index_table} has mixed "
            f"build_id stamps across its tables ({stamps}) — a rebuild "
            f"was torn mid-way; appending onto it would entrench the "
            f"tear. Re-run ivf_pq_build_index first."
        )
    bid = stamps["codes"]
    if cb_rows[0]["cv"] is None:
        raise ValueError(
            f"ivf_pq_append_to_index: empty codebook table "
            f"{index_table}_codebooks"
        )
    num_subspaces = int(max(r["j"] for r in cb_rows) + 1)
    dsub = len(cb_rows[0]["cv"])
    if not _check_append_batch(
        "ivf_pq_append_to_index", new_vectors, num_subspaces * dsub,
        vec_col, id_col,
    ):
        return catalog.current_version(index_table)  # empty batch: no-op
    cent_rows = [{"cid": r["cid"], "cv": r["cv"]} for r in cents_rows]
    # ONE batch pass yields both halves (was an assignment pass plus an
    # encode pass over the same batch); spread() first — a single-file
    # batch otherwise runs the whole pass in one task (r14 optimization
    # round, guide §1.2/§2)
    c = spread(new_vectors).select(
        F.col(id_col).alias("id"), _as_double(vec_col).alias("_v")
    ).withColumn("_nrm", l2_norm(F.col("_v")))
    fused = reuse(_ivf_pq_encode_assign_pandas(
        c, cent_rows, cb_rows, num_subspaces, dsub
    ))
    new_lists = fused.select("cid", "id")
    new_codes = fused.filter(F.col("codes").isNotNull()).select(
        "id", "codes"
    )
    # per-table anti-joins (not one shared id set): after a torn append
    # the two tables disagree on which ids they hold, and each half must
    # independently complete on retry. localCheckpoint cuts lineage —
    # each plan anti-joins the very table its append rewrites (the
    # append_to_artifacts same-path-scan lesson, ingestion.py:377-384).
    # eager=False + count(): one job per half materializes the
    # checkpoint AND answers the emptiness probe (was checkpoint +
    # isEmpty = two jobs per half — r14 optimization round)
    # the two halves' checkpoint+count chains are independent reads of
    # the shared fused blocks — built and counted concurrently (guide
    # §2.6); the APPENDS below stay strictly ordered (lists first,
    # codes second — the documented torn-append direction)
    def _half(new_half, stored):
        fresh = (
            new_half.join(stored.select("id"), "id", "left_anti")
            .withColumn("build_id", F.lit(bid))
            .localCheckpoint(eager=False)
        )
        return fresh, fresh.count()

    (fresh_lists, n_lists), (fresh_codes, n_codes) = run_concurrently(
        lambda: _half(new_lists, lists),
        lambda: _half(new_codes, codes),
    )
    out = HiveOutput(spark, catalog)
    if n_lists > 0:
        out.append_table(
            WriteSpec(table=f"{index_table}_lists"), fresh_lists,
            note="ivf_pq_append_to_index",
        )
    if n_codes == 0:
        return catalog.current_version(index_table)
    return out.append_table(
        WriteSpec(table=index_table), fresh_codes,
        note="ivf_pq_append_to_index",
    )


def ivf_pq_index_repair(
    spark,
    catalog,
    index_table: str,
    corpus: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Detect — and, given the corpus, complete — a torn IVF-PQ append
    WITHOUT the original batch (the operational gap ivf_pq_append_to_
    index documents: its re-delivery repair needs the batch back).

    The two-table append (lists first, codes second) is not atomic; a
    crash between them leaves ids present in one table only. Serving
    inner-joins lists ⋈ codes, so the torn rows are invisible (a
    consistent subset, never a wrong score) — but silently unserved
    until repaired. The torn set is DERIVABLE: anti-join the two
    tables' ids both ways. Completion needs only the raw vectors for
    those ids, which the corpus (the system of record the batch came
    from) still holds: encode/assign them under the STORED geometry —
    deterministic functions of (vector, codebooks/centroids), so the
    result is bit-identical to what a re-delivered batch would have
    appended — and commit the missing halves with the stored build_id.

    Returns a one-row report (n_missing_codes, n_missing_lists,
    n_repaired_codes, n_repaired_lists): with ``corpus=None`` this is a
    pure detection verb (repaired counts 0 — the CLI ``index repair``
    dry default); with the corpus, both diffs are healed and a second
    run reports all zeros (idempotent). Raises if the corpus no longer
    holds a torn id (the tear predates a corpus erasure — rebuild), and
    refuses mixed build_id stamps (a torn REBUILD is geometry damage
    this verb must not paper over; re-run ivf_pq_build_index).

    Scale: two id-projection anti-joins (one long per indexed vector)
    plus |torn| × (nlist + ksub) repair dots — nightly-maintenance
    shaped, no corpus rescan beyond one semi-join on the torn ids."""
    from hive_io_experimental_spark.input import HiveInput, ScanSpec
    from hive_io_experimental_spark.output import HiveOutput, WriteSpec

    from hive_io_experimental_spark.functions.reuse import run_concurrently

    inp = HiveInput(spark, catalog)
    # one collect per KB-sized geometry table answers stamp + geometry
    # + Arrow closures (r14 optimization round, guide §1.2); all four
    # probe jobs are independent reads of different tables — overlapped
    # (guide §2.6)
    lists = inp.read_table(ScanSpec(table=f"{index_table}_lists"))
    codes = inp.read_table(ScanSpec(table=index_table))
    (cents_rows, cent_stamp), (cb_rows, cb_stamp), l_stamp, c_stamp = (
        run_concurrently(
            lambda: _collect_stamped(
                "ivf_pq_index_repair", index_table, "centroids",
                inp.read_table(ScanSpec(table=f"{index_table}_centroids")),
                rebuild="ivf_pq_build_index",
            ),
            lambda: _collect_stamped(
                "ivf_pq_index_repair", index_table, "codebooks",
                inp.read_table(ScanSpec(table=f"{index_table}_codebooks")),
                rebuild="ivf_pq_build_index",
            ),
            lambda: _index_stamp(
                "ivf_pq_index_repair", index_table, "lists", lists,
                rebuild="ivf_pq_build_index",
            ),
            lambda: _index_stamp(
                "ivf_pq_index_repair", index_table, "codes", codes,
                rebuild="ivf_pq_build_index",
            ),
        )
    )
    stamps = {"centroids": cent_stamp, "codebooks": cb_stamp,
              "lists": l_stamp, "codes": c_stamp}
    if len(set(stamps.values())) > 1:
        raise ValueError(
            f"ivf_pq_index_repair: index {index_table} has mixed "
            f"build_id stamps across its tables ({stamps}) — that is a "
            f"torn REBUILD (geometry damage), not a torn append; this "
            f"verb only completes missing append halves. Re-run "
            f"ivf_pq_build_index."
        )
    bid = stamps["codes"]
    list_ids = lists.select("id")
    code_ids = codes.select("id")
    # localCheckpoint: the repair appends to the very tables these
    # diffs scan (the same-path-scan lesson, ingestion.py:377-384).
    # eager=False + count(): one job per diff materializes the
    # checkpoint AND counts it (was checkpoint + count = two jobs
    # each); the two diffs are independent anti-joins — built and
    # counted concurrently (guide §2.6)
    def _diff(a, b):
        need = a.join(b, "id", "left_anti").distinct() \
            .localCheckpoint(eager=False)
        return need, need.count()

    (need_codes, n_need_codes), (need_lists, n_need_lists) = (
        run_concurrently(
            lambda: _diff(list_ids, code_ids),
            lambda: _diff(code_ids, list_ids),
        )
    )

    def _report(rc: int, rl: int) -> DataFrame:
        return spark.createDataFrame(
            [(n_need_codes, n_need_lists, rc, rl)],
            "n_missing_codes long, n_missing_lists long, "
            "n_repaired_codes long, n_repaired_lists long",
        )

    if corpus is None or (n_need_codes == 0 and n_need_lists == 0):
        return _report(0, 0)
    num_subspaces = int(max(r["j"] for r in cb_rows) + 1)
    dsub = len(cb_rows[0]["cv"])
    cent_rows = [{"cid": r["cid"], "cv": r["cv"]} for r in cents_rows]
    out = HiveOutput(spark, catalog)
    src = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("_vec")
    )

    def _encode_assign(vecs: DataFrame) -> DataFrame:
        # the ONE fused Arrow pass the build/append paths use
        # (_ivf_pq_encode_assign_pandas): each repaired half projects
        # the column it needs from the same builder — pq_encode would
        # re-collect the codebooks and re-spread per call, and the
        # fence above already guarantees every row is encodable, so
        # the fused pass is row-identical to the single-purpose
        # encoders (the r14 bit-identity argument, oracle-pinned)
        c = spread(vecs.select(
            "id", _as_double("_vec").alias("_v")
        ).withColumn("_nrm", l2_norm(F.col("_v"))))
        return _ivf_pq_encode_assign_pandas(
            c, cent_rows, cb_rows, num_subspaces, dsub
        )

    def _vectors_for(ids: DataFrame, n_ids: int, half: str) -> DataFrame:
        # eager=False: the hygiene aggregate below materializes the
        # checkpoint in the same job (was two jobs)
        vecs = src.join(ids, "id").localCheckpoint(eager=False)
        probe = vecs.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(
                F.when(
                    F.col("_vec").isNull()
                    | (F.size("_vec") != num_subspaces * dsub)
                    | (l2_norm(_as_double("_vec")) == 0),
                    1,
                )
            ).alias("n_bad"),
        ).first()
        n_found = int(probe["n"])
        if probe["n_bad"] > 0:
            # the encode/assign stages silently DROP such rows
            # (_unit_vectors filters zero-norm; the encoder mis-slices
            # wrong widths), so without this fence the repair would
            # report them repaired while leaving the index torn forever
            raise ValueError(
                f"ivf_pq_index_repair: {probe['n_bad']} of {n_ids} "
                f"corpus rows for ids missing their {half} half have a "
                f"NULL, zero-norm or wrong-length (!= "
                f"{num_subspaces * dsub}) embedding — they cannot be "
                f"re-encoded under the stored geometry and would be "
                f"silently dropped, leaving the tear in place. Fix the "
                f"corpus rows or rebuild with ivf_pq_build_index."
            )
        if n_found < n_ids:
            raise ValueError(
                f"ivf_pq_index_repair: {n_ids - n_found} of {n_ids} ids "
                f"missing their {half} half are no longer in the corpus "
                f"— the tear predates a corpus erasure, so the exact "
                f"vectors are gone. Re-run ivf_pq_build_index over the "
                f"current corpus."
            )
        if n_found > n_ids:
            raise ValueError(
                f"ivf_pq_index_repair: the corpus holds "
                f"{n_found - n_ids} duplicate rows for the {n_ids} ids "
                f"missing their {half} half — repairing from an "
                f"ambiguous corpus would commit duplicate index rows. "
                f"Dedup the corpus first."
            )
        return vecs

    repaired_codes = repaired_lists = 0
    if n_need_codes > 0:
        vecs = _vectors_for(need_codes, n_need_codes, "codes")
        fresh_codes = _encode_assign(vecs).select(
            "id", "codes"
        ).withColumn("build_id", F.lit(bid)).localCheckpoint(eager=False)
        # report what was ACTUALLY committed, never echo the need — the
        # two must be equal now that unencodable rows raise above, and a
        # divergence here is a bug worth failing loud over
        repaired_codes = fresh_codes.count()
        if repaired_codes != n_need_codes:
            raise AssertionError(
                f"ivf_pq_index_repair: encoded {repaired_codes} of "
                f"{n_need_codes} missing-codes rows — the encoder "
                f"dropped rows the corpus fence passed"
            )
        out.append_table(
            WriteSpec(table=index_table), fresh_codes,
            note="ivf_pq_index_repair",
        )
    if n_need_lists > 0:
        vecs = _vectors_for(need_lists, n_need_lists, "lists")
        fresh_lists = (
            _encode_assign(vecs)
            .select("cid", "id")
            .withColumn("build_id", F.lit(bid))
            .localCheckpoint(eager=False)
        )
        repaired_lists = fresh_lists.count()
        if repaired_lists != n_need_lists:
            raise AssertionError(
                f"ivf_pq_index_repair: assigned {repaired_lists} of "
                f"{n_need_lists} missing-lists rows — the assigner "
                f"dropped rows the corpus fence passed"
            )
        out.append_table(
            WriteSpec(table=f"{index_table}_lists"), fresh_lists,
            note="ivf_pq_index_repair",
        )
    return _report(repaired_codes, repaired_lists)


def cosine_topk_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int | None = None,
    probe_bits: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Multi-probe LSH top-k (Lv et al., "Multi-probe LSH", VLDB 2007):
    each query searches its own bucket PLUS every bucket within Hamming
    distance ``probe_bits`` of it — the classic fix for single-probe
    sign-LSH's recall ceiling. A true near neighbor that disagrees with
    the query on one plane's sign (probability rising with the angle)
    lands one bit away; probing those buckets recovers it without
    touching the corpus-side layout at all.

    Cost model: the corpus side is UNCHANGED (same one-long bucket per
    vector — the persisted artifact stays valid); only the broadcast
    query side fans out, to 1 + planes probes at probe_bits=1 (plus
    C(planes,2) at 2). Candidate volume grows by roughly the same
    factor, still a bucket-equi-join — no theta join, no corpus
    rescan. Every probe bucket is distinct, so a (query, candidate)
    pair appears at most once: no dedup stage needed before the exact
    rescore. SQL-expressible end to end (XOR on the bucket long), so
    the gate twin is an exact hash oracle.

    ``num_planes=None`` auto-sizes like cosine_topk_bucketed; with
    multiprobe the auto-dial can afford MORE planes (smaller buckets)
    for the same recall, trading candidate volume against probe count.

    The broadcast payload is queries x the probe fan-out (1 + planes at
    probe_bits=1, + C(planes, 2) at 2 — up to 466x at the 30-plane
    auto-dial ceiling), each row carrying the full fp32 vector, so the
    small-query guard is ENFORCED with a fan-out-scaled cap
    (_MAX_BROADCAST_QUERIES // fan_out). Query sets past the cap belong
    on :func:`cosine_topk_multiprobe_bucketed` — the identical probe
    set over a shuffle equi-join, no broadcast, no guard.
    """
    return _multiprobe_topk(
        corpus, queries, k, num_planes, probe_bits, vec_col, id_col,
        broadcast_queries=True,
    )


def cosine_topk_multiprobe_bucketed(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int | None = None,
    probe_bits: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Multi-probe LSH top-k for LARGE query sets: the identical Hamming
    fan-out (same buckets, same probes, same exact rescore — row-for-row
    equal output to :func:`cosine_topk_multiprobe`) but the probe-bucket
    join is a plain shuffle equi-join on the bucket long instead of a
    query-side broadcast. No size guard, no eager probe of the query
    frame's cardinality: both sides hash-partition on ``bucket``, so a
    100 M-query batch costs one shuffle of (id, vector, bucket) rows —
    the cosine_topk_bucketed scaling story, with multiprobe recall.
    Prefer the broadcast sibling when queries are guard-small (it keeps
    the corpus scan exchange-free)."""
    return _multiprobe_topk(
        corpus, queries, k, num_planes, probe_bits, vec_col, id_col,
        broadcast_queries=False,
    )


def _hamming_probe_buckets(num_planes: int, probe_bits: int) -> list:
    """The multi-probe bucket set as column expressions over ``bucket``:
    the bucket itself, every Hamming-1 XOR flip, and (probe_bits=2) every
    Hamming-2 flip. All probes are distinct, so a (query, candidate) pair
    appears at most once downstream — no dedup stage needed.
    probe_bits=0 is the single-probe (bucketed) special case."""
    flips = [F.col("bucket")]
    if probe_bits >= 1:
        flips += [
            F.col("bucket").bitwiseXOR(F.lit(1 << i)).cast("long")
            for i in range(num_planes)
        ]
    if probe_bits == 2:
        flips += [
            F.col("bucket")
            .bitwiseXOR(F.lit((1 << i) | (1 << j)))
            .cast("long")
            for i in range(num_planes)
            for j in range(i + 1, num_planes)
        ]
    return flips


def _multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    num_planes: int | None,
    probe_bits: int,
    vec_col: str,
    id_col: str,
    broadcast_queries: bool,
) -> DataFrame:
    """Shared multi-probe pipeline; the two public entry points differ
    ONLY in the final probe-bucket join strategy (guarded broadcast vs
    shuffle equi-join), so their outputs are row-identical by
    construction — asserted by tests/test_operators.py parity."""
    if probe_bits not in (1, 2):
        raise ValueError(f"probe_bits must be 1 or 2, got {probe_bits}")
    corpus = spread(corpus)
    probe = corpus.agg(
        F.count(F.lit(1)).alias("n"),
        F.first(F.size(F.col(vec_col))).alias("dim"),
    ).first()
    if num_planes is None:
        num_planes = resolve_num_planes(probe["n"])
    fan_out = 1 + num_planes
    if probe_bits == 2:
        fan_out += num_planes * (num_planes - 1) // 2
    if broadcast_queries:
        _require_small_query_side(
            queries.select(F.col(id_col)),
            f"cosine_topk_multiprobe (x{fan_out} probe fan-out)",
            cap=_MAX_BROADCAST_QUERIES // fan_out,
            escape="cosine_topk_multiprobe_bucketed (same probe set, "
            "shuffle equi-join)",
        )
    cb = hyperplane_lsh_buckets(
        corpus, num_planes, vec_col, id_col, dim=probe["dim"]
    )
    qb = hyperplane_lsh_buckets(
        queries, num_planes, vec_col, id_col, dim=probe["dim"]
    )
    qp = qb.select(
        "id",
        F.explode(
            F.array(*_hamming_probe_buckets(num_planes, probe_bits))
        ).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
    ).join(
        cb.withColumnRenamed("id", "neighbor_id"), "neighbor_id"
    ).withColumn("cnrm", l2_norm(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    ).join(
        qp.withColumnRenamed("id", "query_id"), "query_id"
    ).withColumn("qnrm", l2_norm(F.col("qv")))
    cos = _pair_cosine("qv", "qnrm", "cv", "cnrm")
    q_side = F.broadcast(q) if broadcast_queries else q
    scored = c.join(
        q_side,
        (c["bucket"] == q["bucket"])
        & (F.col("query_id") != F.col("neighbor_id")),
    ).select("query_id", "neighbor_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)


def multiprobe_recall_report(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 8,
    probe_bits: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One-row audit of what multi-probing buys: exact-top-k slots
    recovered by single-probe vs multi-probe LSH at the SAME plane
    layout (n_queries, n_exact_results, hits_single, hits_multi).
    Every stage is SQL-expressible, so the twin checks both hit counts
    EXACTLY — and hits_multi >= hits_single holds by construction (the
    probe set is a superset). Runs all three searches: this gate times
    the full audit workload."""
    exact = cosine_topk(corpus, queries, k, vec_col, id_col).select(
        "query_id", "neighbor_id"
    )
    single = cosine_topk_bucketed(
        corpus, queries, k, num_planes, vec_col, id_col
    ).select("query_id", "neighbor_id")
    multi = cosine_topk_multiprobe(
        corpus, queries, k, num_planes, probe_bits, vec_col, id_col
    ).select("query_id", "neighbor_id")
    joined = (
        exact.join(
            single.withColumn("_hs", F.lit(1)),
            ["query_id", "neighbor_id"], "left",
        )
        .join(
            multi.withColumn("_hm", F.lit(1)),
            ["query_id", "neighbor_id"], "left",
        )
    )
    return joined.agg(
        F.countDistinct("query_id").cast("long").alias("n_queries"),
        F.count(F.lit(1)).cast("long").alias("n_exact_results"),
        F.sum(F.coalesce(F.col("_hs"), F.lit(0)))
        .cast("long")
        .alias("hits_single"),
        F.sum(F.coalesce(F.col("_hm"), F.lit(0)))
        .cast("long")
        .alias("hits_multi"),
    )


def _index_stamp(op: str, index_table: str, table_label: str,
                 df, rebuild: str) -> str:
    """One sampled build_id from a persisted index table, with the two
    silent-wrong cases turned into loud errors: a MISSING build_id
    column (an index persisted before the stamp existed — rebuild to
    migrate) and an EMPTY table (a rebuild torn between drop/create and
    write — every legitimate build writes >= 1 row because empty corpora
    are refused at build time, so an empty table can ONLY be a torn
    rebuild). The empty case previously slipped through the mixed-stamp
    check (None was treated as 'no opinion') and served zero candidates
    for every query with no error."""
    if "build_id" not in df.columns:
        raise ValueError(
            f"{op}: index {index_table}'s {table_label} table has no "
            f"build_id column — it predates the torn-rebuild stamp. "
            f"Re-run {rebuild} to migrate it."
        )
    r = df.select("build_id").first()
    if r is None:
        raise ValueError(
            f"{op}: index {index_table}'s {table_label} table is EMPTY "
            f"— a rebuild was torn between create and write. Re-run "
            f"{rebuild} before serving."
        )
    return r["build_id"]


def _collect_stamped(op: str, index_table: str, table_label: str,
                     df, rebuild: str) -> tuple[list, str]:
    """Collect a KB-sized stamped geometry table (centroids/codebooks)
    ONCE and return (rows, stamp) — the stamp fence and the closure
    data in one job, where the read paths used to run a stamp probe
    job AND a separate collect/geometry job over the same tiny parquet
    (r14 optimization round, guide §1.2). Same fences as _index_stamp:
    missing build_id column and empty table raise with the same
    wording."""
    if "build_id" not in df.columns:
        raise ValueError(
            f"{op}: index {index_table}'s {table_label} table has no "
            f"build_id column — it predates the torn-rebuild stamp. "
            f"Re-run {rebuild} to migrate it."
        )
    rows = [r.asDict() for r in df.collect()]
    if not rows:
        raise ValueError(
            f"{op}: index {index_table}'s {table_label} table is EMPTY "
            f"— a rebuild was torn between create and write. Re-run "
            f"{rebuild} before serving."
        )
    return rows, rows[0]["build_id"]


def _local_codebooks(spark, cb_rows: list):
    """Rebuild the codebook frame from collected rows (exact: doubles
    round-trip py4j bit-identically) so downstream broadcasts read a
    LocalRelation instead of re-scanning the stored table."""
    from pyspark.sql import types as _T

    return spark.createDataFrame(
        [(r["j"], r["code"], r["cv"]) for r in cb_rows],
        _T.StructType([
            _T.StructField("j", _T.IntegerType()),
            _T.StructField("code", _T.IntegerType()),
            _T.StructField("cv", _T.ArrayType(_T.DoubleType())),
        ]),
    )


def lsh_build_index(
    spark,
    catalog,
    index_table: str,
    corpus: DataFrame,
    num_planes: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Persist the hyperplane-LSH bucket structure as catalog tables —
    the last cell of the persisted-index matrix (IVF, PQ, IVF-PQ already
    have build/query/consistency lifecycles; the LSH tier's bucket
    artifact was recomputed per call until now).

    Two tables: the bucket table ``{index_table}`` (id, bucket — one
    long per corpus vector) and ``{index_table}_meta`` (num_planes, dim,
    n_vectors — one row), the geometry serving needs to hash query
    vectors into the SAME plane family. At serve time the corpus-side
    plane projection (num_planes dot products per vector over the whole
    corpus, the dominant probe cost at 100 TB) is never recomputed: a
    query batch touches its probed buckets' rows plus an id-equi-join to
    fetch only CANDIDATE vectors for the exact rescore.

    The plane family is the deterministic md5 family
    (hyperplane_lsh_buckets), so stored buckets are bit-identical to a
    recompute — serving from the index equals the direct operator
    row-for-row (lsh_index_consistency_check), and the DuckDB twin stays
    an exact hash oracle. Both tables carry a shared ``build_id`` stamp;
    lsh_query_index refuses mixed stamps (the ivf_pq torn-rebuild
    fence). Rebuild = explicit drop + recreate under the catalog's
    strict write preconditions (reference OutputConf parity,
    output/HiveApiOutputFormat.java:240-262)."""
    import uuid

    from pyspark.sql import types as T

    from hive_io_experimental_spark.output import HiveOutput, WriteSpec
    from hive_io_experimental_spark.schema import HiveTableSchema

    probe = corpus.agg(
        F.count(F.lit(1)).alias("n"),
        F.first(F.size(F.col(vec_col))).alias("dim"),
    ).first()
    if probe is None or probe["n"] == 0 or probe["dim"] is None:
        raise ValueError("lsh_build_index: empty corpus")
    if num_planes is None:
        num_planes = resolve_num_planes(probe["n"])
    buckets = hyperplane_lsh_buckets(
        corpus, num_planes, vec_col, id_col, dim=probe["dim"]
    )
    bid = uuid.uuid4().hex
    id_type = corpus.schema[id_col].dataType
    meta = spark.createDataFrame(
        [(num_planes, int(probe["dim"]), int(probe["n"]), bid)],
        "num_planes int, dim int, n_vectors long, build_id string",
    )
    out = HiveOutput(spark, catalog)
    from hive_io_experimental_spark.functions.reuse import run_concurrently

    # the bucket table is VERSIONED: lsh_append_to_index folds new
    # vectors in as snapshots (and time-travel reads the index as-of any
    # ingestion tick); meta is the immutable build-time record of the
    # plane family
    tables = (
        (
            f"{index_table}_meta",
            HiveTableSchema((
                ("num_planes", T.IntegerType()),
                ("dim", T.IntegerType()),
                ("n_vectors", T.LongType()),
                ("build_id", T.StringType()),
            )),
            meta,
            False,
        ),
        (
            index_table,
            HiveTableSchema((
                ("id", id_type),
                ("bucket", T.LongType()),
                ("build_id", T.StringType()),
            )),
            buckets.withColumn("build_id", F.lit(bid)),
            True,
        ),
    )
    for tbl, schema, _df, versioned in tables:
        if catalog.table_exists(tbl):
            catalog.drop_table(tbl, delete_data=True)
        catalog.create_table(tbl, schema, versioned=versioned)
    # independent writes (mixed-stamp / empty-table crash states are
    # refused by lsh_query_index): the one-row meta write rides the
    # corpus-sized bucket write's task tail (guide §2.6)
    run_concurrently(*(
        (lambda t=tbl, fr=df: out.write_table(WriteSpec(table=t), fr))
        for tbl, _s, df, _v in tables
    ))


def lsh_append_to_index(
    spark,
    catalog,
    index_table: str,
    new_vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> int:
    """Incremental LSH index maintenance: bucket NEW vectors with the
    STORED plane family and commit them as a snapshot APPEND to the
    versioned bucket table — the ingestion-tick move for the ANN serving
    index, mirroring append_to_artifacts for the dedup artifacts. No
    corpus rescan, no rebuild: per tick the work is |batch| x num_planes
    dot products plus one narrow anti-join against the stored ids
    (idempotent — a re-delivered batch appends nothing and the table
    version does not advance). The appended rows carry the ORIGINAL
    build_id (the plane family is the index identity; appends never
    change geometry), so the torn-rebuild fence stays valid, and
    time-travel reads serve the index as-of any tick. Returns the
    committed snapshot version (or the current one on a no-op)."""
    from hive_io_experimental_spark.input import HiveInput, ScanSpec
    from hive_io_experimental_spark.output import HiveOutput, WriteSpec

    inp = HiveInput(spark, catalog)
    meta = inp.read_table(ScanSpec(table=f"{index_table}_meta")).first()
    if meta is None:
        raise ValueError(
            f"lsh_append_to_index: empty meta table {index_table}_meta — "
            f"run lsh_build_index first"
        )
    if not _check_append_batch(
        "lsh_append_to_index", new_vectors, int(meta["dim"]),
        vec_col, id_col,
    ):
        return catalog.current_version(index_table)  # empty batch: no-op
    qb = hyperplane_lsh_buckets(
        new_vectors, int(meta["num_planes"]), vec_col, id_col,
        dim=int(meta["dim"]),
    )
    stored_ids = inp.read_table(ScanSpec(table=index_table)).select("id")
    fresh = (
        qb.join(stored_ids, "id", "left_anti")
        .withColumn("build_id", F.lit(meta["build_id"]))
        # cut lineage: the append rewrites the very table this plan
        # anti-joins against (the append_to_artifacts same-path-scan
        # lesson, operators/ingestion.py:377-384). eager=False +
        # count(): one job materializes AND probes emptiness (was two)
        .localCheckpoint(eager=False)
    )
    if fresh.count() == 0:
        return catalog.current_version(index_table)
    return HiveOutput(spark, catalog).append_table(
        WriteSpec(table=index_table), fresh, note="lsh_append_to_index"
    )


def lsh_query_index(
    spark,
    catalog,
    index_table: str,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    probe_bits: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Multi-probe LSH top-k served from a PERSISTED bucket table: query
    vectors are hashed into the stored plane family (num_planes from the
    meta table), fanned out to their Hamming-``probe_bits`` probe set
    (probe_bits=0 = single-probe), and equi-joined against the stored
    buckets — the corpus-side plane projection never reruns. The exact
    rescore then fetches only candidate vectors via an id join into
    ``corpus``. Everything is a shuffle equi-join (no broadcast, no
    size guard, fully lazy) — large query batches are the design
    point, like cosine_topk_multiprobe_bucketed.

    Returns (query_id, neighbor_id, cosine, rank), row-identical to the
    direct multiprobe operators at the same plane count."""
    if probe_bits not in (0, 1, 2):
        raise ValueError(f"probe_bits must be 0, 1 or 2, got {probe_bits}")
    from hive_io_experimental_spark.input import HiveInput, ScanSpec

    from hive_io_experimental_spark.functions.reuse import run_concurrently

    inp = HiveInput(spark, catalog)
    meta_df = inp.read_table(ScanSpec(table=f"{index_table}_meta"))
    buckets = inp.read_table(ScanSpec(table=index_table))
    # two independent one-row probe jobs over different tables (§2.6)
    meta, b_stamp = run_concurrently(
        lambda: meta_df.first(),
        lambda: _index_stamp(
            "lsh_query_index", index_table, "buckets", buckets,
            rebuild="lsh_build_index",
        ),
    )
    if meta is None:
        raise ValueError(
            f"lsh_query_index: empty meta table {index_table}_meta"
        )
    if b_stamp != meta["build_id"]:
        raise ValueError(
            f"lsh_query_index: index {index_table} has mixed build_id "
            f"stamps (meta {meta['build_id']!r} vs buckets "
            f"{b_stamp!r}) — a rebuild was torn mid-way. "
            f"Re-run lsh_build_index before serving."
        )
    qb = hyperplane_lsh_buckets(
        queries, int(meta["num_planes"]), vec_col, id_col,
        dim=int(meta["dim"]),
    )
    qp = qb.select(
        F.col("id").alias("query_id"),
        F.explode(
            F.array(
                *_hamming_probe_buckets(int(meta["num_planes"]), probe_bits)
            )
        ).alias("bucket"),
    )
    cand = (
        buckets.select(F.col("id").alias("neighbor_id"), "bucket")
        .join(qp, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
    ).withColumn("cnrm", l2_norm(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    ).withColumn("qnrm", l2_norm(F.col("qv")))
    scored = (
        cand.join(c, "neighbor_id")
        .join(q, "query_id")
        .select(
            "query_id", "neighbor_id",
            _pair_cosine("qv", "qnrm", "cv", "cnrm").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)


def lsh_index_consistency_check(
    spark,
    catalog,
    index_table: str,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    probe_bits: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One-row proof the persisted bucket table serves EXACTLY what the
    direct multiprobe operator computes (deterministic plane family ->
    stored buckets == recomputed buckets -> same candidates -> same
    ranked rows): n_queries, n_served, n_mismatch (full-row anti-join
    both ways, must be 0). The ivf/pq/ivf_pq_index_consistency_check
    contract, for the LSH tier."""
    from hive_io_experimental_spark.input import HiveInput, ScanSpec

    meta = HiveInput(spark, catalog).read_table(
        ScanSpec(table=f"{index_table}_meta")
    ).first()
    if meta is None:
        raise ValueError(
            f"lsh_index_consistency_check: empty meta table "
            f"{index_table}_meta"
        )
    from hive_io_experimental_spark.functions.reuse import (
        reuse, run_concurrently,
    )

    cols = ["query_id", "neighbor_id", "cosine", "rank"]

    def _served():
        return reuse(lsh_query_index(
            spark, catalog, index_table, corpus, queries, k, probe_bits,
            vec_col, id_col,
        ).select(cols))

    def _direct():
        if probe_bits == 0:
            d = cosine_topk_bucketed(
                corpus, queries, k, int(meta["num_planes"]), vec_col,
                id_col,
            )
        else:
            d = _multiprobe_topk(
                corpus, queries, k, int(meta["num_planes"]), probe_bits,
                vec_col, id_col, broadcast_queries=False,
            )
        return reuse(d.select(cols))

    # ONE plan, each leg materialized once (r14 optimization round):
    # reuse() + aggregate-branch counts — the eager .count() calls
    # recomputed served 3x / direct 2x (guide §1.2 / §5). The legs are
    # independent and reuse() blocks while AQE runs a leg's stages, so
    # they build concurrently (guide §2.6).
    served, direct = run_concurrently(_served, _direct)
    mism = served.exceptAll(direct).unionAll(
        direct.exceptAll(served)
    ).agg(F.count(F.lit(1)).cast("long").alias("n_mismatch"))
    n_q = queries.select(F.col(id_col)).distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_queries")
    )
    n_served = served.agg(
        F.count(F.lit(1)).cast("long").alias("n_served")
    )
    return n_q.crossJoin(F.broadcast(n_served)).crossJoin(
        F.broadcast(mism)
    )
