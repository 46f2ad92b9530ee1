"""Retrieval composition over the engine's search legs: hybrid lexical +
semantic fusion (RRF) and diversity-aware reranking (MMR).

The engine already has both retrieval legs a modern corpus pipeline needs —
BM25 keyword ranking (operators/text.py:bm25_search) and the four-tier ANN
matrix (operators/similarity.py). What real serving stacks run on top is a
*fusion* layer: combine the two rankings per query (RAG retrieval, near-dup
triage, eval-set construction), and diversify the fused list so the top-k
isn't k copies of the same passage (training-data curation's "don't sample
the same document five times" problem).

  hybrid_topk_rrf        reciprocal-rank fusion (Cormack & Clarke,
                         SIGIR 2009): score(d) = Σ_legs 1/(k0 + rank_leg(d)).
                         Rank-space fusion needs no score calibration
                         between BM25 (unbounded, corpus-dependent) and
                         cosine ([-1, 1]) — which is exactly why RRF is the
                         default fusion in production hybrid search.
  mmr_diversified_topk   maximal marginal relevance (Carbonell & Goldstein,
                         SIGIR 1998): greedy top-k where each pick maximizes
                         λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s).

Scale design (100 TB corpus):
  * Both legs reduce to a bounded candidate list (``candidate_k`` /
    ``fetch_k`` rows per query) BEFORE any fusion math — the corpus-sized
    work is exactly the underlying leg operators' plans (BM25's
    filter-before-shuffle postings, the ANN tiers' bucket pruning), and the
    fusion itself only ever touches candidate-sized frames.
  * The exact-cosine leg of hybrid_topk_rrf scores against a LITERAL query
    vector: a map-side projection over the embedding scan plus one
    distributed TakeOrdered (orderBy+limit) — no join, no shuffle, no
    broadcast, no window over the corpus.
  * MMR is greedy-sequential in k but embarrassingly parallel across
    queries: pairwise candidate similarities (fetch_k² per query, bounded)
    are computed JVM-side with the engine's round-6 cosine, then one
    Arrow-batched applyInPandas group per query runs the k-step selection
    on doubles that are bit-identical to the oracle's — the Python side
    does comparisons and λ-arithmetic only, never re-derives a cosine.

Reference parity note: the reference has no search surface (SURVEY §2.2) —
this module is part of the engine's training-data-pipeline extension, like
operators/dedup.py and operators/sampling.py.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hive_io_experimental_spark.functions.hashing import portable_hash64
from hive_io_experimental_spark.functions.vectors import dot_product, l2_norm
from hive_io_experimental_spark.operators.similarity import (
    _as_double,
    _pair_cosine,
    cosine_topk,
)
from hive_io_experimental_spark.operators.text import bm25_search


def _literal_vector(vec: Sequence[float]):
    """A double-array literal column. Folded by Catalyst at plan time —
    per-row cost of scoring against it is one codegen'd fold."""
    return F.array(*[F.lit(float(x)).cast("double") for x in vec])


def cosine_topk_literal(
    corpus: DataFrame,
    query_vector: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine against ONE literal query vector.

    The single-query special case deserves its own plan shape: no query
    frame, no join of any kind — the cosine is a map-side expression over
    the corpus scan and the top-k is a distributed TakeOrdered (per-
    partition partial top-k, then a k-sized merge on the driver), so the
    whole operator is one stage. Cosine uses the engine-standard
    sequential fold + round(6) (bit-identical to the DuckDB twin).
    Returns (neighbor_id, cosine, rank); rank dense from 1 with the
    standard (cosine desc, id asc) total order.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    qv = _literal_vector(query_vector)
    # query norm computed ONCE driver-side with the same sequential left
    # fold both engines use (Python += == Spark aggregate() == DuckDB
    # list_dot_product — verified bit-identical), embedded as a literal:
    # an interpreted HOF fold over a literal array would otherwise rerun
    # per row (the CollapseProject trap, ROADMAP "known perf traps")
    acc = 0.0
    for x in query_vector:
        acc += float(x) * float(x)
    qnrm = F.lit(acc ** 0.5).cast("double")
    scored = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.round(
            F.try_divide(
                dot_product(_as_double(vec_col), qv),
                qnrm * l2_norm(_as_double(vec_col)),
            ),
            6,
        ).alias("cosine"),
    )
    top = scored.orderBy(F.col("cosine").desc(), F.col("neighbor_id")).limit(k)
    # rank over <= k rows: the single-partition window is bounded by k
    w = Window.orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def cosine_topk_batch(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Exact per-query cosine top-k against a QUERIES FRAME — the batch
    sibling of cosine_topk_literal, for external probe queries.

    Differs from similarity.cosine_topk in exactly one semantic:
    NO self-match exclusion. cosine_topk's queries are corpus rows (its
    ``query_id != neighbor_id`` filter removes the trivial self hit);
    here the query ids live in the CALLER'S namespace, so an id collision
    with a corpus vec_id is meaningless and must not drop a real
    neighbor. Same plan shape otherwise: guarded broadcast of the query
    side over one shuffle-free corpus scan, per-query rank window over
    rank-bounded rows. Returns (query_id, neighbor_id, cosine, rank).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from hive_io_experimental_spark.functions.partitioning import spread
    from hive_io_experimental_spark.operators.similarity import (
        _require_small_query_side,
    )

    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(query_vec_col).alias("qv"),
    )
    _require_small_query_side(q, "cosine_topk_batch")
    c = c.withColumn("cnrm", l2_norm(F.col("cv")))
    q = q.withColumn("qnrm", l2_norm(F.col("qv")))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "neighbor_id",
        _pair_cosine("qv", "qnrm", "cv", "cnrm").alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)


def hybrid_topk_rrf_batch(
    docs: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
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
    sem_candidates: DataFrame | None = None,
) -> DataFrame:
    """``hybrid_topk_rrf`` for a FRAME of queries: ``queries`` carries
    (query_id, terms array<string>, embedding) and every query gets its
    own fused top-k. Returns (query_id, doc_id, lex_rank, sem_rank,
    cosine, rrf_score) — the single-query schema plus query_id,
    value-identical to the single-query operator run per row
    (parity-tested).

    The single-query operator forced a curation pass scoring thousands of
    probe queries into a driver-side loop — thousands of plans over the
    same corpus. Here BOTH legs batch: the BM25 leg pays its corpus-sized
    stages once for the union vocabulary (bm25_search_batch), the
    semantic leg is one guarded broadcast of all query vectors over one
    corpus scan (cosine_topk_batch) — and the fusion stays candidate-
    sized per query (<= 2·candidate_k rows into the full-outer join and
    the rank window). rrf_score is the same exact-int64 arithmetic
    (_rrf_score_expr).

    At scales past the broadcast cap, pass ``sem_candidates`` — any
    (query_id, neighbor_id, cosine) frame from an ANN tier
    (cosine_topk_bucketed / lsh_query_index / ivf...) keyed by the SAME
    query_ids; the leg rank is recomputed here with the engine's total
    order, so any tier composes. (The BM25 leg's broadcast is the
    query-terms frame — far smaller than the vectors; it raises past the
    cap with a split-the-batch remediation.)
    """
    if candidate_k < k:
        raise ValueError(
            f"candidate_k ({candidate_k}) must be >= k ({k}): each leg "
            f"must be able to fill the fused top-k alone"
        )
    from hive_io_experimental_spark.operators.text import bm25_search_batch

    qt = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(terms_col).alias("term"),
    )
    lex = bm25_search_batch(
        docs, qt, text_col=text_col, id_col=doc_id_col,
        top_k=candidate_k,
    ).select(
        "query_id",
        F.col("doc_id").alias("id"),
        F.col("rank").alias("lex_rank"),
    )
    if sem_candidates is None:
        # the internal path's rank IS the leg rank (same total order) —
        # re-windowing it would repeat a shuffle+sort of
        # n_queries × candidate_k rows for identical values
        sem = cosine_topk_batch(
            embeddings, queries, k=candidate_k,
            vec_col=vec_col, id_col=vec_id_col,
            query_id_col=query_id_col, query_vec_col=query_vec_col,
        ).select(
            "query_id", F.col("neighbor_id").alias("id"),
            "cosine", F.col("rank").alias("sem_rank"),
        )
    else:
        # external ANN candidates come rank-free (or with a tier-specific
        # rank) — recompute with the engine's total order
        w_sem = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
        sem = (
            sem_candidates.select("query_id", "neighbor_id", "cosine")
            .withColumn(
                "sem_rank", F.row_number().over(w_sem).cast("long")
            )
            .filter(F.col("sem_rank") <= candidate_k)
            .select(
                "query_id", F.col("neighbor_id").alias("id"),
                "cosine", "sem_rank",
            )
        )
    fused = lex.join(sem, ["query_id", "id"], "full_outer").select(
        "query_id",
        F.col("id").alias("doc_id"),
        "lex_rank",
        "sem_rank",
        "cosine",
        _rrf_score_expr(rrf_k).alias("rrf_score"),
    )
    w_f = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("_rn", F.row_number().over(w_f))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _rrf_score_expr(rrf_k: int):
    """RRF score over ``lex_rank``/``sem_rank`` columns in EXACT int64
    arithmetic — no float until the final (exact) e6-integer-to-double
    conversion, so the reported 6-decimal value is bit-identical across
    engines by construction.

      term_e12(r) = HALF_UP(1e12 / (rrf_k + r))
                  = (2·1e12 + (rrf_k + r)) div (2·(rrf_k + r))
      score      = HALF_UP_e6(Σ terms_e12) / 1e6
                  = ((Σ + 500000) div 1000000) / 1e6

    Why not ROUND(double, 6): reciprocal sums can land exactly ON a
    .5e-6 boundary (1/(60+68) = 1/128 = 0.0078125 — a terminating
    binary AND 7-digit decimal), where Spark's decimal-string HALF_UP
    and DuckDB's float rounding are free to disagree; near-boundary
    values additionally hinge on float summation error. The e12
    quantization changes a score only if the true value is within
    1e-12 of a boundary — where double rounding was ill-defined anyway;
    at the default dial (rrf_k=60, candidate_k=50) the closest
    reachable score is 2.3e-10 from any boundary (exhaustively
    enumerated in tests), so reported values are unchanged. Final
    p/1e6 double division of a small integer is correctly rounded
    (IEEE) identically in both engines.
    """
    kk = int(rrf_k)
    term = (
        f"coalesce((2000000000000 + ({kk} + {{r}})) "
        f"div (2 * ({kk} + {{r}})), 0)"
    )
    e12 = f"({term.format(r='lex_rank')} + {term.format(r='sem_rank')})"
    return F.expr(
        f"cast(({e12} + 500000) div 1000000 as double) / 1000000.0"
    )


def hybrid_topk_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    terms: Sequence[str],
    query_vector: Sequence[float],
    k: int = 10,
    rrf_k: int = 60,
    candidate_k: int = 50,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Hybrid search: BM25 keyword leg + exact-cosine semantic leg, fused
    by reciprocal-rank fusion (RRF, Cormack & Clarke SIGIR 2009).

      rrf(d) = Σ_{leg hits d} 1 / (rrf_k + rank_leg(d))

    A document found by only one leg contributes that leg's term alone
    (the standard RRF treatment of non-overlap). rrf_k=60 is the
    literature default; ranks come from each leg's own total order
    (score desc, id asc), so the fusion is fully deterministic.

    Plan shape: each leg independently reduces to <= candidate_k rows
    (BM25 via its postings-sized plan, the cosine leg via one map-side
    scan + TakeOrdered), then rank assignment and the full-outer fusion
    join run on candidate-sized frames — at 100 TB the fusion cost is
    invariant in corpus size. Returns (doc_id, lex_rank, sem_rank,
    cosine, rrf_score) — ranks NULL on the leg that missed.

    rrf_score is EXACT integer arithmetic, never float (see
    _rrf_score_expr): reciprocals are e12-scaled int64 HALF_UP values,
    summed and HALF_UP-rounded to the e6 grid as integers. ROUND(double,
    6) was a live cross-engine hazard here — 1/(60+68) = 1/128 =
    0.0078125 sits exactly ON a .5e-6 boundary (so does rank 580), so
    any candidate_k >= 68 put decimal-HALF_UP (Spark) against
    float-rounding (DuckDB) on a knife edge. The integer form has no
    boundary to disagree on.
    """
    if candidate_k < k:
        raise ValueError(
            f"candidate_k ({candidate_k}) must be >= k ({k}): each leg "
            f"must be able to fill the fused top-k alone"
        )
    lex = bm25_search(
        docs, list(terms), text_col=text_col, id_col=doc_id_col,
        top_k=candidate_k,
    )
    w_lex = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    lex = lex.select(
        F.col("doc_id").alias("id"),
        F.row_number().over(w_lex).cast("long").alias("lex_rank"),
    )
    sem = cosine_topk_literal(
        embeddings, query_vector, k=candidate_k,
        vec_col=vec_col, id_col=vec_id_col,
    ).select(
        F.col("neighbor_id").alias("id"),
        "cosine",
        F.col("rank").alias("sem_rank"),
    )
    fused = (
        lex.join(sem, "id", "full_outer")
        .select(
            F.col("id").alias("doc_id"),
            "lex_rank",
            "sem_rank",
            "cosine",
            _rrf_score_expr(rrf_k).alias("rrf_score"),
        )
    )
    return fused.orderBy(F.col("rrf_score").desc(), F.col("doc_id")).limit(k)


_INTEGER_KINDS = ("long", "integer", "short", "byte")


def _require_integer_ids(op, corpus, id_col, queries, candidates) -> None:
    """The Arrow greedy stage and its SQL twin exchange ids as longs —
    enforce integer ids on EVERY frame that feeds them, not just the
    corpus: a string-keyed candidates/queries frame would otherwise slip
    through to a silent cast-to-null downstream."""

    def _check(df, col, what):
        kind = df.schema[col].dataType.typeName()
        if kind not in _INTEGER_KINDS:
            raise ValueError(
                f"{op}: integer ids required ({what}.{col} is {kind}) — "
                f"map string ids to longs first (hash or row_number) like "
                f"the embeddings-table convention."
            )

    _check(corpus, id_col, "corpus")
    if candidates is not None:
        _check(candidates, "query_id", "candidates")
        _check(candidates, "neighbor_id", "candidates")
    else:
        _check(queries, id_col, "queries")


def mmr_diversified_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    fetch_k: int = 20,
    mmr_lambda: float = 0.5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Maximal-marginal-relevance top-k (Carbonell & Goldstein SIGIR
    1998): per query, greedily select k of the fetch_k most-relevant
    candidates, each pick maximizing

      mmr(c) = λ·rel(c) − (1−λ)·max_{s ∈ selected} sim(c, s)

    (first pick: the max-sim term is 0, so it is the plain argmax of
    relevance). Ties break on (score desc, id asc) — total order, same
    in the oracle.

    Candidate generation defaults to the exact broadcast cosine_topk
    (small query sets — its guard applies); pass ``candidates`` from any
    ANN tier (cosine_topk_bucketed / lsh_query_index / ivf_topk...) to
    run the same rerank at scale: any frame with (query_id, neighbor_id,
    cosine) works, with INTEGER ids (the engine's embedding-table
    convention — the Arrow greedy stage and its SQL twin exchange ids as
    longs; enforced below).

    Determinism across engines: rel and all pairwise sims are the
    engine's round-6 JVM cosine; the Python step does ONLY double
    multiply/subtract/compare on those values (λ and 1−λ are exact
    binary doubles for the supported grid), so every comparison sees
    bit-identical doubles in Spark and DuckDB.

    Scale: pairwise sims are fetch_k² rows per query (bounded,
    documented); the greedy step is one Arrow batch per query —
    parallel across queries, O(k · fetch_k) comparisons inside.
    Returns (query_id, mmr_rank, neighbor_id, cosine, mmr_score).
    """
    if not 0.0 <= mmr_lambda <= 1.0:
        raise ValueError(f"mmr_lambda must be in [0, 1], got {mmr_lambda}")
    # keep λ on an exact-binary grid so Python's λ·rel − (1−λ)·ms is
    # bit-identical to the oracle's literal arithmetic
    if round(mmr_lambda * 16) != mmr_lambda * 16:
        raise ValueError(
            f"mmr_lambda must be a multiple of 1/16 (exact-binary grid "
            f"shared with the SQL oracle), got {mmr_lambda}"
        )
    if k < 1 or fetch_k < k:
        raise ValueError(f"need fetch_k >= k >= 1, got k={k} fetch_k={fetch_k}")
    _require_integer_ids(
        "mmr_diversified_topk", corpus, id_col, queries, candidates
    )
    if candidates is None:
        candidates = cosine_topk(
            corpus, queries, k=fetch_k, vec_col=vec_col, id_col=id_col
        )
    cand = candidates.select("query_id", "neighbor_id", "cosine")
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
    ).withColumn("cnrm", l2_norm(F.col("cv"))).withColumn(
        "_in_corpus", F.lit(True)
    )
    # LEFT join + in-plan raise: an externally supplied candidate frame
    # whose neighbor_id is missing from the corpus (stale ANN index, wrong
    # corpus) must fail LOUDLY — the earlier inner join silently shrank
    # the candidate pool, truncating the top-k (the module's fail-loud
    # contract). raise_error fires at execution on the first orphan row;
    # no extra action, no driver round-trip. The _in_corpus marker
    # separates a JOIN MISS (stale candidates) from a matched row whose
    # embedding is NULL — two different user errors with different fixes.
    cwv = (
        cand.join(vecs, "neighbor_id", "left")
        .withColumn(
            "cv",
            F.when(
                F.col("_in_corpus").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "mmr_diversified_topk: candidate neighbor_id "
                        ),
                        F.col("neighbor_id").cast("string"),
                        F.lit(
                            " has no vector in the corpus — the "
                            "candidates frame is stale or built against "
                            "a different corpus; rebuild candidates or "
                            "pass the matching corpus."
                        ),
                    )
                ).cast(vecs.schema["cv"].dataType),
            ).when(
                F.col("cv").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit("mmr_diversified_topk: corpus row "),
                        F.col("neighbor_id").cast("string"),
                        F.lit(
                            " has a NULL embedding — cosine is undefined"
                            " on it. Filter NULL/zero-norm embeddings "
                            "out of the corpus first."
                        ),
                    )
                ).cast(vecs.schema["cv"].dataType),
            ).otherwise(F.col("cv")),
        )
        .drop("_in_corpus")
    )
    a = cwv.select(
        "query_id",
        F.col("neighbor_id").alias("a_id"),
        F.col("cosine").alias("a_rel"),
        F.col("cv").alias("av"),
        F.col("cnrm").alias("anrm"),
    )
    b = cwv.select(
        F.col("query_id").alias("b_qid"),
        F.col("neighbor_id").alias("b_id"),
        F.col("cv").alias("bv"),
        F.col("cnrm").alias("bnrm"),
    )
    # LEFT join with the self-pair exclusion IN the join condition, so a
    # single-candidate query survives as one row with NULL b (a post-join
    # filter would drop its only row — the self pair)
    pairs = (
        a.join(
            b,
            (F.col("query_id") == F.col("b_qid"))
            & (F.col("a_id") != F.col("b_id")),
            "left",
        )
        .select(
            "query_id", "a_id", "a_rel", "b_id",
            _pair_cosine("av", "anrm", "bv", "bnrm").alias("pairsim"),
        )
    )
    lam = float(mmr_lambda)
    k_out = int(k)

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        qid = int(pdf["query_id"].iloc[0])
        firsts = pdf.drop_duplicates(subset=["a_id"])
        rels = {
            int(i): float(r)
            for i, r in zip(firsts["a_id"], firsts["a_rel"])
        }
        with_b = pdf[pdf["b_id"].notna()]
        sims = {
            (int(ai), int(bi)): float(s)
            for ai, bi, s in zip(
                with_b["a_id"], with_b["b_id"], with_b["pairsim"]
            )
        }
        # fail LOUDLY on NaN (a NULL round-6 cosine = a zero-norm vector
        # upstream): NaN comparisons are silently False, which would
        # truncate the selection or crown an arbitrary first pick
        if any(math.isnan(v) for v in rels.values()) or any(
            math.isnan(v) for v in sims.values()
        ):
            raise ValueError(
                f"mmr_diversified_topk: NaN relevance/similarity for "
                f"query {qid} — a zero-norm vector is among the "
                f"candidates (cosine undefined). Filter zero-norm "
                f"embeddings out of the corpus first."
            )
        selected: list[int] = []
        rows = []
        for step in range(1, k_out + 1):
            best_score = None
            best_id = None
            best_ms = None
            for cid in sorted(rels):
                if cid in selected:
                    continue
                if selected:
                    # full pair matrix within the candidate set: direct
                    # indexing (a miss would be a bug, fail loudly)
                    ms = max(sims[(cid, s)] for s in selected)
                else:
                    ms = 0.0
                score = lam * rels[cid] - (1.0 - lam) * ms
                if best_score is None or score > best_score:
                    best_score = score
                    best_id = cid
                    best_ms = ms
            if best_id is None:
                break
            selected.append(best_id)
            rows.append((qid, step, best_id, rels[best_id], best_ms))
        return pd.DataFrame(
            rows,
            columns=[
                "query_id", "mmr_rank", "neighbor_id", "cosine", "maxsim",
            ],
        )

    out = pairs.groupBy("query_id").applyInPandas(
        _greedy,
        schema=(
            "query_id long, mmr_rank long, neighbor_id long, "
            "cosine double, maxsim double"
        ),
    )
    # The REPORTED score is exact decimal arithmetic over the pick's
    # (rel, maxsim) — both are round-6 values, and λ sits on the 1/16
    # grid (<= 4 decimals), so λ·rel − (1−λ)·ms is an exact decimal in
    # both engines. Rounding the RAW double instead was a trap: at
    # λ=0.5 the raw is 0.5·(rel−ms), which lands exactly ON a .5e-6
    # rounding boundary whenever rel and ms differ by an odd 6th-decimal
    # digit — and decimal-exact HALF_UP (Spark) disagrees with
    # float-multiply rounding (DuckDB) on such boundaries. Selection
    # still compares raw doubles (identical cross-engine); only the
    # report goes through decimals.
    lam_dec = F.lit(f"{lam:.4f}").cast("decimal(6,4)")
    inv_dec = F.lit(f"{1.0 - lam:.4f}").cast("decimal(6,4)")
    return out.select(
        "query_id", "mmr_rank", "neighbor_id", "cosine",
        F.round(
            lam_dec * F.col("cosine").cast("decimal(18,6)")
            - inv_dec * F.col("maxsim").cast("decimal(18,6)"),
            6,
        ).cast("double").alias("mmr_score"),
    )


def _dcg_weight_literals(k: int) -> list[str]:
    """round(1/log2(i+1), 6) for i = 1..k, as decimal STRINGS — computed
    once here and embedded as identical literals in BOTH the Spark plan
    and the SQL twin, so no engine ever evaluates log2 (whose last-ulp
    behavior is library-specific) on the hot path or in the comparison."""
    import math

    return [f"{round(1.0 / math.log2(i + 1), 6):.6f}" for i in range(1, k + 1)]


def ranking_quality_report(
    approx: DataFrame,
    exact: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Per-query ranking quality of an ANN tier against the exact ranking:
    (query_id, n_exact, n_hits, ndcg, mrr, recall).

    The IR-standard audit completing the recall-only reports
    (multiprobe_recall_report, ivf_recall_check...): binary gains over
    the exact top-k as ground truth, position-discounted.

      DCG  = Σ_{hits} w(approx_rank),  w(i) = round(1/log2(i+1), 6)
      NDCG = DCG / IDCG,   IDCG = Σ_{i=1..n_exact} w(i)
      MRR  = 1 / first hit's approx rank (0 when nothing hits)
      recall = n_hits / n_exact

    Determinism: the k discount weights are fixed decimal literals
    (computed once driver-side — see _dcg_weight_literals) summed as
    exact DECIMAL(18,6) (order-independent, the lm-scorer trick); the
    final ratios are single double divisions. Inputs are any two frames
    with (query_id, neighbor_id, rank) — compose with every tier.

    Scale: two rank-bounded frames (<= k rows per query) joined on
    (query_id, neighbor_id), then one groupBy per side — candidate-sized
    work, independent of corpus size.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ws = _dcg_weight_literals(k)

    def _w(rank_col):
        expr = F.lit(None)
        for i, lit in enumerate(ws, start=1):
            expr = F.when(rank_col == i, F.lit(lit)).otherwise(expr)
        return expr.cast("decimal(18,6)")

    a = approx.filter(F.col("rank") <= k).select(
        "query_id", "neighbor_id", F.col("rank").alias("a_rank")
    )
    e = exact.filter(F.col("rank") <= k).select(
        "query_id", "neighbor_id", F.col("rank").alias("e_rank")
    )
    per_exact = e.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.sum(_w(F.col("e_rank"))).alias("_idcg"),
    )
    hits = a.join(e, ["query_id", "neighbor_id"])
    per_hits = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.sum(_w(F.col("a_rank"))).alias("_dcg"),
        F.min("a_rank").alias("_first"),
    )
    return (
        per_exact.join(per_hits, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).alias("n_hits"),
            F.round(
                F.coalesce(
                    F.col("_dcg").cast("double") / F.col("_idcg").cast("double"),
                    F.lit(0.0),
                ),
                6,
            ).alias("ndcg"),
            F.round(
                F.coalesce(F.lit(1.0) / F.col("_first"), F.lit(0.0)), 6
            ).alias("mrr"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0).cast("long"))
                / F.col("n_exact").cast("double"),
                6,
            ).alias("recall"),
        )
    )


def mine_contrastive_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    k_hard: int = 3,
    k_rand: int = 2,
    fetch_k: int = 20,
    max_sim: float = 0.8,
    num_buckets: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Contrastive-training negative mining: per anchor, ``k_hard`` hard
    negatives + ``k_rand`` pseudo-random negatives.
    Returns (anchor_id, neighbor_id, kind, rank, cosine).

    Hard negatives are the highest-cosine candidates BELOW ``max_sim`` —
    the ceiling excludes near-duplicates, which are presumptive false
    negatives (likely unlabeled positives); candidate generation defaults
    to the exact broadcast cosine_topk (guarded) and composes with any
    ANN tier via ``candidates``.

    Random negatives avoid the classic scale trap (a per-(anchor, corpus)
    RNG evaluation is a cross join) with a deterministic md5 bucket
    lottery: every corpus row hashes into one of ``num_buckets`` buckets
    once; each (anchor, draw j) hashes to a bucket and takes the row with
    the smallest anchor-salted md5 inside it. All equi-joins — per draw
    the work is one bucket (~corpus/num_buckets rows), linear in the
    corpus with a small constant, and the draw is a pure function of ids
    (reproducible across engines/reruns, the hash_split contract). Two
    draws landing in one bucket collapse to one pick (rare for
    num_buckets >> k_rand), and a draw whose bucket holds no eligible
    row produces no pick (only possible when the corpus is not >>
    num_buckets — lower ``num_buckets`` for tiny corpora); the anchor
    itself and its hard picks are excluded. ``cosine`` is reported for
    rand picks too (one id-join for the pair vectors) so downstream can
    audit for accidental positives.
    """
    if k_hard < 0 or k_rand < 0 or k_hard + k_rand == 0:
        raise ValueError(
            f"need k_hard >= 0, k_rand >= 0, k_hard + k_rand > 0 "
            f"(got {k_hard}, {k_rand})"
        )
    if candidates is None:
        candidates = cosine_topk(
            corpus, anchors, k=fetch_k, vec_col=vec_col, id_col=id_col
        )
    w_hard = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    hard = (
        candidates.select(
            F.col("query_id").alias("anchor_id"), "neighbor_id", "cosine"
        )
        .filter(F.col("cosine") < F.lit(float(max_sim)))
        .withColumn("rank", F.row_number().over(w_hard).cast("long"))
        .filter(F.col("rank") <= k_hard)
        .select(
            "anchor_id", "neighbor_id", F.lit("hard").alias("kind"),
            "rank", "cosine",
        )
    )
    if k_rand == 0:
        return hard
    # `hard` feeds BOTH the rand leg's anti-join and the final union —
    # without reuse() the candidate-generation plan (the expensive part)
    # executes twice (functions/reuse.py; the semantic_dedup lesson)
    from hive_io_experimental_spark.functions.reuse import reuse

    hard = reuse(hard)
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.pmod(
            portable_hash64(
                F.concat(F.lit("negbkt:"), F.col(id_col).cast("string"))
            ),
            F.lit(num_buckets),
        ).alias("bucket"),
    )
    probes = (
        anchors.select(F.col(id_col).alias("anchor_id"))
        .withColumn("j", F.explode(F.array(*[F.lit(j) for j in range(1, k_rand + 1)])))
        .withColumn(
            "bucket",
            F.pmod(
                portable_hash64(
                    F.concat(
                        F.lit("negsel:"),
                        F.col("anchor_id").cast("string"),
                        F.lit(":"),
                        F.col("j").cast("string"),
                    )
                ),
                F.lit(num_buckets),
            ),
        )
    )
    lottery = portable_hash64(
        F.concat(
            F.lit("neglot:"),
            F.col("anchor_id").cast("string"),
            F.lit(":"),
            F.col("neighbor_id").cast("string"),
        )
    )
    w_draw = Window.partitionBy("anchor_id", "j").orderBy(
        F.col("_lot"), F.col("neighbor_id")
    )
    draws = (
        probes.join(cb, "bucket")
        .filter(F.col("neighbor_id") != F.col("anchor_id"))
        .join(
            hard.select("anchor_id", "neighbor_id"),
            ["anchor_id", "neighbor_id"],
            "left_anti",
        )
        .withColumn("_lot", lottery)
        .withColumn("_rn", F.row_number().over(w_draw))
        .filter(F.col("_rn") == 1)
    )
    # duplicate bucket draws collapse: keep each neighbor once (min j)
    w_rand = Window.partitionBy("anchor_id").orderBy(
        F.col("j"), F.col("neighbor_id")
    )
    rand = (
        draws.groupBy("anchor_id", "neighbor_id")
        .agg(F.min("j").alias("j"))
        .withColumn("rank", F.row_number().over(w_rand).cast("long"))
        .select("anchor_id", "neighbor_id", F.lit("rand").alias("kind"), "rank")
    )
    # report the true cosine of rand pairs (audit for accidental positives)
    av = corpus.select(
        F.col(id_col).alias("anchor_id"), _as_double(vec_col).alias("av")
    ).withColumn("anrm", l2_norm(F.col("av")))
    nv = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("nv")
    ).withColumn("nnrm", l2_norm(F.col("nv")))
    rand = (
        rand.join(av, "anchor_id")
        .join(nv, "neighbor_id")
        .select(
            "anchor_id", "neighbor_id", "kind", "rank",
            _pair_cosine("av", "anrm", "nv", "nnrm").alias("cosine"),
        )
    )
    return hard.unionByName(rand)
