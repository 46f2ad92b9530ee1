"""Property-based tests (hypothesis) for the dedup/fingerprint guarantees.

These pin the mathematical CONTRACTS the operators advertise, on adversarial
random inputs — not just golden examples:

  * MinHash-LSH: documents with identical normalized token streams agree on
    every signature component, hence on every band -> they are ALWAYS
    candidates (recall 1.0 for exact dups, any banding).
  * Winnowing: two documents sharing a substring of length >= k + window - 1
    share at least one fingerprint (the scheme's coverage guarantee).

Row counts and example counts are kept small: each example spins Spark jobs.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]

doc_strategy = st.lists(st.sampled_from(WORDS), min_size=3, max_size=12)


@settings(max_examples=6, deadline=None)
@given(words=doc_strategy, perm=st.permutations([" ", "  ", "\t"]))
def test_exact_dup_always_lsh_candidate(spark, words, perm):
    """Same token stream under different whitespace/case => candidate pair,
    for every random document hypothesis draws."""
    from hive_io_experimental_spark.operators import dedup

    a = " ".join(words)
    b = perm[0].join(w.upper() for w in words)  # same tokens, different text
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, "unrelated filler totally different words here")],
        "doc_id long, text string",
    )
    cands = {
        (r.a_id, r.b_id) for r in dedup.minhash_lsh_candidates(df).collect()
    }
    assert (1, 2) in cands


@settings(max_examples=6, deadline=None)
@given(
    shared=st.text(alphabet="abcdefg", min_size=8, max_size=16),
    prefix_a=st.text(alphabet="hijklmn", min_size=0, max_size=8),
    suffix_b=st.text(alphabet="opqrstu", min_size=0, max_size=8),
)
def test_winnowing_shared_substring_guarantee(spark, shared, prefix_a, suffix_b):
    """Shared substring of length >= k + window - 1 (= 8 with k=5, window=4)
    => at least one common fingerprint. Holds for every random draw."""
    from hive_io_experimental_spark.operators.text import winnowing_fingerprints

    df = spark.createDataFrame(
        [(1, prefix_a + shared), (2, shared + suffix_b)],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(df, k=5, window=4).collect()
    by_doc: dict[int, set] = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc.get(1, set()) & by_doc.get(2, set())


@settings(max_examples=6, deadline=None)
@given(
    values=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),       # hour bucket
            st.sampled_from(["click", "view"]),
            st.floats(min_value=-100, max_value=100,
                      allow_nan=False, allow_infinity=False),
        ),
        min_size=1,
        max_size=12,
    ),
    split=st.integers(min_value=2, max_value=4),
)
def test_incremental_rollup_associativity(spark, values, split):
    """Rollup state merged from ANY sharding of the input equals the
    one-shot aggregate — the mergeability contract (exact integer
    accumulators) on random values including awkward doubles."""
    from hive_io_experimental_spark.operators import incremental

    rows = [
        (i, typ, float(v), hour * 3_600_000)
        for i, (hour, typ, v) in enumerate(values)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double, ms long"
    ).selectExpr("event_id", "event_type", "value",
                 "timestamp_millis(ms) AS ts")
    key = lambda r: (r["hour_epoch"], r["event_type"])  # noqa: E731
    one_shot = sorted(incremental.finalize_rollup(
        incremental.hourly_rollup_state(df)
    ).collect(), key=key)
    shards = [
        incremental.hourly_rollup_state(df.filter(f"event_id % {split} = {i}"))
        for i in range(split)
    ]
    merged = sorted(incremental.finalize_rollup(
        incremental.merge_rollup_states(*shards)
    ).collect(), key=key)
    assert one_shot == merged


def test_hash_split_deterministic_partition_and_stable(spark):
    """hash_split: labels partition the corpus, are stable across reruns
    and across adding rows, and fractions must sum to 1."""
    import pytest

    from hive_io_experimental_spark.operators.sampling import hash_split

    df = spark.range(2000).selectExpr("id AS doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    assert a == b  # rerun-stable
    assert set(a.values()) <= {"train", "val", "test"}
    # adding rows never reassigns existing ones
    bigger = spark.range(4000).selectExpr("id AS doc_id")
    c = {r["doc_id"]: r["split"] for r in hash_split(bigger).collect()}
    assert all(c[k] == v for k, v in a.items())
    # roughly the requested proportions (hash-uniform; loose bounds)
    n_train = sum(1 for v in a.values() if v == "train")
    assert 0.9 < n_train / len(a) <= 1.0

    with pytest.raises(ValueError, match="sum to"):
        hash_split(df, fractions={"train": 0.5, "val": 0.1}).collect()


@settings(max_examples=6, deadline=None)
@given(
    n_tokens=st.integers(min_value=0, max_value=120),
    chunk=st.integers(min_value=2, max_value=16),
    overlap=st.integers(min_value=0, max_value=8),
)
def test_chunk_documents_covers_and_reconstructs(spark, n_tokens, chunk,
                                                 overlap):
    """For ANY (doc length, chunk size, overlap<chunk): chunks cover every
    token exactly once after overlap removal, i.e. dropping the first
    `overlap` tokens of every non-first chunk and concatenating in
    chunk_id order reproduces the original token stream."""
    from hypothesis import assume

    from hive_io_experimental_spark.operators import text as text_ops

    assume(overlap < chunk)
    tokens = [f"t{i}" for i in range(n_tokens)]
    df = spark.createDataFrame(
        [(1, " ".join(tokens))], "doc_id long, text string"
    )
    rows = sorted(
        (r["chunk_id"], r["start_token"], r["chunk_text"])
        for r in text_ops.chunk_documents(
            df, chunk_tokens=chunk, overlap=overlap
        ).collect()
    )
    if n_tokens == 0:
        assert rows == []
        return
    rebuilt = []
    prev_end = 0
    for cid, start, ctext in rows:
        toks = ctext.split()
        assert start == cid * (chunk - overlap)
        # every emitted chunk must contribute at least one new token
        # (no tail window fully contained in its predecessor)
        assert start + len(toks) > prev_end
        prev_end = start + len(toks)
        rebuilt.extend(toks if cid == 0 else toks[overlap:])
    assert rebuilt == tokens


def test_hash_weighted_sample_deterministic_and_monotone(spark):
    from hive_io_experimental_spark.operators.sampling import (
        hash_weighted_sample,
    )

    df = spark.range(4000).selectExpr(
        "id AS doc_id", "(id % 100) / 100.0 AS w"
    )
    a = sorted(r["doc_id"] for r in
               hash_weighted_sample(df, "w").collect())
    b = sorted(r["doc_id"] for r in
               hash_weighted_sample(df, "w").collect())
    assert a == b  # rerun-stable
    # weight 0 never kept, weight ~1 kept at ~rate 0.99
    zero = [d for d in a if d % 100 == 0]
    assert zero == []
    hi = sum(1 for d in a if d % 100 == 99)
    assert hi > 25  # of 40 rows at w=.99
    # acceptance rate grows with weight overall
    lo_rate = sum(1 for d in a if d % 100 < 20) / 800
    hi_rate = sum(1 for d in a if d % 100 >= 80) / 800
    assert hi_rate > lo_rate + 0.4


def test_hll_distinct_state_merge_exactness(spark):
    """Sketches merged from ANY batching equal the one-shot sketch's
    estimates exactly, and the estimate is close to truth."""
    from pyspark.sql import functions as F

    from hive_io_experimental_spark.operators import incremental

    df = spark.range(20_000).selectExpr(
        "id AS event_id",
        "id % 500 AS user_id",
        "CASE WHEN id % 2 = 0 THEN 'click' ELSE 'buy' END AS event_type",
        "timestamp_millis(1700000000000 + (id % 3) * 3600000) AS ts",
    )
    b1 = df.filter("event_id % 2 = 0")
    b2 = df.filter("event_id % 2 = 1")

    merged = incremental.finalize_distinct(
        incremental.merge_distinct_states(
            incremental.hourly_distinct_state(b1),
            incremental.hourly_distinct_state(b2),
        )
    )
    oneshot = incremental.finalize_distinct(
        incremental.hourly_distinct_state(df)
    )
    m = {(r[0], r[1]): r[2] for r in merged.collect()}
    o = {(r[0], r[1]): r[2] for r in oneshot.collect()}
    assert m == o and len(m) == 6  # 3 hours x 2 types

    true = {
        (r["hour_epoch"], r["event_type"]): r["d"]
        for r in df.selectExpr(
            "unix_micros(ts) div 3600000000 * 3600 AS hour_epoch",
            "event_type", "user_id",
        ).groupBy("hour_epoch", "event_type")
        .agg(F.countDistinct("user_id").alias("d")).collect()
    }
    for k, est in m.items():
        assert abs(est - true[k]) / true[k] < 0.05, (k, est, true[k])


@settings(max_examples=5, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=25), min_size=5,
                  max_size=60),
    split=st.integers(min_value=1, max_value=6),
    k=st.integers(min_value=2, max_value=5),
)
def test_topk_sketch_bounds_always_valid(spark, keys, split, k):
    """For ANY key stream, ANY batch split, and ANY sketch capacity: every
    key the merged sketch reports carries bounds containing its exact
    count, and the span-dedup-style guarantee holds — a key whose true
    count strictly exceeds every shard's residual bound must be reported."""
    from hive_io_experimental_spark.operators import incremental as inc

    rows = [(i, kk) for i, kk in enumerate(keys)]
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    a = inc.topk_sketch_state(
        df.filter(f"event_id % {split + 1} = 0"), k=k, n_shards=3
    )
    b = inc.topk_sketch_state(
        df.filter(f"event_id % {split + 1} <> 0"), k=k, n_shards=3
    )
    merged = inc.merge_topk_sketches(a, b, k=k)
    rep = {
        r.key: (r.est_min, r.est_max)
        for r in inc.heavy_hitters_from_sketch(merged, top_n=100).collect()
    }
    truth: dict[int, int] = {}
    for kk in keys:
        truth[kk] = truth.get(kk, 0) + 1
    for key, (lo, hi) in rep.items():
        assert lo <= truth[key] <= hi, (key, lo, hi, truth[key])
    # residual bound per shard of the merged state
    resid = {
        r.shard: r.hi
        for r in merged.filter("key IS NULL").collect()
    }
    for key, n in truth.items():
        if n > resid.get(key % 3, 0):
            assert key in rep, (key, n, resid)


@settings(max_examples=5, deadline=None)
@given(
    off_a=st.integers(min_value=0, max_value=12),
    off_b=st.integers(min_value=0, max_value=12),
    span_words=st.integers(min_value=4, max_value=8),
)
def test_span_dedup_detects_shared_window_at_any_offsets(
    spark, off_a, off_b, span_words
):
    """The span-window guarantee: any shared run of >= window tokens is
    detected regardless of where it sits in each document, because every
    duplicated substring of length >= W contains a duplicated W-window.
    Filler tokens are doc-unique so the shared span is the only overlap."""
    from hive_io_experimental_spark.operators import dedup

    w = 4
    shared = " ".join(f"shared{i}" for i in range(span_words))
    a = " ".join(
        [f"fa{i}" for i in range(off_a)] + [shared] + ["enda", "endaa"]
    )
    b = " ".join(
        [f"fb{i}" for i in range(off_b)] + [shared] + ["endb", "endbb"]
    )
    df = spark.createDataFrame(
        [(0, a), (1, b)], "doc_id long, text string"
    )
    hot = dedup.duplicated_spans(df, window_tokens=w).collect()
    assert hot, (a, b)
    assert all(r.n_docs == 2 for r in hot)
    per_doc = {
        r.doc_id: r
        for r in dedup.strip_duplicated_spans(df, window_tokens=w).collect()
    }
    # every token of the shared span (and nothing of the unique filler
    # ends) is removed from both docs
    for doc in (0, 1):
        assert per_doc[doc].n_removed == span_words
        assert "shared" not in per_doc[doc].clean_text


@settings(max_examples=6, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=10_000),
                  min_size=1, max_size=60),
    split=st.integers(min_value=2, max_value=5),
    m=st.sampled_from([128, 512, 2048]),
    k=st.integers(min_value=1, max_value=5),
)
def test_bloom_contract_no_false_negatives_any_batching(
    spark, keys, split, m, k
):
    """The bloom tier's contract on adversarial inputs: however a key set
    is batched into states, the ⊕-fold equals the one-shot filter word
    for word (OR is associative/commutative/idempotent), and EVERY
    inserted key reads maybe_member=1 — the no-false-negative guarantee
    the runtime-filter join pruning relies on to be safe."""
    from functools import reduce

    from hive_io_experimental_spark.operators import incremental as inc

    def frame(vals):
        return spark.createDataFrame([(v,) for v in vals], "user_id long")

    batches = [
        [v for i, v in enumerate(keys) if i % split == j]
        for j in range(split)
    ]
    states = [
        inc.bloom_state(frame(b), "user_id", m, k)
        for b in batches if b
    ]
    folded = reduce(inc.merge_bloom_states, states)
    oneshot = inc.bloom_state(frame(keys), "user_id", m, k)
    assert sorted(map(tuple, folded.collect())) == sorted(
        map(tuple, oneshot.collect())
    )
    mem = inc.bloom_membership(folded, frame(keys), "user_id", m, k)
    assert all(r.maybe_member == 1 for r in mem.collect())


# ---------------------------------------------------------------------------
# retrieval composition contracts
# ---------------------------------------------------------------------------

vec_strategy = st.lists(
    st.lists(
        st.floats(min_value=-1.0, max_value=1.0, allow_nan=False,
                  allow_infinity=False, width=32),
        min_size=4, max_size=4,
    ).filter(lambda v: any(abs(x) > 1e-3 for x in v)),
    min_size=4, max_size=8,
)


@settings(max_examples=5, deadline=None)
@given(vecs=vec_strategy)
def test_mmr_picks_come_from_candidates_and_first_is_argmax(spark, vecs):
    """MMR contract on random embeddings: picks are a subset of the exact
    top-fetch_k candidate set, ranks are contiguous from 1, and the FIRST
    pick per query is the plain relevance argmax (λ·rel − 0)."""
    from hive_io_experimental_spark.operators import retrieval, similarity

    corpus = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    queries = corpus.filter("vec_id = 0")
    fetch_k = 4
    cands = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(corpus, queries, k=fetch_k).collect()
    }
    best = {
        r.query_id: r.neighbor_id
        for r in similarity.cosine_topk(corpus, queries, k=1).collect()
    }
    got = retrieval.mmr_diversified_topk(
        corpus, queries, k=3, fetch_k=fetch_k, mmr_lambda=0.5
    ).collect()
    ranks: dict[int, list[int]] = {}
    for r in got:
        assert (r.query_id, r.neighbor_id) in cands
        ranks.setdefault(r.query_id, []).append(r.mmr_rank)
        if r.mmr_rank == 1:
            assert r.neighbor_id == best[r.query_id]
    for q, rk in ranks.items():
        assert sorted(rk) == list(range(1, len(rk) + 1))


@settings(max_examples=5, deadline=None)
@given(
    docs=st.lists(doc_strategy, min_size=3, max_size=5),
    terms=st.lists(st.sampled_from(WORDS), min_size=1, max_size=2,
                   unique=True),
)
def test_rrf_score_is_the_rank_formula(spark, docs, terms):
    """Hybrid RRF contract on random corpora: every fused row's score is
    exactly 1/(60+lex_rank) + 1/(60+sem_rank) with NULL legs contributing
    zero, and result ids come from the union of the two legs."""
    import pytest as _pytest

    from hive_io_experimental_spark.operators import retrieval

    ddf = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    edf = spark.createDataFrame(
        [(i, [1.0 * (i % 3), 1.0, 0.5 * i]) for i in range(len(docs))],
        "vec_id long, embedding array<double>",
    )
    got = retrieval.hybrid_topk_rrf(
        ddf, edf, list(terms), [1.0, 0.5, 0.25], k=len(docs) + 2,
        candidate_k=len(docs) + 2,
    ).collect()
    assert len(got) > 0  # the semantic leg always has candidates
    for r in got:
        want = 0.0
        if r.lex_rank is not None:
            want += 1.0 / (60 + r.lex_rank)
        if r.sem_rank is not None:
            want += 1.0 / (60 + r.sem_rank)
        assert r.rrf_score == _pytest.approx(want, abs=1e-6)
        assert r.lex_rank is not None or r.sem_rank is not None


@settings(max_examples=5, deadline=None)
@given(docs=st.lists(doc_strategy, min_size=2, max_size=4))
def test_bpe_merge_monotonicity_and_closure(spark, docs):
    """BPE contracts on random corpora: merged symbols are always the
    concat of their parts; every merge strictly reduces the corpus-wide
    token count by the merged pair's occurrence count (> 0); and applying
    MORE merges never increases a document's token count."""
    from hive_io_experimental_spark.operators import text as T
    from pyspark.sql import functions as F

    ddf = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    merges = T.bpe_train(ddf, num_merges=6).collect()
    for m in merges:
        assert m.merged == m.left + m.right
    assert len({(m.left, m.right) for m in merges}) == len(merges)

    def total(n):
        ms = [(m.left, m.right) for m in merges[:n]]
        return (
            T.bpe_segment_counts(ddf, ms)
            .agg(F.sum("n_bpe_tokens").alias("t"))
            .first()["t"]
        )

    totals = [total(n) for n in (0, len(merges) // 2, len(merges))]
    assert totals[0] >= totals[1] >= totals[2]


@settings(max_examples=8, deadline=None)
@given(
    lex=st.one_of(st.none(), st.integers(min_value=1, max_value=500)),
    sem=st.one_of(st.none(), st.integers(min_value=1, max_value=500)),
    rrf_k=st.integers(min_value=1, max_value=200),
)
def test_rrf_integer_scoring_is_exact_half_up(spark, lex, sem, rrf_k):
    """_rrf_score_expr contract on arbitrary dials: the emitted double is
    EXACTLY HALF_UP_e6(HALF_UP_e12(1/(k+lex)) + HALF_UP_e12(1/(k+sem)))
    computed in exact rational arithmetic — no float anywhere in the
    reference computation, so this pins the integer pipeline itself."""
    from fractions import Fraction

    from hive_io_experimental_spark.operators.retrieval import (
        _rrf_score_expr,
    )

    if lex is None and sem is None:
        return  # a fused row always has at least one leg
    df = spark.createDataFrame(
        [(lex, sem)], "lex_rank long, sem_rank long"
    )
    got = df.select(_rrf_score_expr(rrf_k).alias("s")).first()["s"]

    def term_e12(r):
        if r is None:
            return 0
        d = rrf_k + r
        return (2 * 10**12 + d) // (2 * d)

    e12 = term_e12(lex) + term_e12(sem)
    want = Fraction((e12 + 500_000) // 1_000_000, 10**6)
    assert got == float(want)


@settings(max_examples=4, deadline=None)
@given(
    docs=st.lists(doc_strategy, min_size=2, max_size=4),
    n_merges=st.integers(min_value=1, max_value=8),
)
def test_bpe_arrow_equals_literal_on_any_corpus(spark, docs, n_merges):
    """The two appliers are row-identical for every random corpus and
    trained merge list — the contract bpe_segment_from_vocab's routing
    relies on."""
    from hive_io_experimental_spark.operators import text as T

    ddf = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    merges = [
        (r.left, r.right)
        for r in T.bpe_train(ddf, num_merges=n_merges).collect()
    ]
    lit = {tuple(r) for r in T.bpe_segment_counts(ddf, merges).collect()}
    arrow = {
        tuple(r) for r in T.bpe_segment_counts_arrow(ddf, merges).collect()
    }
    assert arrow == lit


@settings(max_examples=4, deadline=None)
@given(
    docs=st.lists(doc_strategy, min_size=3, max_size=5),
    terms_a=st.lists(st.sampled_from(WORDS), min_size=1, max_size=2,
                     unique=True),
    terms_b=st.lists(st.sampled_from(WORDS), min_size=1, max_size=3,
                     unique=True),
)
def test_bm25_batch_equals_single_on_any_terms(spark, docs, terms_a,
                                               terms_b):
    """bm25_search_batch == per-query bm25_search for every random corpus
    and term-set pair (ranks, hits, and round-6 decimal scores)."""
    from hive_io_experimental_spark.operators import text as T

    ddf = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    qt = spark.createDataFrame(
        [(1, t) for t in terms_a] + [(2, t) for t in terms_b],
        "query_id long, term string",
    )
    batch = T.bm25_search_batch(ddf, qt, top_k=len(docs)).collect()
    for qid, terms in ((1, terms_a), (2, terms_b)):
        single = {
            (r.doc_id, r.n_terms_hit, r.score)
            for r in T.bm25_search(ddf, list(terms),
                                   top_k=len(docs)).collect()
        }
        got = {
            (r.doc_id, r.n_terms_hit, r.score)
            for r in batch
            if r.query_id == qid
        }
        assert got == single, f"query {qid}"


@settings(max_examples=6, deadline=None)
@given(
    vec=st.lists(
        st.floats(min_value=-8.0, max_value=8.0,
                  allow_nan=False, allow_infinity=False),
        min_size=4, max_size=10,
    ),
    out_dim=st.integers(min_value=1, max_value=3),
)
def test_random_projection_exact_fold_on_any_vector(spark, vec, out_dim):
    """Every projected component equals the Python sequential ± fold
    bit-for-bit, for arbitrary vectors and output dims — the exactness
    contract the DuckDB twin depends on."""
    from hive_io_experimental_spark.operators.similarity import (
        _rp_component,
        random_projection,
    )

    corpus = spark.createDataFrame(
        [(0, vec)], "vec_id long, embedding array<double>"
    )
    got = random_projection(corpus, out_dim=out_dim).first()["projected"]
    for j in range(out_dim):
        acc = 0.0
        for d, x in enumerate(vec):
            acc += x * _rp_component(j, d)
        assert got[j] == acc


@settings(max_examples=4, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.lists(st.sampled_from(WORDS), min_size=0, max_size=6),
            st.sampled_from(["de", "en", "fr"]),
        ),
        min_size=2, max_size=10,
    ),
    split=st.data(),
)
def test_nb_incremental_fold_exact_on_any_split(spark, tmp_path_factory,
                                                docs, split):
    """The nb_update_model contract on adversarial random corpora and
    ARBITRARY batch boundaries: build(b1) + update(b2) equals
    build(b1 ∪ b2) bit-identically on all three stored tables —
    including empty-token docs, labels confined to one side of the
    split, and an empty update batch — for every corpus/split
    hypothesis draws."""
    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.input import HiveInput, ScanSpec
    from hive_io_experimental_spark.operators import text as T

    rows = [(i, " ".join(w), lang) for i, (w, lang) in enumerate(docs)]
    cut = split.draw(st.integers(min_value=0, max_value=len(rows)))
    b1, b2 = rows[:cut], rows[cut:]
    if not b1:  # build refuses empty frames by contract; fold the other way
        b1, b2 = b2, b1
    schema = "doc_id long, text string, lang string"
    wh = tmp_path_factory.mktemp("nbprop")
    cat = Catalog(str(wh))
    T.nb_build_model(
        spark, cat, "default.nb_p_inc",
        spark.createDataFrame(b1, schema), label_col="lang",
    )
    T.nb_update_model(
        spark, cat, "default.nb_p_inc",
        spark.createDataFrame(b2, schema) if b2
        else spark.createDataFrame([], schema),
        label_col="lang",
    )
    T.nb_build_model(
        spark, cat, "default.nb_p_full",
        spark.createDataFrame(rows, schema), label_col="lang",
    )
    inp = HiveInput(spark, cat)
    for suffix in ("", "_priors", "_meta"):
        a = inp.read_table(
            ScanSpec(table=f"default.nb_p_inc{suffix}")
        ).drop("build_id", "last_update_fp")
        b = inp.read_table(
            ScanSpec(table=f"default.nb_p_full{suffix}")
        ).drop("build_id", "last_update_fp")
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), (
            f"fold != retrain on {suffix or 'likelihoods'} "
            f"(cut={cut}, n={len(rows)})"
        )
