"""Bloom membership tier, sweep-line concurrency, transitions, quota cap.

The bloom contract under test is the one the runtime-filter pattern relies
on at scale: NO false negative ever (a pruned fact row can always be
dropped safely), merge is OR (associative/commutative/idempotent — at-
least-once delivery safe), and state size is bounded by m, not by data.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hive_io_experimental_spark.operators import incremental as inc
from hive_io_experimental_spark.operators import sampling, temporal


def _keys(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "user_id long")


def test_bloom_no_false_negatives_and_merge_oneshot(spark):
    a = _keys(spark, range(0, 60))
    b = _keys(spark, range(40, 100))
    m, k = 512, 3
    merged = inc.merge_bloom_states(
        inc.bloom_state(a, "user_id", m, k),
        inc.bloom_state(b, "user_id", m, k),
    )
    oneshot = inc.bloom_state(
        _keys(spark, range(0, 100)), "user_id", m, k
    )
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in oneshot.collect()
    }
    # idempotence: folding a state into itself changes nothing
    again = inc.merge_bloom_states(merged, merged)
    assert {tuple(r) for r in again.collect()} == {
        tuple(r) for r in merged.collect()
    }
    # every inserted key reads maybe_member = 1 (no false negatives)
    mem = inc.bloom_membership(
        merged, _keys(spark, range(0, 100)), "user_id", m, k
    )
    assert all(r.maybe_member == 1 for r in mem.collect())


def test_bloom_state_is_bounded_by_m(spark):
    m, k = 256, 4
    state = inc.bloom_state(_keys(spark, range(10_000)), "user_id", m, k)
    rows = state.collect()
    assert len(rows) <= m // 32
    # saturated filter: every word's bits fit in 32 bits and are positive
    assert all(0 < r.bits < (1 << 32) for r in rows)


def test_bloom_prune_stats_contract(spark):
    fact = _keys(spark, list(range(0, 1000)) * 2).withColumnRenamed(
        "user_id", "fkey"
    )
    dim = _keys(spark, range(0, 50)).withColumnRenamed("user_id", "dkey")
    row = inc.bloom_prune_stats(
        fact, "fkey", dim, "dkey", m_bits=256, k_hashes=3
    ).collect()[0]
    assert row.n_fact == 2000
    assert row.n_joined == 100  # 50 keys x 2 occurrences
    assert row.n_missed == 0  # the no-false-negative contract
    assert row.n_pass == row.n_joined + row.n_false_pos
    assert row.n_pass <= row.n_fact


def test_max_concurrent_sessions_hand_case(spark):
    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ev(uid, minutes, eid):
        return (uid, base + dt.timedelta(minutes=minutes), eid)

    rows = [
        # three users whose sessions overlap inside hour 10:
        # u1 [0, 20], u2 [10, 30], u3 [15, 25] -> peak 3
        ev(1, 0, 1), ev(1, 20, 2),
        ev(2, 10, 3), ev(2, 30, 4),
        ev(3, 15, 5), ev(3, 25, 6),
        # u4: session spanning into hour 11 [50, 70] — concurrency carries
        # across the bucket boundary via the hour-base prefix
        ev(4, 50, 7), ev(4, 70, 8),
        # u5: point session inside hour 11 at minute 65 while u4 is open
        ev(5, 65, 9),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long"
    )
    got = {
        r.hour_epoch: r.max_concurrent
        for r in temporal.max_concurrent_sessions(df).collect()
    }
    h10 = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    assert got == {h10: 3, h10 + 3600: 2}


def test_event_transitions_hand_case(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base + dt.timedelta(minutes=i), i + 1, t)
        for i, t in enumerate(["a", "b", "a", "b"])
    ] + [
        (2, base + dt.timedelta(minutes=i), 100 + i, t)
        for i, t in enumerate(["a", "a"])
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {
        (r.from_type, r.to_type): (r.n, r.prob_e6)
        for r in temporal.event_transitions(df).collect()
    }
    # from 'a': a->b twice, a->a once; from 'b': b->a once
    assert got[("a", "b")] == (2, 666666)
    assert got[("a", "a")] == (1, 333333)
    assert got[("b", "a")] == (1, 1000000)


def test_quota_cap_sample_deterministic_and_capped(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    capped = sampling.quota_cap_sample(docs, cap=7)
    sizes = {
        r.source: r.n
        for r in capped.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    orig = {
        r.source: r.n
        for r in docs.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert sizes == {s: min(7, n) for s, n in orig.items()}
    # rerun picks the identical rows, and under a different partitioning
    a = {tuple(r) for r in capped.select("source", "doc_id").collect()}
    b = {
        tuple(r)
        for r in sampling.quota_cap_sample(docs.repartition(13), cap=7)
        .select("source", "doc_id")
        .collect()
    }
    assert a == b


def test_inverted_index_build_and_search(spark):
    from hive_io_experimental_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha"),
            (2, "beta gamma"),
            (3, "alpha delta"),
            (4, "beta beta beta"),
        ],
        "doc_id long, text string",
    )
    idx = {r.term: (r.df, r.tf_total, r.postings)
           for r in T.inverted_index(docs).collect()}
    assert idx["alpha"] == (2, 3, "1,3")
    assert idx["beta"] == (3, 5, "1,2,4")
    assert idx["delta"] == (1, 1, "3")
    # posting cap keeps the numerically-first ids
    capped = {r.term: r.postings
              for r in T.inverted_index(docs, max_postings=2).collect()}
    assert capped["beta"] == "1,2"
    # AND semantics: only doc 1 has both alpha and beta; ranked by tf
    hits = [(r.doc_id, r.tf_total)
            for r in T.keyword_search(docs, ["alpha", "beta"]).collect()]
    assert hits == [(1, 3)]


def test_inverted_index_posting_order_is_numeric(spark):
    from hive_io_experimental_spark.operators import text as T

    docs = spark.createDataFrame(
        [(i, "zeta") for i in (2, 10, 1, 30)], "doc_id long, text string"
    )
    row = T.inverted_index(docs).collect()[0]
    assert row.postings == "1,2,10,30"  # numeric, not lexicographic


def test_bigram_lm_repetition_scores_low(spark):
    from hive_io_experimental_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            # doc 1+2: the dominant 'a b' transition context
            (1, "a b a b a b a b"),
            (2, "a b a b"),
            # doc 3: same words, novel transitions (b b, a a)
            (3, "b b a a"),
            (4, "solo"),  # < 2 tokens: no row
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: (r.n_bigrams, float(r.avg_bits))
            for r in T.bigram_lm_scores(docs).collect()}
    assert 4 not in rows
    assert rows[1][0] == 7 and rows[2][0] == 3 and rows[3][0] == 3
    # predictable alternation scores fewer bits than novel transitions
    assert rows[1][1] < rows[3][1]


def test_merge_inverted_indexes_equals_oneshot(spark, sf_dir):
    from hive_io_experimental_spark.operators import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merged = T.merge_inverted_indexes(
        T.inverted_index(docs.filter(F.col("doc_id") % 2 == 0)),
        T.inverted_index(docs.filter(F.col("doc_id") % 2 == 1)),
    )
    oneshot = T.inverted_index(docs)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, oneshot.collect())
    )


def test_events_hopping_covering_windows(spark):
    from hive_io_experimental_spark.operators import relational

    base = dt.datetime(2024, 1, 1, 10, 7, 0)  # inside the 10:00 hour
    df = spark.createDataFrame(
        [(1, base, 1, "click", 2.5)],
        "user_id long, ts timestamp, event_id long, event_type string,"
        " value double",
    )
    rows = sorted(
        (r.window_start, r.n_events, r.sum_value_e4)
        for r in relational.events_hopping(df).collect()
    )
    t = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    slide_floor = t - t % 900
    # one event -> exactly 4 covering 60m/15m windows, newest start first
    assert rows == [
        (slide_floor - j * 900, 1, 25000) for j in range(3, -1, -1)
    ]


def test_bm25_ranks_rarer_term_higher(spark):
    from hive_io_experimental_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            (1, "common common common rare"),
            (2, "common other words here"),
            (3, "common stuff and more things"),
            (4, "filler filler filler filler"),
        ],
        "doc_id long, text string",
    )
    rows = [(r.doc_id, r.n_terms_hit, r.score)
            for r in T.bm25_search(docs, ["common", "rare"]).collect()]
    # doc 1 hits both terms and 'rare' has higher idf -> ranked first
    assert rows[0][0] == 1 and rows[0][1] == 2
    assert {d for d, _, _ in rows} == {1, 2, 3}
    assert all(s > 0 for _, _, s in rows)
    # total order: scores non-increasing
    assert all(rows[i][2] >= rows[i + 1][2] for i in range(len(rows) - 1))


def test_phrase_search_adjacent_in_order_only(spark):
    from hive_io_experimental_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            (1, "big red fox"),          # exact match
            (2, "big red red fox"),      # adjacency broken
            (3, "red fox big"),          # order broken
            (4, "the big red fox saw a big red fox"),  # two occurrences
            (5, "big red"),              # shorter than phrase
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_occurrences
           for r in T.phrase_search(docs, "big red fox").collect()}
    assert got == {1: 1, 4: 2}


def test_embedding_centroid_drift(spark):
    from hive_io_experimental_spark.operators import similarity as S

    def vecs(rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )

    ref = vecs([(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0),
                (3, [0.0, 5.0], 1)])
    # label 0 shifted by (0, 3); label 1 identical
    cur = vecs([(4, [1.0, 3.0], 0), (5, [1.0, 3.0], 0),
                (6, [0.0, 5.0], 1)])
    got = {r.label: (r.n_ref, r.n_cur, r.l2_shift)
           for r in S.embedding_centroid_drift(ref, cur).collect()}
    assert got[0] == (2, 2, 3.0)
    assert got[1] == (1, 1, 0.0)


def test_latest_by_key_keeps_newest(spark):
    from hive_io_experimental_spark.operators import relational

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (1, base, 1, "signup"),
            (1, base + dt.timedelta(hours=1), 2, "click"),
            # same ts as event 2: event_id tiebreaker keeps the higher id
            (1, base + dt.timedelta(hours=1), 3, "purchase"),
            (2, base, 4, "view"),
        ],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    got = {r.user_id: (r.event_id, r.event_type)
           for r in relational.latest_by_key(
               df, ["user_id"], ["ts", "event_id"]).collect()}
    assert got == {1: (3, "purchase"), 2: (4, "view")}


def test_funnel_time_boxed_window_semantics(spark):
    from hive_io_experimental_spark.operators import relational

    base = dt.datetime(2024, 1, 1)

    def ev(uid, hours, eid, etype):
        return (uid, base + dt.timedelta(hours=hours), eid, etype)

    rows = [
        # u1 converts fully inside 24h windows
        ev(1, 0, 1, "signup"), ev(1, 5, 2, "click"), ev(1, 10, 3, "purchase"),
        # u2: click 30h after signup -> outside the window, funnel stops
        ev(2, 0, 4, "signup"), ev(2, 30, 5, "click"), ev(2, 31, 6, "purchase"),
        # u3: click BEFORE signup then nothing after -> step 2 not matched
        ev(3, 5, 7, "click"), ev(3, 10, 8, "signup"),
        # u4: purchase within 24h of signup but BEFORE the click -> the
        # sequential match needs purchase after the matched click
        ev(4, 0, 9, "signup"), ev(4, 2, 10, "purchase"), ev(4, 4, 11, "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {r.step_index: r.n_users
           for r in relational.funnel_time_boxed(df).collect()}
    # signups: u1, u2, u3, u4; windowed clicks: u1, u4; purchases: u1
    assert got == {1: 4, 2: 2, 3: 1}


def test_containment_catches_quoted_subset(spark):
    from hive_io_experimental_spark.operators import dedup

    quote = "alpha beta gamma delta epsilon zeta eta theta"
    wrapper = (
        "intro words here first " + quote + " and then a very long tail "
        "of unrelated filler content continuing on and on with more words"
    )
    docs = spark.createDataFrame(
        [(1, quote), (2, wrapper), (3, "completely different text body")],
        "doc_id long, text string",
    )
    cont = {(r.a_id, r.b_id): r.containment
            for r in dedup.ngram_containment_pairs(
                docs, threshold=0.9).collect()}
    # doc 1's shingles all appear in doc 2 -> containment 1.0
    assert cont.get((1, 2)) == 1.0
    # jaccard on the same pair is well below 0.8 (the union is large)
    jac = {(r.a_id, r.b_id)
           for r in dedup.ngram_jaccard_pairs(docs, threshold=0.8).collect()}
    assert (1, 2) not in jac


def test_max_concurrent_counts_carried_in_sessions(spark):
    """An hour whose only boundary events are session ENDS still peaked
    at the carried-in concurrency while those sessions were open — the
    end's decrement must not be read before the peak (review finding:
    the naive per-hour max reported base-1 here)."""
    base = dt.datetime(2024, 1, 1, 10, 50, 0)
    rows = [
        # one session [10:50, 11:10] spanning the hour boundary
        (1, base, 1),
        (1, base + dt.timedelta(minutes=20), 2),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long"
    )
    got = {r.hour_epoch: r.max_concurrent
           for r in temporal.max_concurrent_sessions(df).collect()}
    h10 = int(
        base.replace(minute=0).replace(tzinfo=dt.timezone.utc).timestamp()
    )
    # hour 10: the session starts (peak 1); hour 11: only the end delta,
    # but the session was still open -> peak 1, not 0
    assert got == {h10: 1, h10 + 3600: 1}


def test_search_normalizes_query_terms(spark):
    from hive_io_experimental_spark.operators import text as T

    docs = spark.createDataFrame(
        [(1, "apple pie with apple sauce"), (2, "don t stop believing")],
        "doc_id long, text string",
    )
    # capitalization and duplicates in the query normalize away
    hits = [(r.doc_id, r.tf_total)
            for r in T.keyword_search(docs, ["Apple", "PIE", "apple"]).collect()]
    assert hits == [(1, 3)]
    # punctuation splits like the corpus tokenizer: "don't" -> don, t
    assert [r.doc_id for r in T.phrase_search(docs, "Don't stop").collect()] \
        == [2]
    bm = T.bm25_search(docs, ["APPLE"])
    assert [r.doc_id for r in bm.collect()] == [1]
    import pytest

    with pytest.raises(ValueError):
        T.keyword_search(docs, ["!!!"])


def test_merge_inverted_indexes_string_ids(spark):
    """String doc ids merge in the BUILD's (lexicographic) order with
    id_kind='string' and equal the one-shot index; the default numeric
    path raises instead of silently nulling string ids into a corrupt
    prefix (ADVICE r5)."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from hive_io_experimental_spark.operators import text as T

    docs = spark.createDataFrame(
        [("d-10", "alpha beta"), ("d-9", "alpha gamma"),
         ("d-2", "alpha beta beta"), ("d-11", "gamma")],
        "doc_id string, text string",
    )
    a = T.inverted_index(docs.filter(F.col("doc_id").isin("d-10", "d-2")),
                         max_postings=2)
    b = T.inverted_index(docs.filter(F.col("doc_id").isin("d-9", "d-11")),
                         max_postings=2)
    merged = T.merge_inverted_indexes(a, b, max_postings=2,
                                      id_kind="string")
    oneshot = T.inverted_index(docs, max_postings=2)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, oneshot.collect())
    )
    with pytest.raises(SparkRuntimeException, match="non-numeric doc id"):
        T.merge_inverted_indexes(a, b, max_postings=2).collect()
    with pytest.raises(ValueError, match="id_kind"):
        T.merge_inverted_indexes(a, b, id_kind="uuid")
