"""Scale-path storage features: bucketed co-located joins and key salting."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_io_experimental_spark.functions.skew import salted_count
from hive_io_experimental_spark.plans.inspect import scan_plan_report
from hive_io_experimental_spark.sources.bucketing import read_bucketed, write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    try:
        write_bucketed(orders, "b_orders", ("o_custkey",), n_buckets=8)
        write_bucketed(customer, "b_customer", ("c_custkey",), n_buckets=8)
        joined = (
            read_bucketed(spark, "b_orders")
            .hint("merge")  # forbid broadcast: prove the BUCKETS align
            .join(
                read_bucketed(spark, "b_customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .select("o_orderkey", "c_name")
        )
        rep = scan_plan_report(joined)
        assert rep["num_exchanges"] == 0, "bucketed join must not shuffle"
        assert rep["num_broadcasts"] == 0
        # sanity: result matches the plain (shuffling) join
        plain = orders.join(
            customer, F.col("o_custkey") == F.col("c_custkey")
        ).count()
        assert joined.count() == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_salted_count_matches_plain(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        r["event_type"]: r["cnt"]
        for r in salted_count(events, "event_type", n_salts=8).collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_salted_join_matches_plain_join(spark):
    """Salted equi-join returns exactly the plain join's multiset, both
    inner and left, including unmatched big-side rows."""
    import pytest

    from hive_io_experimental_spark.functions.skew import salted_join

    big = spark.createDataFrame(
        [(1, i) for i in range(500)]          # hot key 1
        + [(2, i) for i in range(5)] + [(9, 0)],  # 9 has no match
        "k long, payload long",
    )
    small = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "unused")], "k long, name string"
    )

    for how in ("inner", "left"):
        plain = sorted(
            (r["k"], r["payload"], r["name"])
            for r in big.join(small, ["k"], how).collect()
        )
        salted = sorted(
            (r["k"], r["payload"], r["name"])
            for r in salted_join(big, small, ["k"], n_salts=8,
                                 how=how).collect()
        )
        assert salted == plain and len(plain) >= 505

    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, ["k"], how="right")


def test_lsh_hot_bucket_cap_bounds_candidates(spark):
    """Adversarial corpus: one template (identical text) holds 30% of the
    docs, so all its band buckets are hot. Uncapped, that one template
    emits B^2/2 candidate pairs; with the bucket cap the hot buckets are
    dropped BEFORE the self-join, real near-dups elsewhere still surface,
    and the pair volume is bounded (the df-cut semantics on band buckets;
    hiveio.dedup.max_lsh_bucket is the knob)."""
    from hive_io_experimental_spark.operators import dedup

    template = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, template) for i in range(30)]
    rows += [
        (100 + i,
         f"unique document number {i} carries distinct content token{i} "
         f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}")
        for i in range(68)
    ]
    # a genuine near-dup pair outside the hot bucket
    near = ("genuine near duplicate content with shared shingle stream "
            "one two three four five six seven eight nine ten")
    rows += [(900, near), (901, near + " eleven")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    unbounded = dedup.minhash_lsh_candidates(docs, max_bucket_size=None)
    capped = dedup.minhash_lsh_candidates(docs, max_bucket_size=20)
    unb = {(r.a_id, r.b_id) for r in unbounded.collect()}
    cap = {(r.a_id, r.b_id) for r in capped.collect()}

    template_pairs_unb = {p for p in unb if p[0] < 30 and p[1] < 30}
    template_pairs_cap = {p for p in cap if p[0] < 30 and p[1] < 30}
    assert len(template_pairs_unb) == 30 * 29 // 2  # quadratic blow-up
    assert template_pairs_cap == set()  # hot bucket dropped
    assert (900, 901) in cap  # real near-dups still found
    # every surviving bucket holds <= 20 docs -> global candidate bound
    assert len(cap) <= len(unb) - len(template_pairs_unb)


def test_lsh_bucket_report_accounts_for_drops(spark):
    """lsh_bucket_report makes the cap's recall cost visible: on a corpus
    where one template dominates, the report's dropped counts match the
    hot buckets the cap removes — and an uncapped report drops nothing."""
    from hive_io_experimental_spark.operators import dedup

    template = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, template) for i in range(30)]
    rows += [
        (100 + i, f"unique doc {i} token{i} alpha{i} beta{i} gamma{i}")
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = dedup.lsh_bucket_report(docs, max_bucket_size=20).first()
    # identical docs share identical signatures -> all 4 of the template's
    # band buckets hold 30 members and are over the cap
    assert capped.n_dropped_buckets == 4
    assert capped.dropped_member_rows == 4 * 30
    assert capped.max_bucket == 30

    uncapped = dedup.lsh_bucket_report(docs, max_bucket_size=None).first()
    assert uncapped.n_dropped_buckets == 0
    assert uncapped.dropped_member_rows == 0
    assert uncapped.n_buckets == capped.n_buckets


def test_lsh_bucket_cap_conf_knob(spark):
    """The session conf drives the default cap; 0 disables it."""
    from hive_io_experimental_spark import conf
    from hive_io_experimental_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, "same text in every single document here") for i in range(12)],
        "doc_id long, text string",
    )
    prev = conf.LSH_MAX_BUCKET.get(spark)
    try:
        conf.LSH_MAX_BUCKET.set(spark, 5)
        assert dedup.minhash_lsh_candidates(docs).count() == 0
        conf.LSH_MAX_BUCKET.set(spark, 0)  # unbounded
        assert dedup.minhash_lsh_candidates(docs).count() == 12 * 11 // 2
    finally:
        conf.LSH_MAX_BUCKET.set(spark, prev)
