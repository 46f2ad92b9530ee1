"""Hash-family switching: md5 (portable default) vs xxhash64 (fast path).

The dedup DECISIONS must be family-invariant for exact dedup (same groups,
different key values); probabilistic operators (minhash/simhash) just need
to run and produce well-formed results under the fast family.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_io_experimental_spark import conf
from hive_io_experimental_spark.operators import dedup, text


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "THE QUICK   BROWN FOX JUMPS OVER THE LAZY DOG"),  # dup of 1
            (3, "an entirely different document about spark engines"),
        ],
        "doc_id long, text string",
    )


def test_exact_dedup_groups_family_invariant(spark):
    df = _docs(spark)
    by_md5 = {
        (r.kept_id, r.dup_count)
        for r in dedup.exact_dedup(df, hash_family="md5").collect()
    }
    by_xx = {
        (r.kept_id, r.dup_count)
        for r in dedup.exact_dedup(df, hash_family="xxhash64").collect()
    }
    assert by_md5 == by_xx == {(1, 2), (3, 1)}


def test_conf_switches_family(spark):
    df = _docs(spark)
    md5_fp = {r.doc_id: r.fp for r in text.fingerprint(df).collect()}
    try:
        conf.HASH_FAMILY.set(spark, "xxhash64")
        xx_fp = {r.doc_id: r.fp for r in text.fingerprint(df).collect()}
    finally:
        spark.conf.unset(conf.HASH_FAMILY.key)
    # same identity structure (docs 1,2 share a fingerprint), different values
    assert md5_fp[1] == md5_fp[2] and xx_fp[1] == xx_fp[2]
    assert md5_fp[3] != md5_fp[1] and xx_fp[3] != xx_fp[1]
    assert md5_fp[1] != xx_fp[1]


def test_minhash_and_simhash_run_under_xxhash64(spark):
    df = _docs(spark)
    cands = dedup.minhash_lsh_candidates(df, hash_family="xxhash64").collect()
    # identical normalized docs agree on every signature -> every band
    assert {(r.a_id, r.b_id) for r in cands} >= {(1, 2)}
    sims = {r.id: r.simhash for r in dedup.simhash(df, hash_family="xxhash64").collect()}
    assert sims[1] == sims[2]  # same tokens -> same simhash
    assert sims[3] != sims[1]
