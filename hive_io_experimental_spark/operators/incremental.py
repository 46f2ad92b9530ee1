"""Incremental rollup maintenance (continuous-aggregate shape).

A 100 TB event pipeline never re-aggregates history: it keeps a rollup
table of MERGEABLE partial state and folds each new batch in. These
operators implement that contract on the engine's own read/write path:

  hourly_rollup_state   events -> (hour_epoch, event_type, n_events,
                        sum_value_e4) partial state. The value sum is kept
                        as fixed-point e4 micro-units in a LONG — exact,
                        associative, and storable through the reference's
                        type lattice (which has no DECIMAL, HiveType
                        lattice parity: types.py / common/HiveType.java
                        35-233).
  merge_rollup_states   union + re-aggregate: state ⊕ state -> state.
                        Associative and commutative, so batches can land
                        in any order and any grouping — the property that
                        makes the rollup restartable and shardable.
  finalize_rollup       state -> user-facing rollup (double value sums).

Incremental(b1) ⊕ Incremental(b2) == OneShot(b1 ∪ b2) exactly — not just
approximately — because every accumulator is integer. The driver-gate
query proves that identity against the one-shot DuckDB oracle after
round-tripping the first batch's state through a catalog table.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hive_io_experimental_spark.operators.relational import ensure_event_time

_E4 = 10_000  # fixed-point scale for value sums (4 decimal places)


def hourly_rollup_state(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Aggregate one batch of events into mergeable hourly partial state.

    One shuffle with map-side partial aggregation; the state is one row
    per (hour, event_type) — bounded by time x type cardinality, not by
    event volume. Value sums become exact e4 fixed-point longs
    (decimal(14,4) * 10^4 is integral by construction).
    """
    ev = ensure_event_time(events, ts_col)
    hour_epoch = (
        F.expr(f"unix_micros({ts_col}) div 3600000000") * F.lit(3600)
    ).alias("hour_epoch")
    v_e4 = (F.col("value").cast("decimal(14,4)") * _E4).cast("long")
    return ev.groupBy(hour_epoch, F.col("event_type")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(v_e4).alias("sum_value_e4"),
    )


def merge_rollup_states(*states: DataFrame) -> DataFrame:
    """Fold any number of partial states into one: union + re-sum.

    Integer sums are associative/commutative, so this is exact regardless
    of batch order or how history was sharded. The union is a metadata
    operation; the single shuffle is on the (hour, type) state key.
    """
    unioned = reduce(DataFrame.unionByName, states)
    return unioned.groupBy("hour_epoch", "event_type").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value_e4").alias("sum_value_e4"),
    )


def finalize_rollup(state: DataFrame) -> DataFrame:
    """Publish the user-facing rollup from partial state (one pure map).

    Groups whose events were fully retracted by CDC deltas
    (rollup_delta_from_cdc) carry n_events = 0 — dropped here: a
    published rollup row with zero events is a tombstone, not a result.
    """
    return (
        state.filter(F.col("n_events") > 0)
        .select(
            "hour_epoch",
            "event_type",
            "n_events",
            (F.col("sum_value_e4") / F.lit(float(_E4))).alias("sum_value"),
        )
    )


def rollup_delta_from_cdc(
    cdc: DataFrame, ts_col: str = "ts",
    change_col: str = "_change_type",
) -> DataFrame:
    """Signed partial state from a CDC stream (operators/diff.py shape).

    Completes the continuous-aggregate contract for CORRECTIONS, not just
    appends: inserts and update_postimages contribute +1/+value,
    deletes and update_preimages contribute -1/-value, so
    ``merge_rollup_states(state, rollup_delta_from_cdc(diff))`` equals
    the from-scratch rollup of the corrected table EXACTLY — integer
    accumulators make retraction lossless (the float-sum version of this
    drifts, which is why the state is e4 fixed-point). Unknown change
    types raise at plan build (fail fast, not silent miscounts).

    Same single-shuffle plan shape as hourly_rollup_state.
    """
    ev = ensure_event_time(cdc, ts_col)
    sign = (
        F.when(
            F.col(change_col).isin("insert", "update_postimage"), F.lit(1)
        )
        .when(
            F.col(change_col).isin("delete", "update_preimage"), F.lit(-1)
        )
        .otherwise(
            F.raise_error(
                F.concat(F.lit("unknown change type: "), F.col(change_col))
            ).cast("int")
        )
    )
    hour_epoch = (
        F.expr(f"unix_micros({ts_col}) div 3600000000") * F.lit(3600)
    ).alias("hour_epoch")
    v_e4 = (F.col("value").cast("decimal(14,4)") * _E4).cast("long")
    return ev.groupBy(hour_epoch, F.col("event_type")).agg(
        F.sum(sign).alias("n_events"),
        F.sum(sign * v_e4).alias("sum_value_e4"),
    )


def hourly_distinct_state(
    events: DataFrame, ts_col: str = "ts", id_col: str = "user_id",
    lg_k: int = 12,
) -> DataFrame:
    """Mergeable DISTINCT-COUNT state: one HLL sketch per (hour, type).

    count-distinct is the aggregate exact incremental state CANNOT carry
    (distinct is not a sum); the standard answer is a mergeable sketch.
    Spark's Datasketches HLL (hll_sketch_agg) gives ~1-2% error at
    lg_k=12 with a 4 KB-bounded binary state per group — the state table
    stays (hours x types) rows no matter how many events fold in, and
    sketches from any batching merge to the IDENTICAL sketch the one-shot
    aggregate builds (merge-exactness, pinned by test). Plan shape: same
    single partial-aggregated shuffle as hourly_rollup_state.
    """
    ev = ensure_event_time(events, ts_col)
    hour_epoch = (
        F.expr(f"unix_micros({ts_col}) div 3600000000") * F.lit(3600)
    ).alias("hour_epoch")
    return ev.groupBy(hour_epoch, F.col("event_type")).agg(
        F.hll_sketch_agg(F.col(id_col), F.lit(lg_k)).alias("user_sketch")
    )


def merge_distinct_states(*states: DataFrame) -> DataFrame:
    """state ⊕ state for the HLL tier: union + re-merge sketches."""
    unioned = reduce(DataFrame.unionByName, states)
    return unioned.groupBy("hour_epoch", "event_type").agg(
        F.hll_union_agg("user_sketch").alias("user_sketch")
    )


def finalize_distinct(state: DataFrame) -> DataFrame:
    """Publish (hour_epoch, event_type, approx_distinct_users)."""
    return state.select(
        "hour_epoch",
        "event_type",
        F.hll_sketch_estimate("user_sketch").alias("approx_distinct_users"),
    )


_HIST_BUCKET_E4 = 10_000  # histogram bucket width: 1.0 value unit (e4)


def hourly_histogram_state(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_e4: int | None = None,
) -> DataFrame:
    """Mergeable VALUE-DISTRIBUTION state: (hour, type, bucket) counts.

    The quantile member of the incremental-state family (exact sums →
    hourly_rollup_state, distinct → HLL sketches, distribution → this).
    Unlike a t-digest/KLL sketch, a fixed-width histogram over the e4
    fixed-point value is EXACT cross-engine arithmetic: bucket =
    floor(value_e4 / bucket_e4), counts are integers, merge is count
    addition — so Incremental(b1) ⊕ Incremental(b2) == OneShot(b1 ∪ b2)
    identically, and any percentile read off the histogram is wrong by at
    most one bucket width. State cardinality is (hours × types × occupied
    buckets) regardless of event count. One partial-aggregated shuffle.
    """
    if bucket_e4 is None:
        from hive_io_experimental_spark import conf as _conf

        bucket_e4 = _conf.HIST_BUCKET_E4.get(events.sparkSession)
    ev = ensure_event_time(events, ts_col).filter(
        F.col(value_col).isNotNull()
    )
    hour_epoch = (
        F.expr(f"unix_micros({ts_col}) div 3600000000") * F.lit(3600)
    ).alias("hour_epoch")
    v_e4 = (F.col(value_col).cast("decimal(14,4)") * _E4).cast("long")
    bucket = F.floor(v_e4 / F.lit(float(bucket_e4))).cast("long").alias(
        "bucket"
    )
    return ev.groupBy(hour_epoch, F.col("event_type"), bucket).agg(
        F.count(F.lit(1)).alias("n")
    )


def merge_histogram_states(*states: DataFrame) -> DataFrame:
    """state ⊕ state for the histogram tier: union + re-sum counts."""
    unioned = reduce(DataFrame.unionByName, states)
    return unioned.groupBy("hour_epoch", "event_type", "bucket").agg(
        F.sum("n").cast("long").alias("n")
    )


def percentiles_from_histogram(
    state: DataFrame,
    ps: tuple[float, ...] = (0.5, 0.95),
    bucket_e4: int | None = None,
) -> DataFrame:
    """Per-type percentile LOWER BOUNDS from histogram state (any time
    range — hours aggregate away by count addition).

    For each p: the smallest bucket whose cumulative count reaches
    ceil(p * total). Everything is integer except the p*total product,
    which both engines compute as the same IEEE double — the result is
    exact modulo one bucket width, with NO per-event data touched: this
    is the read path of the incremental state, O(types × buckets).
    Returns (event_type, p, bucket, lower_bound_e4) ordered.
    """
    from pyspark.sql import Window as W

    if bucket_e4 is None:
        from hive_io_experimental_spark import conf as _conf

        bucket_e4 = _conf.HIST_BUCKET_E4.get(state.sparkSession)
    per = state.groupBy("event_type", "bucket").agg(
        F.sum("n").cast("long").alias("n")
    )
    w_cum = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_tot = W.partitionBy("event_type")
    cum = per.select(
        "event_type",
        "bucket",
        F.sum("n").over(w_cum).cast("long").alias("cum"),
        F.sum("n").over(w_tot).cast("long").alias("total"),
    )
    outs = []
    for p in ps:
        rank = F.ceil(F.lit(float(p)) * F.col("total")).cast("long")
        outs.append(
            cum.filter(F.col("cum") >= rank)
            .groupBy("event_type")
            .agg(F.min("bucket").alias("bucket"))
            .select(
                "event_type",
                F.lit(f"p{int(p * 100)}").alias("p"),
                "bucket",
                (F.col("bucket") * bucket_e4).cast("long").alias(
                    "lower_bound_e4"
                ),
            )
        )
    return reduce(DataFrame.unionByName, outs)


def distinct_accuracy_check(
    events: DataFrame,
    ts_col: str = "ts",
    id_col: str = "user_id",
    lg_k: int = 12,
    sigma: float = 3.0,
) -> DataFrame:
    """Cross-engine invariant for the HLL tier: the sketch estimates are
    engine-specific bytes, but their ACCURACY CONTRACT is checkable — every
    per-group estimate must land within sigma standard HLL errors
    (1.04/sqrt(2^lg_k)) of the exact distinct count. Returns ONE row of
    integers an exact-SQL oracle reproduces independently:

      n_groups        — (hour, type) groups (exact, both engines);
      sum_exact_users — sum of exact per-group distinct counts (exact);
      n_out_of_bound  — groups whose HLL estimate violates the bound
                        (invariant: 0; a broken sketch pipeline makes
                        this positive and the gate hash-fails).

    The estimate itself stays covered by merge-exactness and accuracy
    property tests; this gate makes the sketch tier oracle-checkable
    without pretending DuckDB could reproduce Datasketches bytes.
    """
    import math

    est = finalize_distinct(
        hourly_distinct_state(events, ts_col, id_col, lg_k)
    )
    ev = ensure_event_time(events, ts_col)
    hour_epoch = (
        F.expr(f"unix_micros({ts_col}) div 3600000000") * F.lit(3600)
    ).alias("hour_epoch")
    exact = ev.groupBy(hour_epoch, F.col("event_type")).agg(
        F.countDistinct(id_col).alias("nd")
    )
    rel = sigma * 1.04 / math.sqrt(2 ** lg_k)
    j = est.join(exact, ["hour_epoch", "event_type"], "full")
    bound = F.greatest(F.col("nd") * F.lit(rel), F.lit(2.0))
    violated = (
        F.col("nd").isNull()
        | F.col("approx_distinct_users").isNull()
        | (F.abs(F.col("approx_distinct_users") - F.col("nd")) > bound)
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("nd").cast("long").alias("sum_exact_users"),
        F.sum(F.when(violated, 1).otherwise(0)).cast("long").alias(
            "n_out_of_bound"
        ),
    )


# ---------------------------------------------------------------------------
# heavy-hitter tier: mergeable bounded top-k sketch
# ---------------------------------------------------------------------------
#
# The frequent-items member of the incremental-state family (exact sums ->
# hourly_rollup_state, distinct -> HLL, distribution -> histogram, heavy
# hitters -> this). A Misra-Gries-style bounded summary re-shaped for
# deterministic cross-engine arithmetic: per hash-shard, keep the exact
# top-k keys by count plus one residual row recording the largest dropped
# count (dm). The guarantee is the classic one — for any key absent from a
# shard's kept set, its true count in that shard is <= dm — so every
# reported key carries exact integer bounds lo <= true <= hi, and any key
# whose true total exceeds the sum of its shard's dm bounds MUST appear.
# Unlike HLL (whose sketch bytes are engine-specific), every step here is
# integer counts + deterministic (count desc, key asc) ranking, so the
# whole pipeline — state, merge, top-n read — has an exact SQL twin and a
# HASH oracle, not an invariant one.
#
# State cardinality: n_shards x (k+1) rows per batch regardless of data
# volume; merge cost is state-sized, never data-sized.


def topk_sketch_state(
    df: DataFrame,
    key_col: str = "user_id",
    k: int | None = None,
    n_shards: int | None = None,
) -> DataFrame:
    """One batch -> bounded top-k state: (shard, key, lo, hi) kept rows
    (lo == hi == exact in-batch count) plus one residual row per shard
    (key NULL, lo 0, hi = largest dropped count). ``key_col`` must be a
    non-negative integer column (shard = key mod n_shards, reproducible
    in any engine; hash string keys to int64 first). ``k``/``n_shards``
    default to the hiveio.incremental.topk_k / topk_shards confs."""
    from pyspark.sql import Window as W

    from hive_io_experimental_spark import conf as _conf

    if k is None:
        k = _conf.TOPK_SKETCH_K.get(df.sparkSession)
    if n_shards is None:
        n_shards = _conf.TOPK_SKETCH_SHARDS.get(df.sparkSession)

    c = df.groupBy(
        F.pmod(F.col(key_col), F.lit(n_shards)).alias("shard"),
        F.col(key_col).alias("key"),
    ).agg(F.count(F.lit(1)).alias("lo"))
    w = W.partitionBy("shard").orderBy(F.col("lo").desc(), F.col("key").asc())
    r = c.select("shard", "key", "lo", F.row_number().over(w).alias("rk"))
    kept = r.filter(F.col("rk") <= k).select(
        "shard", "key", "lo", F.col("lo").alias("hi")
    )
    resid = (
        r.filter(F.col("rk") > k)
        .groupBy("shard")
        .agg(F.max("lo").alias("dm"))
        .select(
            "shard",
            F.lit(None).cast("long").alias("key"),
            F.lit(0).cast("long").alias("lo"),
            F.col("dm").cast("long").alias("hi"),
        )
    )
    return kept.unionByName(resid)


def merge_topk_sketches(
    a: DataFrame, b: DataFrame, k: int | None = None
) -> DataFrame:
    """state ⊕ state with re-truncation to k kept keys per shard.

    Per (shard, key): lo adds; hi adds, substituting the other state's
    shard dm where the key is absent (it could have hidden just under
    that state's truncation line). Re-truncation keeps the top-k by
    (lo desc, key asc) and folds every dropped key's hi into the new
    residual: dm' = max(dm_a + dm_b, max dropped hi) — so the absent-key
    bound stays valid for keys unseen by either state AND keys truncated
    here. Associative in the bound (never under-states), deterministic
    in the values."""
    from pyspark.sql import Window as W

    if k is None:
        from hive_io_experimental_spark import conf as _conf

        k = _conf.TOPK_SKETCH_K.get(a.sparkSession)

    def split(s: DataFrame):
        return (
            s.filter(F.col("key").isNotNull()),
            s.filter(F.col("key").isNull()).select(
                "shard", F.col("hi").alias("dm")
            ),
        )

    ka, da = split(a)
    kb, db = split(b)
    j = (
        ka.withColumnRenamed("lo", "lo_a")
        .withColumnRenamed("hi", "hi_a")
        .join(
            kb.withColumnRenamed("lo", "lo_b").withColumnRenamed(
                "hi", "hi_b"
            ),
            ["shard", "key"],
            "full",
        )
        .join(da, "shard", "left")
        .withColumnRenamed("dm", "dm_a")
        .join(db, "shard", "left")
        .withColumnRenamed("dm", "dm_b")
    )
    m = j.select(
        "shard",
        "key",
        (F.coalesce("lo_a", F.lit(0)) + F.coalesce("lo_b", F.lit(0))).alias(
            "lo"
        ),
        (
            F.coalesce("hi_a", "dm_a", F.lit(0))
            + F.coalesce("hi_b", "dm_b", F.lit(0))
        ).alias("hi"),
    )
    w = W.partitionBy("shard").orderBy(F.col("lo").desc(), F.col("key").asc())
    r = m.select("*", F.row_number().over(w).alias("rk"))
    kept = r.filter(F.col("rk") <= k).select("shard", "key", "lo", "hi")
    dropped_max = (
        r.filter(F.col("rk") > k).groupBy("shard").agg(
            F.max("hi").alias("drop_hi")
        )
    )
    dm_base = (
        da.select("shard", F.col("dm").alias("dm_a"))
        .join(db.select("shard", F.col("dm").alias("dm_b")), "shard", "full")
        .select(
            "shard",
            (
                F.coalesce("dm_a", F.lit(0)) + F.coalesce("dm_b", F.lit(0))
            ).alias("dm_sum"),
        )
    )
    resid = (
        dm_base.join(dropped_max, "shard", "full")
        .select(
            "shard",
            F.lit(None).cast("long").alias("key"),
            F.lit(0).cast("long").alias("lo"),
            F.greatest(
                F.coalesce("dm_sum", F.lit(0)),
                F.coalesce("drop_hi", F.lit(0)),
            ).cast("long").alias("hi"),
        )
        .filter(F.col("hi") > 0)
    )
    return kept.unionByName(resid)


def heavy_hitters_from_sketch(state: DataFrame, top_n: int = 20) -> DataFrame:
    """Read path: global top-n reported keys with exact integer bounds.

    Sums each key's per-shard bounds (a key lives in exactly one shard,
    so this is a projection, not an estimate-combination) and returns
    (key, est_min, est_max) ordered by est_min desc, key asc — a total
    order, so LIMIT is deterministic."""
    return (
        state.filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(
            F.sum("lo").cast("long").alias("est_min"),
            F.sum("hi").cast("long").alias("est_max"),
        )
        .orderBy(F.col("est_min").desc(), F.col("key").asc())
        .limit(top_n)
    )


# ---------------------------------------------------------------------------
# Bloom membership tier
# ---------------------------------------------------------------------------
# The set-membership member of the incremental-state family (exact sums ->
# hourly_rollup_state, distinct -> HLL, distribution -> histogram, heavy
# hitters -> top-k sketch, membership -> this). State is the filter's bit
# array stored as (word, bits) rows — 32 bits per word so every mask stays
# a small positive BIGINT in any engine (no sign-bit games at 1<<63).
# Hash probes are portable_hash64 of 'bloom<i>:<key>' (md5-derived, bit-
# identical in DuckDB), so the whole tier — build, ⊕ merge, membership
# read — has an exact SQL twin and a HASH oracle, like the top-k sketch
# and unlike HLL (engine-opaque bytes).
#
# Guarantees: NO false negative ever (a key folded into any merged batch
# always reads maybe_member=1); false-positive rate ~ (1-e^(-k*n/m))^k.
# Merge is bitwise OR — associative, commutative, idempotent — so batches
# land in any order and re-delivery is harmless (at-least-once safe).
# State size is m/32 rows regardless of data volume.
#
# The classic 100 TB use is the runtime filter: build the bloom on a
# selective dimension's keys (small), broadcast it, and pre-filter the
# fact table BEFORE its shuffle — bloom_prune_stats measures exactly that
# plan (rows passing the filter vs rows actually joining; missed == 0 is
# the no-false-negative contract).

_BLOOM_WORD_BITS = 32

# Broadcast the bloom state only while it is genuinely small: above this
# many BITS (2^27 = 16 MiB of bitmap payload, ~4M 32-bit words) the probe
# falls back to a shuffle equi-join on word — the probe side carries k rows
# per key, still bounded. An explicit F.broadcast bypasses
# autoBroadcastJoinThreshold, so the operator must bound it itself (the
# same discipline as the guarded broadcast top-k paths in similarity.py).
BLOOM_BROADCAST_MAX_BITS = 1 << 27


def _bloom_state_side(state: DataFrame, m_bits: int) -> DataFrame:
    """Bloom state as a join side: broadcast-hinted only under the bound."""
    side = state.select("word", "bits")
    return F.broadcast(side) if m_bits <= BLOOM_BROADCAST_MAX_BITS else side


def _bloom_pos(key_col, i_col, m_bits: int):
    """Bit position of hash probe i for a key: portable md5 position in
    [0, m_bits). Twin: H64('bloom' || i || ':' || key) % m_bits."""
    from hive_io_experimental_spark.functions.hashing import portable_hash64

    return F.pmod(
        portable_hash64(
            F.concat(
                F.lit("bloom"),
                i_col.cast("string"),
                F.lit(":"),
                key_col.cast("string"),
            )
        ),
        F.lit(m_bits),
    ).alias("pos")


def _bloom_word_mask():
    """Word index + single-bit mask of a materialized `pos` column; masks
    stay < 2^32 (positive BIGINT in every engine). Built lazily — Column
    construction needs an active session."""
    word = F.floor(F.col("pos") / _BLOOM_WORD_BITS).cast("long").alias(
        "word"
    )
    mask = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, {_BLOOM_WORD_BITS})"
        " AS INT))"
    ).alias("mask")
    return word, mask


def bloom_state(
    df: DataFrame,
    key_col: str = "user_id",
    m_bits: int | None = None,
    k_hashes: int | None = None,
) -> DataFrame:
    """One batch -> bloom filter state: (word, bits, m, k) rows.

    Distinct keys first (shrinks the k-way explode), then k md5-derived
    probe positions per key, OR-folded per 32-bit word. One partial-
    aggregated shuffle on word; state cardinality <= m/32 + occupancy,
    independent of batch size. ``m_bits``/``k_hashes`` default to the
    hiveio.incremental.bloom_m_bits / bloom_k confs and are CARRIED IN
    THE STATE — merge and membership validate them, because probing or
    OR-ing filters of different geometry would silently produce false
    negatives (the one failure mode this tier promises never to have).
    """
    from hive_io_experimental_spark import conf as _conf

    if m_bits is None:
        m_bits = _conf.BLOOM_M_BITS.get(df.sparkSession)
    if k_hashes is None:
        k_hashes = _conf.BLOOM_K_HASHES.get(df.sparkSession)
    keys = df.select(F.col(key_col).alias("key")).where(
        F.col("key").isNotNull()
    ).distinct()
    probes = keys.select(
        "key", F.explode(F.array(*[F.lit(i) for i in range(k_hashes)])).alias("i")
    ).select(_bloom_pos(F.col("key"), F.col("i"), m_bits))
    word, mask = _bloom_word_mask()
    return (
        probes.select(word, mask)
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .select(
            "word",
            "bits",
            F.lit(m_bits).cast("long").alias("m"),
            F.lit(k_hashes).cast("long").alias("k"),
        )
    )


def _bloom_geometry_guard(state: DataFrame, m_bits=None, k_hashes=None):
    """1-row frame whose column evaluates to 0 normally and raises at
    execution when the state mixes geometries (or disagrees with the
    caller's explicit m/k) — cross-joined in so the check cannot be
    optimized away and stays fully lazy."""
    chk = state.agg(
        F.countDistinct("m", "k").alias("_nmk"),
        F.first("m").alias("_m"),
        F.first("k").alias("_k"),
    )
    bad = F.col("_nmk") > 1
    if m_bits is not None:
        bad = bad | (
            (F.col("_nmk") == 1)
            & ((F.col("_m") != m_bits) | (F.col("_k") != k_hashes))
        )
    return chk.select(
        F.when(
            bad,
            F.raise_error(
                F.lit(
                    "bloom filter geometry mismatch: states/probes built "
                    "with different m_bits/k_hashes (silent false "
                    "negatives) — rebuild with one geometry"
                )
            ).cast("int"),
        ).otherwise(F.lit(0)).alias("_geom_ok")
    )


def merge_bloom_states(*states: DataFrame) -> DataFrame:
    """state ⊕ state: union + per-word bitwise OR (associative,
    commutative, idempotent — re-delivered batches are no-ops). Raises
    at execution if the states were built with different m/k — OR-ing
    different geometries would manufacture false negatives."""
    unioned = reduce(DataFrame.unionByName, states)
    guard = _bloom_geometry_guard(unioned)
    return (
        unioned.groupBy("word")
        .agg(
            F.bit_or("bits").alias("bits"),
            F.min("m").alias("m"),
            F.min("k").alias("k"),
        )
        .crossJoin(F.broadcast(guard))
        .select(
            "word", "bits", (F.col("m") + F.col("_geom_ok")).alias("m"), "k"
        )
    )


def bloom_membership(
    state: DataFrame,
    probes: DataFrame,
    probe_col: str = "user_id",
    m_bits: int | None = None,
    k_hashes: int | None = None,
) -> DataFrame:
    """Read path: (key, maybe_member) for each distinct probe key.

    Each probe fans out to its k (word, mask) pairs, joins the state on
    word — broadcast while the geometry is under BLOOM_BROADCAST_MAX_BITS
    (then the probe side never shuffles), a bounded equi-join above — and
    a key is a member iff every probed bit is set.
    maybe_member=1 may be a false positive; 0 is definitive. Raises at
    execution if the probe geometry disagrees with the state's stored
    m/k (probing with the wrong geometry would silently false-negate).
    """
    from hive_io_experimental_spark import conf as _conf

    if m_bits is None:
        m_bits = _conf.BLOOM_M_BITS.get(state.sparkSession)
    if k_hashes is None:
        k_hashes = _conf.BLOOM_K_HASHES.get(state.sparkSession)
    guard = _bloom_geometry_guard(state, m_bits, k_hashes)
    keys = probes.select(F.col(probe_col).alias("key")).where(
        F.col("key").isNotNull()
    ).distinct()
    fan = keys.select(
        "key", F.explode(F.array(*[F.lit(i) for i in range(k_hashes)])).alias("i")
    ).select("key", _bloom_pos(F.col("key"), F.col("i"), m_bits))
    word, mask = _bloom_word_mask()
    hit = (
        fan.select("key", word, mask)
        .join(_bloom_state_side(state, m_bits), "word", "left")
        .crossJoin(F.broadcast(guard))
        .select(
            "key",
            (
                F.when(
                    F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(
                        F.col("mask")
                    )
                    != 0,
                    F.lit(1),
                ).otherwise(F.lit(0))
                + F.col("_geom_ok")
            ).alias("hit"),
        )
    )
    return hit.groupBy("key").agg(
        F.min("hit").cast("long").alias("maybe_member")
    )


def bloom_prune_stats(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    m_bits: int | None = None,
    k_hashes: int | None = None,
) -> DataFrame:
    """Runtime-filter audit: build a bloom on the dimension's keys, pre-
    filter the fact side with it, and compare against the exact semi join.

    Returns ONE row of integer counters:
      n_fact       fact rows scanned
      n_pass       fact rows surviving the broadcast bloom pre-filter
      n_joined     fact rows that actually match the dimension (exact)
      n_false_pos  rows the bloom let through that do not join
      n_missed     joining rows the bloom dropped — MUST be 0 (the
                   no-false-negative contract; the driver gate hashes it)

    This is the shuffle-avoidance pattern at 100 TB: n_fact - n_pass rows
    never enter the join exchange. The bloom state itself is broadcast;
    only the surviving rows shuffle.
    """
    keyed = fact.select(F.col(fact_key).alias("fkey"))
    member = bloom_membership(
        bloom_state(dim, dim_key, m_bits, k_hashes),
        keyed, "fkey", m_bits, k_hashes,
    )
    dkeys = dim.select(F.col(dim_key).alias("key")).distinct()
    flags = (
        keyed.join(F.broadcast(member), keyed.fkey == member.key, "left")
        .select(
            "fkey",
            F.coalesce("maybe_member", F.lit(0)).alias("pass_bloom"),
        )
        .join(
            F.broadcast(dkeys.select(F.col("key").alias("jkey"))),
            F.col("fkey") == F.col("jkey"),
            "left",
        )
        .select(
            "pass_bloom",
            F.when(F.col("jkey").isNotNull(), 1).otherwise(0).alias("joins"),
        )
    )
    return flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_fact"),
        F.sum("pass_bloom").cast("long").alias("n_pass"),
        F.sum("joins").cast("long").alias("n_joined"),
        F.sum(
            F.when((F.col("pass_bloom") == 1) & (F.col("joins") == 0), 1)
            .otherwise(0)
        ).cast("long").alias("n_false_pos"),
        F.sum(
            F.when((F.col("pass_bloom") == 0) & (F.col("joins") == 1), 1)
            .otherwise(0)
        ).cast("long").alias("n_missed"),
    )
