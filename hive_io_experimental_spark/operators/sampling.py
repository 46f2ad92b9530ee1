"""Deterministic sampling operators for corpus curation.

Training-data pipelines sample by stratum (language balancing, source
mixing, quality tiers) and must be REPRODUCIBLE — a rerun on the same
input has to pick the same rows, and two engines must agree on the pick.
So sampling here is hash-gated, not RNG-gated: a row is kept iff a
portable content hash of its key falls under the stratum's rate. That
makes the operator a pure per-row filter (no shuffle, no state, trivially
parallel at any scale) and bit-reproducible across engines — the md5
family has an exact DuckDB twin, so sampled sets are oracle-checkable.

The reference has no sampling surface (it is an I/O library, SURVEY §2.2);
this is a training-data-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hive_io_experimental_spark.functions.hashing import portable_hash64

# Rate granularity: rates are applied as integer thresholds out of 10_000
# (0.01% steps) so the gate is exact integer math in every engine.
RATE_DENOM = 10_000


def hash_stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "sample:",
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    gate = md5-hash(salt || key) mod 10000 < rate * 10000. The hash is on
    the stable row KEY (not the stratum), so membership is independent
    across strata redefinitions and stable under reruns; ``salt`` gives
    independent draws for independent sampling stages. Rows in strata not
    listed in ``rates`` get ``default_rate``. Returns the input rows that
    pass (all columns).
    """
    bucket = F.pmod(
        portable_hash64(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
        F.lit(RATE_DENOM),
    )
    threshold = None
    for stratum, rate in sorted(rates.items()):
        t = F.when(
            F.col(strata_col) == stratum,
            F.lit(int(round(rate * RATE_DENOM))),
        )
        threshold = t if threshold is None else threshold.when(
            F.col(strata_col) == stratum,
            F.lit(int(round(rate * RATE_DENOM))),
        )
    threshold = (
        threshold.otherwise(F.lit(int(round(default_rate * RATE_DENOM))))
        if threshold is not None
        else F.lit(int(round(default_rate * RATE_DENOM)))
    )
    return df.filter(bucket < threshold)


def hash_split(
    df: DataFrame,
    fractions: dict[str, float] | None = None,
    key_col: str = "doc_id",
    salt: str = "split:",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a deterministic train/val/test split label.

    The reproducibility contract training pipelines need: the split is a
    pure function of (salt, row key) — re-runs, re-partitions, and other
    engines (the DuckDB oracle) assign the IDENTICAL label; adding rows
    never reassigns existing ones (no RNG, no global state, no shuffle —
    one codegen projection at any scale). Fractions are applied as exact
    integer thresholds out of RATE_DENOM on the same md5 bucket the
    sampling gate uses; labels are assigned in sorted-name order over
    cumulative ranges so the mapping is unambiguous. Fractions must sum
    to 1 within 1/RATE_DENOM.
    """
    if fractions is None:
        fractions = {"test": 0.01, "train": 0.98, "val": 0.01}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1.0 / RATE_DENOM:
        raise ValueError(f"split fractions sum to {total}, expected 1.0")
    bucket = F.pmod(
        portable_hash64(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
        F.lit(RATE_DENOM),
    )
    expr = None
    cum = 0
    items = sorted(fractions.items())
    for name, frac in items[:-1]:
        cum += int(round(frac * RATE_DENOM))
        cond = bucket < F.lit(cum)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(split_col, expr)


def hash_weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "wsample:",
) -> DataFrame:
    """Keep each row with probability = its OWN weight, deterministically.

    Per-row acceptance sampling for quality-weighted corpus construction
    (keep probability = quality score in [0,1]): the same hash-gate
    contract as hash_stratified_sample, with the threshold taken from the
    row's weight column instead of a stratum table. Weights are clamped
    to [0,1] and applied at RATE_DENOM granularity; same key+salt =>
    same verdict on every rerun and every engine.
    """
    bucket = F.pmod(
        portable_hash64(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
        F.lit(RATE_DENOM),
    )
    threshold = F.round(
        F.least(F.lit(1.0), F.greatest(F.lit(0.0),
                                       F.col(weight_col).cast("double")))
        * RATE_DENOM
    ).cast("int")
    return df.filter(bucket < threshold)


def distribution_matched_sample(
    df: DataFrame,
    ref: DataFrame,
    bucket_col: str,
    key_col: str = "doc_id",
    salt: str = "distmatch:",
) -> DataFrame:
    """Resample ``df`` so ``bucket_col``'s distribution matches ``ref``'s.

    The domain/length-balancing operator: given a reference corpus whose
    bucketed feature distribution (length decile, quality band, domain)
    is the target, keep the LARGEST deterministic subset of ``df`` whose
    bucket proportions match it. Per bucket b the acceptance is

        a_b = (ref_n_b / src_n_b) / (ref_n_M / src_n_M)

    where M is the bucket maximizing ref_n/src_n (its acceptance is 1 —
    the binding constraint). Thresholds are computed with INTEGER
    arithmetic only — floor(10000 * ref_n_b * src_n_M / (src_n_b *
    ref_n_M)) — so both engines agree bit-for-bit; the per-row gate is
    the same salted md5 hash-mod used by every sampler here. Buckets
    absent from ``ref`` are dropped (target mass 0); buckets absent from
    ``df`` simply can't contribute. The count aggregation and the
    threshold table are state-sized (one row per bucket) and broadcast
    back onto the scan — one partial-agg shuffle over each input, zero
    shuffles on the kept-rows path.

    Note: the integer product 10000 * ref_n_b * src_n_M must fit int64 —
    fine up to ~10^7-row buckets on both sides; switch the threshold
    arithmetic to DECIMAL(38,0) beyond that.
    """
    src_counts = df.groupBy(bucket_col).agg(
        F.count(F.lit(1)).alias("src_n")
    )
    ref_counts = ref.groupBy(bucket_col).agg(
        F.count(F.lit(1)).alias("ref_n")
    )
    j = src_counts.join(ref_counts, bucket_col)
    # pivot bucket M = argmax ref_n/src_n: double ratio order with bucket
    # tiebreak — deterministic, and both engines compute the same binary64
    pivot = (
        j.orderBy(
            (F.col("ref_n") / F.col("src_n")).desc(),
            F.col(bucket_col).asc(),
        )
        .limit(1)
        .select(
            F.col("src_n").alias("piv_src"), F.col("ref_n").alias("piv_ref")
        )
    )
    thresholds = (
        j.crossJoin(F.broadcast(pivot))
        .select(
            bucket_col,
            (
                F.lit(RATE_DENOM)
                * F.col("ref_n").cast("long")
                * F.col("piv_src").cast("long")
            ).alias("num"),
            (
                F.col("src_n").cast("long") * F.col("piv_ref").cast("long")
            ).alias("den"),
        )
        .select(bucket_col, F.expr("num div den").alias("thr"))
    )
    bucket = F.pmod(
        portable_hash64(
            F.concat(F.lit(salt), F.col(key_col).cast("string"))
        ),
        F.lit(RATE_DENOM),
    )
    return (
        df.join(F.broadcast(thresholds), bucket_col)
        .filter(bucket < F.col("thr"))
        .select(*df.columns)
    )


def quota_cap_sample(
    df: DataFrame,
    group_col: str = "source",
    cap: int = 50,
    key_col: str = "doc_id",
    salt: str = "quota:",
) -> DataFrame:
    """Cap each group at ``cap`` rows, picked deterministically.

    The per-domain/per-source cap every web-corpus pipeline applies so a
    single crawl host cannot dominate the training mix. Selection is a
    hash lottery, not "first N seen": rows rank within their group by
    (md5-hash(salt || key), key) and ranks > cap drop — the SAME rows
    survive under any partitioning, any engine (exact DuckDB twin), and
    any input order, and the kept set is a uniform without-replacement
    draw per group. One shuffle on group_col for the rank window; groups
    above ~10^7 rows would want a pre-filter by hash threshold first
    (cap/|group| estimate) before the exact rank — noted, not needed at
    cap sizes quotas use. Returns surviving rows (all columns) plus the
    in-group rank ``quota_rk``.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col("_quota_h"), F.col(key_col)
    )
    return (
        df.withColumn(
            "_quota_h",
            portable_hash64(
                F.concat(F.lit(salt), F.col(key_col).cast("string"))
            ),
        )
        .withColumn("quota_rk", F.row_number().over(w).cast("long"))
        .filter(F.col("quota_rk") <= cap)
        .drop("_quota_h")
    )


def temperature_mixture_sample(
    df: DataFrame,
    group_col: str = "lang",
    temperature: float = 0.5,
    key_col: str = "doc_id",
    salt: str = "temp:",
) -> DataFrame:
    """Resample so group shares follow n^temperature (mixture flattening).

    THE multilingual/source-balancing operator: with natural group sizes
    n_b, the target mixture gives group b a share proportional to
    n_b^tau. Keeping the maximum possible rows, the smallest group is
    kept whole and every other group accepts rows with probability

        a_b = (n_min / n_b)^(1 - tau)

    (tau = 1 keeps the natural mixture, tau = 0 equalizes all groups —
    the same temperature knob used for multilingual sampling in the
    mBERT/XLM-R lineage of corpus recipes).

    Determinism and cross-engine exactness: the per-row gate is the same
    salted md5 hash-mod every sampler here uses. For the DEFAULT
    tau = 0.5 the acceptance test is evaluated in pure int64 arithmetic —
    keep iff bucket^2 * n_b < RATE_DENOM^2 * n_min, which is algebraically
    bucket < RATE_DENOM * sqrt(n_min/n_b) with no floating point anywhere,
    so any engine agrees bit-for-bit (the DuckDB oracle twin uses the
    same product comparison). tau = 0 uses exact integer division. Other
    temperatures go through pow(), whose last-ulp rounding is not
    IEEE-pinned across libm implementations — fine in production, but an
    exact cross-engine oracle should stick to {0, 0.5, 1}.

    Plan shape: one state-sized count aggregation (rows = groups), its
    1-row min crossJoined back as a broadcast, then a broadcast join of
    the per-group counts onto the scan and a per-row filter — zero
    shuffles on the kept-rows path, same as distribution_matched_sample.
    Returns surviving rows (all input columns).
    """
    if not 0.0 <= temperature <= 1.0:
        raise ValueError(
            f"temperature must be in [0, 1], got {temperature}"
        )
    if temperature == 1.0:
        return df
    # collision-proof helper names: a caller column literally named _n or
    # _n_min would make the broadcast-join references ambiguous and break
    # the final select(*df.columns)
    nc, mc = "_tms_n", "_tms_n_min"
    while nc in df.columns or mc in df.columns:
        nc, mc = nc + "_", mc + "_"
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias(nc))
    n_min = counts.agg(F.min(nc).alias(mc))
    sized = counts.crossJoin(F.broadcast(n_min))
    bucket = F.pmod(
        portable_hash64(
            F.concat(F.lit(salt), F.col(key_col).cast("string"))
        ),
        F.lit(RATE_DENOM),
    )
    joined = df.join(F.broadcast(sized), group_col)
    if temperature == 0.5:
        # integer-exact: bucket^2 * n_b < RATE_DENOM^2 * n_min
        keep = (
            bucket * bucket * F.col(nc)
            < F.lit(RATE_DENOM) * F.lit(RATE_DENOM) * F.col(mc)
        )
    elif temperature == 0.0:
        keep = bucket < F.expr(
            f"CAST({RATE_DENOM} * {mc} AS BIGINT) div {nc}"
        )
    else:
        thr = F.floor(
            F.lit(float(RATE_DENOM))
            * F.pow(
                F.col(mc).cast("double") / F.col(nc).cast("double"),
                F.lit(1.0 - temperature),
            )
        )
        keep = bucket < thr
    return joined.filter(keep).select(*df.columns)
