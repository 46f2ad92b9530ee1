"""Skew-mitigation helpers: key salting for hot aggregation/join keys.

At 100 TB a handful of hot keys (empty-string documents, bot user_ids, null
buckets) can pin a whole stage on one task. Two standing mitigations are
already on in the engine session (AQE skew-join splitting + partial/map-side
aggregation); explicit salting is the third tool, for FIRST-shuffle skew that
AQE cannot fix (AQE only re-splits after observing a skewed shuffle, and
partial aggregation does not help high-cardinality aggregates like
collect_list / count-distinct over a hot key).

Pattern: split each hot key into ``n_salts`` sub-keys, aggregate per
(key, salt), then aggregate the per-salt partials — two small shuffles
instead of one giant skewed one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Attach a uniform salt in [0, n_salts) derived from a round-robin-ish
    nondeterministic source (rand is fine: salting never changes results,
    only placement)."""
    return df.withColumn(
        salt_col, (F.rand() * n_salts).cast("int")
    )


def salted_count(
    df: DataFrame, key: str | Column, n_salts: int = 16
) -> DataFrame:
    """groupBy(key).count() that survives pathological key skew.

    Stage 1 aggregates (key, salt) — the hot key spreads over ``n_salts``
    tasks; stage 2 sums the per-salt partials (tiny). For plain count this
    matches the map-side-combine plan; it exists as the template for
    aggregates WITHOUT partial pushdown (collect_list, exact distinct).
    """
    keyed = with_salt(df.select(F.col(key) if isinstance(key, str) else key), n_salts)
    kname = keyed.columns[0]
    partial = keyed.groupBy(kname, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(kname).agg(F.sum("_c").alias("cnt"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: tuple[str, ...] | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join that survives hot keys on the BIG side.

    The classic replicate-and-salt: every big-side row gets a random salt
    in [0, n_salts); the small side is replicated once per salt value so
    each (key, salt) pair still finds its match. The hot key's rows now
    land on ``n_salts`` reducers instead of one. Results are identical to
    ``big.join(small, keys, how)`` — salting changes placement, never
    content.

    Use when AQE's skew-join can't help: the first shuffle of a
    stream-stream or bucketed pipeline, or a `how='left'` join whose hot
    NULL/default key floods one task. The small side must be small enough
    to replicate ``n_salts`` times (it was probably broadcastable — use
    this when it is NOT, i.e. tens-of-GB dimension vs TB facts).
    ``how``: 'inner' or 'left' (the big side is preserved).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    overlap = set(keys) & {"_salt"}
    if overlap:
        raise ValueError("'_salt' collides with a join key")
    b = with_salt(big, n_salts)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = b.join(s, [*keys, "_salt"], how)
    return joined.drop("_salt")
