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
