"""Column profiling: the stats layer a data pipeline runs before training.

Two tiers, same shape as the dedup/similarity families:

  column_profile   exact per-column stats (count/nulls/distinct/min/max/
                   median) — the correctness baseline, oracle-checkable.
  approx_profile   sketch-based: HyperLogLog distinct + approximate
                   percentiles. The 100 TB path — one pass, fixed memory,
                   no exact-distinct shuffle of the full key space. Not
                   SQL-oracle-checkable (sketch internals differ per
                   engine); tested by accuracy bounds instead.

The reference's only statistics are partition-level (numRows/rawSize,
common/HiveStats.java:34-108) — column profiling is an engine extension
(SURVEY §2.2: no aggregations exist in the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(
    df: DataFrame, numeric_col: str, key_col: str
) -> DataFrame:
    """Exact one-row profile of (key cardinality, numeric distribution).

    Deliberately exact so the DuckDB oracle can verify it; swap to
    approx_profile at scale. Median = exact interpolated percentile
    (identical definition to DuckDB's quantile_cont).
    """
    v = F.col(numeric_col)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(v).alias("n_nonnull"),
        (F.count(F.lit(1)) - F.count(v)).alias("n_null"),
        F.countDistinct(F.col(key_col)).alias("n_distinct_keys"),
        F.round(F.min(v), 6).alias("min_value"),
        F.round(F.max(v), 6).alias("max_value"),
        F.round(
            F.sum(v.cast("decimal(18,4)")).cast("double"), 6
        ).alias("sum_value"),
        F.round(F.expr(f"percentile({numeric_col}, 0.5)"), 6).alias("median_value"),
    )


def approx_profile(
    df: DataFrame, numeric_col: str, key_col: str, rsd: float = 0.05
) -> DataFrame:
    """Sketch-based profile: HLL++ distinct (relative std dev ``rsd``) and
    approximate percentiles (25/50/75). One pass, bounded memory per
    partition, map-side combinable — this is what actually runs at 100 TB.
    """
    v = F.col(numeric_col)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(F.col(key_col), rsd).alias("approx_distinct_keys"),
        F.percentile_approx(v, [0.25, 0.5, 0.75], 10_000).alias("approx_quartiles"),
        F.min(v).alias("min_value"),
        F.max(v).alias("max_value"),
    )
