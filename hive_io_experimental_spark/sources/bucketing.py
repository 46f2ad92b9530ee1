"""Bucketed tables: pre-shuffled storage for co-located, exchange-free joins.

The 100 TB play: fact tables that join repeatedly on the same key (orders x
customer on custkey; events x users on user_id) are written ONCE bucketed by
that key; every subsequent sort-merge join reads co-located buckets and
skips BOTH shuffle exchanges. This is the Spark-native equivalent of
pre-partitioning a warehouse by join key — the write pays the shuffle, every
read amortizes it.

(The reference explicitly rejects bucketed tables on its write path,
HiveApiOutputFormat sanity checks — our engine instead embraces them as the
scale path, keeping the strict-policy layer for the HiveOutput API only.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int = 32,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    ``n_buckets`` should match downstream shuffle parallelism; both join
    sides must use the SAME n_buckets for the exchange-free plan.
    ``path`` makes it an external table at that location (needed when the
    session's default warehouse dir isn't writable/wanted).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata rides in the catalog; Spark
    plans bucket-aligned scans automatically when bucketing is enabled)."""
    return spark.table(table)
