"""ANALYZE TABLE: one-pass column statistics persisted in the catalog.

The reference's statistics stop at table-level counters (numRows/rawSize,
common/HiveStats.java:34-108, surfaced by HiveUtils.statsOf); a warehouse
also wants per-COLUMN statistics — null counts, distinct counts, min/max —
for capacity planning, data-quality monitoring, and join-size estimation.
This module computes them in ONE aggregate job over the table (4 exact
aggregate expressions per column, all map-side combined: one shuffle of a
single row regardless of table size) and stores the result in the catalog
entry next to the schema, where any later session reads it without
touching the data.

Exact ndv (countDistinct) is used rather than an HLL sketch so the result
is engine-reproducible (the DuckDB oracle computes the identical number);
at raw 100 TB swap `exact=False` for approx_count_distinct — same plan
shape, bounded error, one fewer shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_io_experimental_spark.catalog import Catalog, TableDesc
from hive_io_experimental_spark.input import HiveInput, ScanSpec


def column_stats_df(
    df: DataFrame, columns: tuple[str, ...] = (), exact: bool = True
) -> DataFrame:
    """(column_name, n_nonnull, n_distinct, min_str, max_str) per column.

    min/max are stored as strings (catalog JSON is type-erased, like every
    metastore's stats blob); numeric ordering still applies before the
    cast. One wide aggregate -> one output row, pivoted driver-side into
    per-column rows (|columns| rows — metadata-sized).
    """
    cols = tuple(columns) or tuple(df.columns)
    aggs = []
    for c in cols:
        v = F.col(c)
        aggs += [
            F.count(v).alias(f"__n_{c}"),
            (
                F.countDistinct(v)
                if exact
                else F.approx_count_distinct(v)
            ).alias(f"__d_{c}"),
            F.min(v).cast("string").alias(f"__lo_{c}"),
            F.max(v).cast("string").alias(f"__hi_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    out = [
        (c, row[f"__n_{c}"], row[f"__d_{c}"], row[f"__lo_{c}"],
         row[f"__hi_{c}"])
        for c in cols
    ]
    return spark.createDataFrame(
        out,
        "column_name string, n_nonnull long, n_distinct long, "
        "min_str string, max_str string",
    )


def analyze_table(
    spark: SparkSession,
    catalog: Catalog,
    table: str,
    columns: tuple[str, ...] = (),
    exact: bool = True,
) -> dict[str, dict]:
    """Compute and persist column statistics for a catalog table.

    Returns the stats dict that was stored ({column: {n_nonnull,
    n_distinct, min, max}}). Reruns overwrite — ANALYZE is idempotent
    by definition.
    """
    desc = TableDesc.parse(table)
    df = HiveInput(spark, catalog).read_table(ScanSpec(table=table))
    rows = column_stats_df(df, columns, exact).collect()
    stats = {
        r["column_name"]: {
            "n_nonnull": r["n_nonnull"],
            "n_distinct": r["n_distinct"],
            "min": r["min_str"],
            "max": r["max_str"],
        }
        for r in rows
    }
    catalog.set_column_stats(desc, stats)
    return stats


def analyze_partition_ranges(
    spark: SparkSession,
    catalog: Catalog,
    table: str,
    columns: tuple[str, ...],
) -> int:
    """Compute and persist per-PARTITION zone maps for ``columns``.

    The partition-granularity member of the ANALYZE family: one aggregate
    job (groupBy partition keys, min/max per column — map-side combined,
    one shuffle whose output is partition-count-sized), persisted into
    each partition's catalog entry as {column: [min, max]} with NULLs
    excluded. Scans with ``ScanSpec.range_predicates`` then skip
    partitions whose ranges exclude the predicate — file skipping on
    NON-partition columns, which directory pruning cannot do. Values are
    stored as plain numbers/strings (catalog JSON); like any metastore
    stats they go stale after new writes — re-run after loads, exactly
    like ANALYZE. Returns the number of partitions stamped.
    """
    desc = TableDesc.parse(table)
    schema = catalog.get_schema(desc)
    pkeys = list(schema.partition_keys)
    if not pkeys:
        raise ValueError(
            f"{table} is unpartitioned: zone maps prune partitions, use "
            f"analyze_table for table-level min/max"
        )
    df = HiveInput(spark, catalog).read_table(ScanSpec(table=table))
    aggs = []
    for c in columns:
        aggs += [
            F.min(F.col(c)).alias(f"__lo_{c}"),
            F.max(F.col(c)).alias(f"__hi_{c}"),
        ]
    rows = df.groupBy(*pkeys).agg(*aggs).collect()
    n = 0
    for r in rows:
        values = {k: str(r[k]) for k in pkeys}
        ranges = {}
        for c in columns:
            lo, hi = r[f"__lo_{c}"], r[f"__hi_{c}"]
            if lo is not None and hi is not None:
                ranges[c] = [lo, hi]
        catalog.set_partition_ranges(desc, values, ranges)
        n += 1
    return n


def analyze_partition_blooms(
    spark: SparkSession,
    catalog: Catalog,
    table: str,
    columns: tuple[str, ...],
    m_bits: int = 4096,
    k_hashes: int = 3,
) -> int:
    """Compute and persist per-partition BLOOM indexes for ``columns`` —
    the point-lookup member of the ANALYZE family.

    Zone maps ([min, max]) cannot exclude an equality probe when the
    partition's range is wide (a user_id looked up across a year of
    partitions matches every range); a per-partition bloom of the
    column's distinct values can. One job per column: distinct
    (partition, value) pairs fan out to k md5 probes and OR-fold per
    (partition, word) — the same portable bit math as the bloom state
    tier (operators/incremental.py), so the driver-side probe in
    input.bloom_prune reproduces positions exactly. State per partition
    is <= m/32 words; stamped into the catalog as
    {column: {m, k, words}}. Same staleness contract as zone maps.
    Integer and string columns only (the probe hashes the value's
    canonical string form). Returns partitions stamped.
    """
    from hive_io_experimental_spark.operators.incremental import (
        _bloom_pos,
        _bloom_word_mask,
    )

    from pyspark.sql import types as T

    desc = TableDesc.parse(table)
    schema = catalog.get_schema(desc)
    pkeys = list(schema.partition_keys)
    if not pkeys:
        raise ValueError(
            f"{table} is unpartitioned: bloom indexes prune partitions"
        )
    # integer/string columns only: the scan-side probe hashes str(value),
    # which only matches Spark's string cast for those types (a float's
    # '42.0' or bool's 'True' would silently prune live partitions)
    types_by_name = dict(schema.data_fields)
    for c in columns:
        t = types_by_name.get(c)
        if not isinstance(
            t, (T.LongType, T.IntegerType, T.ShortType, T.ByteType,
                T.StringType)
        ):
            raise ValueError(
                f"bloom index on {c!r} ({t.simpleString() if t else 'not a data column'}): "
                "only integer and string columns are supported"
            )
    df = HiveInput(spark, catalog).read_table(ScanSpec(table=table))
    per_part: dict[tuple, dict] = {}
    for c in columns:
        keys = (
            df.select(*pkeys, F.col(c).alias("key"))
            .where(F.col("key").isNotNull())
            .distinct()
        )
        probes = keys.select(
            *pkeys,
            F.explode(
                F.array(*[F.lit(i) for i in range(k_hashes)])
            ).alias("i"),
            "key",
        ).select(*pkeys, _bloom_pos(F.col("key"), F.col("i"), m_bits))
        word, mask = _bloom_word_mask()
        rows = (
            probes.select(*pkeys, word, mask)
            .groupBy(*pkeys, "word")
            .agg(F.bit_or("mask").alias("bits"))
            .collect()
        )
        for r in rows:
            pv = tuple(str(r[k]) for k in pkeys)
            col_bloom = per_part.setdefault(pv, {}).setdefault(
                c, {"m": m_bits, "k": k_hashes, "words": {}}
            )
            col_bloom["words"][str(r["word"])] = r["bits"]
    n = 0
    for pv, blooms in per_part.items():
        values = dict(zip(pkeys, pv))
        catalog.set_partition_blooms(desc, values, blooms)
        n += 1
    return n


def estimate_join_rows(
    catalog: Catalog,
    left_table: str,
    left_key: str,
    right_table: str,
    right_key: str,
) -> dict:
    """Metadata-only equi-join cardinality estimate from persisted
    ANALYZE stats — the textbook formula a cost-based planner uses to
    pick join order/strategy BEFORE touching data:

        est = n_left · n_right / max(ndv_left, ndv_right)

    (assumes containment of the smaller key domain in the larger and
    uniform key frequency — exact when keys are unique on one side, the
    FK-join case). Integer arithmetic (floor division) so the estimate
    is engine-reproducible. No Spark session, no scan: reads only the
    catalog's stored stats; raises if either table lacks ANALYZE stats
    for its key (stale-stats staleness contract as everywhere else).
    Returns {n_left, n_right, ndv_left, ndv_right, est_rows}.
    """
    ls = catalog.get_column_stats(left_table).get(left_key)
    rs = catalog.get_column_stats(right_table).get(right_key)
    if not ls or not rs:
        raise ValueError(
            f"estimate_join_rows needs ANALYZE stats for "
            f"{left_table}.{left_key} and {right_table}.{right_key}"
        )
    n_l, n_r = int(ls["n_nonnull"]), int(rs["n_nonnull"])
    d_l, d_r = int(ls["n_distinct"]), int(rs["n_distinct"])
    denom = max(d_l, d_r)
    return {
        "n_left": n_l,
        "n_right": n_r,
        "ndv_left": d_l,
        "ndv_right": d_r,
        "est_rows": (n_l * n_r) // denom if denom else 0,
    }
