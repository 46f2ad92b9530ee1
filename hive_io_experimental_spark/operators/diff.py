"""Row-level diff between two snapshots of a versioned table (CDC).

The versioned-table machinery (catalog.py snapshot section, output.py
versioned writes) retains every committed version; this operator answers
"what CHANGED between v_from and v_to" — the change-data-capture feed that
downstream incremental consumers (index refresh, cache invalidation,
replication) subscribe to. Same surface as Delta Lake's change data feed
(insert / delete / update_preimage / update_postimage rows); computed here
by diffing the two retained snapshots directly, so it works retroactively
on any pair of retained versions with no write-path instrumentation.

Scale shape: ONE full-outer join between the two snapshot scans, keyed
(hash-partitioned) on the caller's key columns; change classification and
row emission happen in the same pass via an array+explode (no second scan
or join re-execution). Unkeyed mode degrades to two exceptAll set-ops
(rows are their own identity). Both snapshots prune to one FileScan each
through ScanSpec.as_of_version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_io_experimental_spark.catalog import Catalog
from hive_io_experimental_spark.input import HiveInput, ScanSpec


def snapshot_diff(
    spark: SparkSession,
    catalog: Catalog,
    table: str,
    from_version: int,
    to_version: int,
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Change rows turning snapshot ``from_version`` into ``to_version``.

    With ``key_cols``: full-outer join on the keys (null-safe); a key only
    in the new snapshot emits ``insert``, only in the old emits
    ``delete``, present in both with any non-key difference emits an
    ``update_preimage`` (old values) + ``update_postimage`` (new values)
    pair, unchanged rows emit nothing. Keys must be unique per snapshot
    (the usual CDC contract — duplicate keys would cross-product in the
    join). Without keys: pure multiset diff (exceptAll both ways) labeled
    insert/delete.

    Schema evolution between the versions (metadata-only add/drop_column)
    is aligned to the NEW snapshot's columns: rows from the old snapshot
    read added columns as NULL, dropped columns do not appear.

    Returns the table's columns plus ``_change_type``, deterministic
    content (order unspecified — sort downstream if needed).
    """
    inp = HiveInput(spark, catalog)
    old = inp.read_table(ScanSpec(table=table, as_of_version=from_version))
    new = inp.read_table(ScanSpec(table=table, as_of_version=to_version))
    cols = new.columns
    for c in cols:
        if c not in old.columns:
            old = old.withColumn(
                c, F.lit(None).cast(new.schema[c].dataType)
            )
    old = old.select(*cols)

    if not key_cols:
        added = new.exceptAll(old).withColumn("_change_type", F.lit("insert"))
        removed = old.exceptAll(new).withColumn(
            "_change_type", F.lit("delete")
        )
        return added.unionByName(removed)

    missing = set(key_cols) - set(cols)
    if missing:
        raise ValueError(f"key columns not in table: {sorted(missing)}")

    # presence markers, NOT key-null checks: a legitimately-NULL key value
    # must not read as "row absent on this side"
    o = old.withColumn("_op", F.lit(1)).alias("o")
    n = new.withColumn("_np", F.lit(1)).alias("n")
    cond = None
    for kc in key_cols:
        term = F.col(f"o.{kc}").eqNullSafe(F.col(f"n.{kc}"))
        cond = term if cond is None else cond & term
    o_row = F.struct(*[F.col(f"o.{c}") for c in cols])
    n_row = F.struct(*[F.col(f"n.{c}") for c in cols])
    # one pass: classify into an array of (change_type, row) then explode —
    # the join output is consumed exactly once, no branch re-computation
    change = (
        F.when(
            F.col("o._op").isNull(),
            F.array(F.struct(F.lit("insert").alias("t"), n_row.alias("r"))),
        )
        .when(
            F.col("n._np").isNull(),
            F.array(F.struct(F.lit("delete").alias("t"), o_row.alias("r"))),
        )
        .when(
            ~o_row.eqNullSafe(n_row),
            F.array(
                F.struct(F.lit("update_preimage").alias("t"),
                         o_row.alias("r")),
                F.struct(F.lit("update_postimage").alias("t"),
                         n_row.alias("r")),
            ),
        )
        .otherwise(F.array().cast(
            "array<struct<t:string,r:struct<"
            + ",".join(f"`{c}`:{new.schema[c].dataType.simpleString()}"
                       for c in cols)
            + ">>>"
        ))
    )
    exploded = (
        o.join(n, cond, "full_outer")
        .select(F.explode(change).alias("_ch"))
    )
    return exploded.select(
        *[F.col(f"_ch.r.{c}").alias(c) for c in cols],
        F.col("_ch.t").alias("_change_type"),
    )
