"""Partition-spreading helper for compute-heavy operators.

Single-file parquet inputs with one row group arrive as ONE Spark partition
(a file can only split at row-group boundaries), so expression-heavy
per-row operators (tokenization, vector folds, Arrow-batched decode) would
run on a single core no matter how many executors exist. ``spread`` inserts
a round-robin repartition up to the cluster's default parallelism — a cheap
narrow shuffle of the input rows that unlocks full-width execution.

At warehouse scale inputs normally arrive in thousands of partitions and
``spread`` is a no-op; it only acts when the scan under-partitions. This is
the same knob the reference exposes as numSplits (splits requested per
partition, input/HiveInputDescription.java:49).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``target`` (default: defaultParallelism)
    partitions iff the current plan has fewer. No-op on well-partitioned
    inputs, so it is safe to call unconditionally in operators."""
    sc = df.sparkSession.sparkContext
    goal = target or sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df.repartition(goal)
    if current < goal:
        return df.repartition(goal)
    return df
