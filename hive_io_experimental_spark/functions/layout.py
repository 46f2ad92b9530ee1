"""Z-order (Morton) interleave key for multi-column clustered layout.

The engine's sorted-layout write path (output.py: rows sorted by the
table's declared ``sort_cols`` within each partition) gives parquet
row-group min/max stats that prune scans filtered on the LEADING sort
column — but a lexicographic sort is useless for filters on the second
column alone. Z-ordering interleaves the bits of several columns into one
scalar so that sorting by it clusters rows in EVERY participating
dimension at once; a filter on any subset of the z-columns then skips most
row groups on min/max stats. This is the standard multi-dimensional
layout trick (Morton curves in Delta Lake OPTIMIZE ZORDER, Iceberg
sort orders); the reference has no layout machinery at all (its writers
emit rows in arrival order).

Usage with the engine: materialize the key and declare it the table's
sort column —

    df = df.withColumn("_z", zorder_key([F.col("a"), F.col("b")]))
    catalog.create_table(..., sort_cols=("_z",))

Everything here is pure integer bit math in ONE whole-stage-codegen
projection — no shuffle, no UDF, and the identical expression is
computable in any SQL engine (the DuckDB oracle twin reproduces it
bit-for-bit).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each column.

    Each input is masked to its low ``bits`` bits (callers bucket or
    range-normalize beforehand — for a double, e.g.
    ``F.floor((v - lo) / (hi - lo) * ((1 << bits) - 1))``); bit ``j`` of
    input ``i`` lands at output position ``j * n_cols + i``, so the key
    width is ``bits * n_cols`` and must fit a signed long
    (``bits * n_cols <= 62``).

    The expression unrolls to ``bits x n_cols`` constant shift/mask terms
    summed together — all inside whole-stage codegen, constant-folded
    per-row work, zero shuffle at any scale.
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 62:
        raise ValueError(
            f"{bits} bits x {n} cols = {bits * n} exceeds a signed long "
            "(max 62); lower bits or drop columns"
        )
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        v = c.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for j in range(bits):
            # bit j of column i -> output bit j * n + i
            bit = F.shiftright(v, j).bitwiseAND(F.lit(1))
            key = key + (bit * F.lit(1 << (j * n + i)))
    return key
