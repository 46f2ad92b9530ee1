"""Inspect Spark physical plans for pushdown/broadcast/shuffle shape.

Used by tests to assert the engine's scans really push filters and prune
columns (the reference's equivalents: read-column ids pushed into RCFile,
HiveApiInputFormat.java:264-279; partition pruning via metastore filter,
:290-309) — and by the perf pass to count shuffles before they bite at scale.

Parsing uses the "simple" explain mode: each operator appears exactly once
(the "formatted" mode lists operators in both the tree and a details section,
double-counting regex hits), and whole-stage codegen regions are marked with
``*(n)`` prefixes.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "simple") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Extract PushedFilters entries from the plan's FileScan lines."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """Extract PartitionFilters from the scan — non-empty means Catalyst
    prunes partition DIRECTORIES at planning time (the reference's
    metastore-side get_partitions_by_filter, HiveApiInputFormat.java:290-309),
    instead of scanning everything and filtering rows."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the file scan (ReadSchema)."""
    text = explain_str(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        for part in m.group(1).split(","):
            name = part.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def scan_plan_report(df: DataFrame, execute: bool = False) -> dict:
    """Summary of plan properties that matter at 100 TB.

    num_exchanges counts shuffle exchanges only (hash/range/round-robin);
    BroadcastExchange is counted separately — a broadcast is the cheap
    alternative to a shuffle, conflating them defeats the point.

    With AQE on, the pre-execution plan is the *initial* AdaptiveSparkPlan:
    whole-stage-codegen regions (and any AQE re-plans) only exist in the
    final plan. Pass ``execute=True`` to run the query first and report on
    what actually executed — required for a meaningful ``wholestage_codegen``.
    """
    if execute:
        # collect() runs THIS DataFrame's QueryExecution (count()/noop-write
        # would plan a separate command), so the explain below sees the
        # finalized adaptive plan. Callers only use this on test-scale data.
        df.collect()
    text = explain_str(df)
    return {
        "pushed_filters": pushed_filters(df),
        "read_columns": read_schema_columns(df),
        "num_exchanges": len(re.findall(r"\bExchange (?!SinglePartition)", text)),
        "num_broadcasts": len(re.findall(r"BroadcastExchange", text)),
        "wholestage_codegen": bool(re.search(r"\*\(\d+\)", text)),
    }
