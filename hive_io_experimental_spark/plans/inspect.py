"""Inspect Spark physical plans for pushdown/broadcast/shuffle shape.

Used by tests to assert the engine's scans really push filters and prune
columns (the reference's equivalents: read-column ids pushed into RCFile,
HiveApiInputFormat.java:264-279; partition pruning via metastore filter,
:290-309) — and by the perf pass to count shuffles before they bite at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Extract PushedFilters entries from the formatted plan."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
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


def scan_plan_report(df: DataFrame) -> dict:
    """Summary of plan properties that matter at 100 TB."""
    text = explain_str(df)
    return {
        "pushed_filters": pushed_filters(df),
        "read_columns": read_schema_columns(df),
        "num_exchanges": len(re.findall(r"\bExchange\b", text)),
        "num_broadcasts": len(re.findall(r"BroadcastExchange", text)),
        "wholestage_codegen": bool(re.search(r"WholeStageCodegen", text)),
    }
