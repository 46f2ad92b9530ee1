"""Plan inspection utilities.

The reference hand-implements its physical optimizations (partition pruning,
column projection pushdown — SURVEY §4); in Spark those are Catalyst's job.
This module provides helpers to *verify* the optimized plan actually has the
shape we want (pushed filters, pruned schema, broadcast joins) so tests and
the bench harness can assert on plan quality, not just results.
"""

from hive_io_experimental_spark.plans.inspect import (
    explain_str,
    pushed_filters,
    read_schema_columns,
    scan_plan_report,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "scan_plan_report",
]
