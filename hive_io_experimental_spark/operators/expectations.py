"""Declarative data-quality expectations over any table (one-pass audit).

The pre-load contract check every pipeline wants in front of a 100 TB
ingest (the Deequ / dbt-test / Great-Expectations shape, distilled):
declare rules, get one row per rule with its violation count, gate the
load on `n_violations == 0`. Everything compiles into a SINGLE aggregate
pass over the scan — conditional-count expressions with map-side partial
aggregation, one shuffled row total — so auditing costs one table read
regardless of how many rules are declared.

Rule forms (dicts, keeping the surface JSON-serializable for configs):
  {"type": "not_null",        "column": c}
  {"type": "unique",          "column": c}              # nulls ignored
  {"type": "accepted_values", "column": c, "values": [...]}
  {"type": "in_range",        "column": c, "min": x, "max": y}  # inclusive
  {"type": "matches",         "column": c, "pattern": regex}
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _violations(rule: dict):
    c = F.col(rule["column"])
    kind = rule["type"]
    if kind == "not_null":
        return F.count(F.when(c.isNull(), 1))
    if kind == "unique":
        # duplicates among non-null values: n_nonnull - n_distinct
        return F.count(c) - F.countDistinct(c)
    if kind == "accepted_values":
        return F.count(F.when(~c.isin(*rule["values"]) | c.isNull(), 1))
    if kind == "in_range":
        return F.count(
            F.when(
                c.isNull() | (c < rule["min"]) | (c > rule["max"]), 1
            )
        )
    if kind == "matches":
        return F.count(
            F.when(
                c.isNull() | ~c.rlike(rule["pattern"]), 1
            )
        )
    raise ValueError(f"unknown expectation type: {kind!r}")


def _describe(rule: dict) -> str:
    kind = rule["type"]
    if kind == "accepted_values":
        return f"accepted_values({sorted(rule['values'])})"
    if kind == "in_range":
        return f"in_range[{rule['min']}, {rule['max']}]"
    if kind == "matches":
        return f"matches({rule['pattern']})"
    return kind


def check_expectations(df: DataFrame, rules: list[dict]) -> DataFrame:
    """One row per rule: (rule_id, column, rule, n_violations, passed).

    rule_id is the rule's position (stable, referencable from configs);
    the whole report is one aggregate job (see module docstring).
    """
    if not rules:
        raise ValueError("no expectations given")
    aggs = [
        _violations(r).cast("long").alias(f"_r{i}")
        for i, r in enumerate(rules)
    ]
    reports = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("rule_id"),
                F.lit(r["column"]).alias("column"),
                F.lit(_describe(r)).alias("rule"),
                F.col(f"_r{i}").alias("n_violations"),
                (F.col(f"_r{i}") == 0).alias("passed"),
            )
            for i, r in enumerate(rules)
        ]
    )
    return (
        df.agg(*aggs)
        .select(F.explode(reports).alias("_e"))
        .select("_e.rule_id", "_e.column", "_e.rule", "_e.n_violations",
                "_e.passed")
    )
