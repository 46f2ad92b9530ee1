"""End-to-end corpus curation: the composition a training pipeline runs.

One operator chaining the engine's curation stages over a documents
table — quality gate ∩ exact-dedup keep-list ∩ deterministic stratified
sample — emitting the final corpus manifest. Each stage is an existing
oracle-checked operator; the composition stays oracle-checkable because
every stage is deterministic (hash-gated sampling, min-id dedup winners,
pure-expression quality metrics).

Scale shape: the quality gate is a per-row map on the scan; the dedup
keep-list is one hash-keyed shuffle; membership tests are LEFT SEMI joins
on doc_id (only keys shuffle, and the gate/keep sides carry no payload).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hive_io_experimental_spark.operators.dedup import exact_dedup
from hive_io_experimental_spark.operators.sampling import hash_stratified_sample
from hive_io_experimental_spark.operators.text import quality_filter


def curate_corpus(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    strata_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Select the curated corpus: documents that pass the quality gates,
    are their duplicate-group's keeper (min doc_id per exact normalized
    text), and fall inside the per-stratum deterministic sample.

    Returns (doc_id, <strata_col>) ordered by doc_id — the manifest a
    downstream tokenization job consumes.
    """
    good = quality_filter(df, text_col=text_col, id_col=id_col).select(
        F.col("doc_id")
    )
    kept = exact_dedup(df, text_col=text_col, id_col=id_col).select(
        F.col("kept_id").alias("doc_id")
    )
    sampled = hash_stratified_sample(
        df, rates, strata_col=strata_col, key_col=id_col,
        default_rate=default_rate,
    ).select(F.col(id_col).alias("doc_id"), F.col(strata_col))
    return (
        sampled.join(good, "doc_id", "left_semi")
        .join(kept, "doc_id", "left_semi")
    )
