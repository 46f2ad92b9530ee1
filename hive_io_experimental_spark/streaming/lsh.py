"""Streaming MinHash-LSH dedup: band-bucket ownership over a document stream.

Batch twin: operators/dedup.py:minhash_signatures / minhash_band_keys. The
signature needs NO shuffle in streaming form — each document's MinHash is an
``array_min`` over its own shingle array (a per-row columnar expression that
equals the batch groupBy-min exactly: same md5 family, same lexicographic
min). Banding is the same slice-and-hash.

The stateful step is bucket ownership: the first document to arrive in each
(band, band_key) bucket owns it; every later document hitting an owned
bucket is near-duplicate evidence against that owner. State is one entry
per bucket within the watermark horizon (dropDuplicatesWithinWatermark
evicts at passage) — the bounded-state form of the batch candidate join.

Scale notes: per-row signature work is O(shingles x permutations) inside
whole-stage codegen; the only shuffle is the hash partition on bucket key
for the dedup state store, identical in shape to the batch band-key join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hive_io_experimental_spark.functions.hashing import md5_minhash_token
from hive_io_experimental_spark.functions.textfns import word_shingles


def minhash_band_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    num_perm: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """Per-document band keys, computed row-local (no shuffle).

    Returns (doc_id, ts, band, band_key) — one row per document x band.
    Documents too short to have any k-shingle emit nothing (batch parity:
    they never enter the candidate join either).
    """
    sh = F.array_distinct(word_shingles(F.col(text_col), k))
    prepared = docs.select(
        F.col(id_col).alias("doc_id"), F.col(ts_col).alias("ts"), sh.alias("sh")
    ).filter(F.size("sh") > 0)

    def sig(i: int):
        # closure factory, NOT a default-arg lambda: PySpark introspects the
        # lambda arity, so an extra default parameter becomes a second Column.
        return F.array_min(
            F.transform(F.col("sh"), lambda s: md5_minhash_token(s, i))
        )

    sigs = prepared.select(
        "doc_id", "ts", *[sig(i).alias(f"sig_{i}") for i in range(num_perm)]
    )
    rows = num_perm // bands
    band_cols = []
    for b in range(bands):
        slice_cols = [F.col(f"sig_{b * rows + r}") for r in range(rows)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *slice_cols)).alias("band_key"),
            )
        )
    return sigs.select(
        "doc_id", "ts", F.explode(F.array(*band_cols)).alias("bk")
    ).select(
        "doc_id",
        "ts",
        F.col("bk.band").alias("band"),
        F.col("bk.band_key").alias("band_key"),
    )


def minhash_lsh_dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    num_perm: int = 16,
    bands: int = 4,
    k: int = 3,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Bucket-owner stream: first document per LSH bucket within the
    watermark horizon.

    Emits (doc_id, ts, band, band_key) for bucket winners only. A document
    absent from every bucket it hashed into collided with earlier documents
    in all of them — the streaming near-duplicate signal. Downstream keeps
    ``distinct doc_id`` as the survivor set, or joins losers back to owners
    for cluster assignment.
    """
    banded = minhash_band_stream(
        docs, text_col, id_col, ts_col, num_perm, bands, k
    )
    return banded.withWatermark("ts", watermark_delay).dropDuplicatesWithinWatermark(
        ["band", "band_key"]
    )
