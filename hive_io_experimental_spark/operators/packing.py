"""Training-export operators: sequence packing, token-budget mixtures,
and duplicate-representative selection.

The last mile of a training-data pipeline turns a curated document corpus
into model-ready shards: documents are concatenated into fixed-size token
windows ("sequence packing"), sources are mixed to a token budget, and
duplicate clusters are collapsed to one representative. The reference has
no such surface (it is an I/O library, SURVEY §2.2); these are
training-data-pipeline extensions built on the same determinism rules as
operators/sampling.py — every ordering and assignment derives from the
portable md5 hash family, so results are bit-reproducible across reruns,
partitionings, AND engines (DuckDB oracle twins).

Scale design:
  * ``pack_sequences`` (split-allowed, the standard LM pretraining shape)
    is pure window math over a hash-sharded cumsum — one shuffle on the
    shard key, no Python, no state; shards are independent so 100 TB packs
    as 100k independent window scans.
  * ``pack_sequences_greedy`` (no-split) needs a sequential scan per shard
    — implemented as ONE Arrow-batched applyInPandas over shards (the
    per-shard state is a single integer pair; memory is O(batch), not
    O(shard)).
  * ``token_budget_mix`` is a per-source cumsum cut — one shuffle on
    source, then a pure filter.
  * ``exact_dup_representatives`` is a window row_number over the content
    hash — one shuffle, map-side-combinable count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hive_io_experimental_spark.functions.hashing import portable_hash64
from hive_io_experimental_spark.operators.text import _token_count_columns

# Every packed document costs its BPE-ish token estimate plus one
# end-of-document separator token — the standard concatenation convention.
EOD_TOKENS = 1


def _resolve_pack_conf(
    documents: DataFrame, window: int | None, n_shards: int | None
) -> tuple[int, int]:
    """Explicit args win; None falls back to the hiveio.pack.* options."""
    from hive_io_experimental_spark.conf import PACK_SHARDS, PACK_WINDOW

    spark = documents.sparkSession
    if window is None:
        window = PACK_WINDOW.get(spark)
    if n_shards is None:
        n_shards = PACK_SHARDS.get(spark)
    return int(window), int(n_shards)


def _with_pack_keys(
    documents: DataFrame,
    n_shards: int,
    text_col: str,
    id_col: str,
    salt: str,
) -> DataFrame:
    """tokens / shard / order-hash columns shared by the packing operators.

    The order hash is a deterministic shuffle: documents are laid out in
    hash order, not id order, so adjacent ids (which often correlate with
    length and topic) don't cluster into the same windows.
    """
    tokens = (
        _token_count_columns(F.col(text_col))["est_bpe_tokens"]
        + F.lit(EOD_TOKENS)
    ).alias("tokens")
    hash_expr = portable_hash64(
        F.concat(F.lit(salt), F.col(id_col).cast("string"))
    )
    return documents.select(
        F.col(id_col).alias("doc_id"),
        tokens,
        hash_expr.alias("_h"),
        F.pmod(hash_expr, F.lit(n_shards)).cast("long").alias("shard"),
    )


def pack_sequences(
    documents: DataFrame,
    window: int | None = None,
    n_shards: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "pack:",
) -> DataFrame:
    """Split-allowed sequence packing: concatenate each shard's documents in
    deterministic hash order and cut the token stream into fixed ``window``
    slices. A document may span a window boundary (standard LM pretraining
    concatenation) — so every window except a shard's last is exactly full,
    and the math is a pure cumulative sum:

        offset       = cumsum(tokens) - tokens      (within shard)
        first_window = offset div window
        last_window  = (offset + tokens - 1) div window

    Returns one row per document: (doc_id, shard, tokens, first_window,
    last_window, n_windows). Integer `div` floors exactly like DuckDB's
    ``//`` — engine-stable at any offset.

    ``window`` / ``n_shards`` default to the hiveio.pack.* session options
    (conf.py registry) so a deployment retunes the export layer without
    touching call sites.
    """
    window, n_shards = _resolve_pack_conf(documents, window, n_shards)
    keyed = _with_pack_keys(documents, n_shards, text_col, id_col, salt)
    w = Window.partitionBy("shard").orderBy("_h", "doc_id")
    offset = (F.sum("tokens").over(w) - F.col("tokens")).alias("_off")
    first = F.expr(f"_off div {window}").alias("first_window")
    last = F.expr(f"(_off + tokens - 1) div {window}").alias("last_window")
    return (
        keyed.select("doc_id", "shard", "tokens", offset)
        .select(
            "doc_id", "shard", "tokens", first, last,
        )
        .withColumn(
            "n_windows", F.col("last_window") - F.col("first_window") + 1
        )
    )


def pack_sequences_greedy(
    documents: DataFrame,
    window: int | None = None,
    n_shards: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "pack:",
) -> DataFrame:
    """No-split (next-fit) packing: walk each shard's documents in the same
    deterministic hash order; a document that would overflow the current
    bin starts a new one. Documents larger than ``window`` get a bin of
    their own with ``truncated = true`` (the exporter's cue to split or
    drop them).

    Sequential per-shard state (fill of the current bin) cannot be a
    window function, so each shard streams through ONE Arrow-batched
    applyInPandas pass — state is two integers per shard regardless of
    shard size. Output: (doc_id, shard, bin_id, tokens, truncated).
    """
    import pandas as pd

    window, n_shards = _resolve_pack_conf(documents, window, n_shards)
    keyed = _with_pack_keys(documents, n_shards, text_col, id_col, salt)

    schema = (
        "doc_id long, shard long, bin_id long, tokens long, truncated boolean"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_h", "doc_id"], kind="mergesort")
        bins, fill, current = [], 0, 0
        trunc = []
        for t in pdf["tokens"].to_numpy():
            t = int(t)
            if t > window:
                # oversize: its own bin, never co-packed
                current += 1 if fill > 0 else 0
                bins.append(current)
                trunc.append(True)
                current += 1
                fill = 0
                continue
            if fill + t > window:
                current += 1
                fill = 0
            bins.append(current)
            trunc.append(False)
            fill += t
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "shard": pdf["shard"].to_numpy(),
                "bin_id": bins,
                "tokens": pdf["tokens"].to_numpy(),
                "truncated": trunc,
            }
        )
        return out

    return keyed.groupBy("shard").applyInPandas(pack, schema)


def token_budget_mix(
    documents: DataFrame,
    budgets: dict[str, int],
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "mix:",
) -> DataFrame:
    """Deterministic token-budget mixture: for each source, keep documents
    in hash order while the source's cumulative token count stays within
    its budget (sources absent from ``budgets`` contribute nothing).

    The hash order makes the kept set a uniform random-looking sample that
    is identical on every rerun and engine; the budget cut is a per-source
    cumsum filter — one shuffle on source. Returns the kept documents with
    (doc_id, source, tokens, cum_tokens).
    """
    tokens = (
        _token_count_columns(F.col(text_col))["est_bpe_tokens"]
        + F.lit(EOD_TOKENS)
    ).alias("tokens")
    h = portable_hash64(
        F.concat(F.lit(salt), F.col(id_col).cast("string"))
    ).alias("_h")
    keyed = documents.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        tokens,
        h,
    )
    budget = None
    for src, b in sorted(budgets.items()):
        clause = F.when(F.col("source") == src, F.lit(int(b)))
        budget = clause if budget is None else budget.when(
            F.col("source") == src, F.lit(int(b))
        )
    budget = (
        budget.otherwise(F.lit(0)) if budget is not None else F.lit(0)
    )
    w = Window.partitionBy("source").orderBy("_h", "doc_id")
    cum = F.sum("tokens").over(w).alias("cum_tokens")
    return (
        keyed.select("doc_id", "source", "tokens", cum)
        .filter(F.col("cum_tokens") <= budget)
    )


def exact_dup_representatives(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Collapse exact-duplicate texts to one representative each: the
    lowest doc_id of every distinct text (identical texts tie on every
    content feature, so the id is the only stable tie-break), with the
    cluster's copy count.

    One shuffle on the content hash; the count is map-side combinable.
    Grouping on md5(text) — not text itself — keeps the shuffle key 16
    bytes regardless of document size (the dedup.exact_dedup convention;
    md5's 128 bits make birthday collisions negligible at any corpus size).
    Returns (doc_id, text_md5, n_copies).
    """
    cluster = F.md5(F.col(text_col)).alias("text_md5")
    keyed = documents.select(F.col(id_col).alias("doc_id"), cluster)
    w = Window.partitionBy("text_md5").orderBy("doc_id")
    return (
        keyed.select(
            "doc_id",
            "text_md5",
            F.row_number().over(w).alias("_rn"),
            F.count(F.lit(1)).over(Window.partitionBy("text_md5"))
            .alias("n_copies"),
        )
        .filter(F.col("_rn") == 1)
        .select("doc_id", "text_md5", "n_copies")
    )


def export_sorted_shards(
    df: DataFrame,
    sort_cols: tuple[str, ...],
    n_shards: int,
    out_dir: str,
    fmt: str = "parquet",
) -> None:
    """Total-order shard export: every row of part-i sorts <= part-(i+1).

    The training-export step after curation/packing: consumers stream
    shards in file order and see a globally sorted corpus (e.g. by
    curriculum score or pack id) without any single node ever holding a
    global sort. repartitionByRange samples the sort key to cut balanced
    range boundaries (one pass), then each shard sorts locally —
    spill-safe at any scale, and Spark's part-file numbering preserves
    the range order on disk. NULL sort keys sort first (Spark default),
    in the first shard.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    (
        df.repartitionByRange(n_shards, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode("errorifexists")
        .format(fmt)
        .save(out_dir)
    )
