"""Persisted ingestion artifacts: the 100 TB shape of incremental dedup.

dedup_against_corpus / dedup_against_corpus_bloom /
minhash_lsh_against_corpus all carry the same plan note: inline, the
corpus is rescanned per batch, and the win is real only when the
corpus-derived structures are PERSISTED per corpus snapshot and reused
across ingestion ticks. This module is that persistence:

    build_corpus_artifacts(corpus, path)   # once per corpus snapshot
    ingest_batch(batch, path)              # per tick: exact dedup
    ingest_batch_neardups(batch, path)     # per tick: LSH candidates
    append_to_artifacts(accepted, path)    # fold survivors back in

Artifact layout under ``path`` (all plain parquet, engine-agnostic):

    fingerprints/   (fp)                    distinct 128-bit content keys
    bloom_state/    (word, bits, m, k)      incremental.bloom_state rows
    band_keys/      (corpus_id, band, band_key)   MinHash LSH bands
    winnow/         (fp)                    distinct winnowing fps
                                            (opt-in: decontamination)
    manifest/       1 row: version + every geometry dial + n_keys

The manifest is written LAST, so a partial build is invisible to
readers — the same commit discipline as the reference's _SUCCESS
marker (HiveApiOutputCommitter, see catalog.py's snapshot notes); a
missing manifest raises instead of silently probing half-built state.
Geometry is never guessed at probe time: batch-side hashing reads the
manifest, and the bloom state re-validates m/k in-plan
(incremental._bloom_geometry_guard). The reference has no dedup or
selection surface (SURVEY §2.2); extension operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_io_experimental_spark.functions.hashing import resolve_family
from hive_io_experimental_spark.functions.reuse import reuse
from hive_io_experimental_spark.operators.dedup import (
    _content_fps,
    _validate_bloom_geometry,
    minhash_band_keys,
    minhash_signatures,
)
from hive_io_experimental_spark.operators.incremental import (
    bloom_membership,
    bloom_state,
    merge_bloom_states,
)

ARTIFACT_VERSION = 1

_FPS = "fingerprints"
_BLOOM = "bloom_state"
_BANDS = "band_keys"
_WINNOW = "winnow"
_MANIFEST = "manifest"


class ArtifactError(RuntimeError):
    """Missing/partial/incompatible ingestion artifacts."""


def build_corpus_artifacts(
    corpus: DataFrame,
    path: str,
    m_bits: int | None = None,
    k: int = 5,
    bits_per_key: int = 10,
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    winnow: bool = False,
    winnow_k: int = 5,
    winnow_window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_family: str | None = None,
) -> dict:
    """One corpus scan -> every per-batch probe structure, persisted.

    Three writes off a single reused fingerprint frame (fps feed the
    distinct set, the bitmap aggregation, and the sizing count — the
    reuse() pattern), plus the banded MinHash keys from a second
    tokenizing scan (shingles, not fingerprints — different input
    columns, deliberately not forced through one pass: the fp scan
    reads (id, text) and collapses immediately, and fusing it into the
    shingle explode would hold the wide gram stream across both
    consumers). Manifest LAST. Returns the manifest as a dict.
    """
    family = resolve_family(corpus, hash_family)
    fps = reuse(
        _content_fps(corpus, text_col, id_col, family).select("fp").distinct()
    )
    if m_bits is None:
        if bits_per_key < 1:
            raise ValueError(f"bits_per_key must be >= 1, got {bits_per_key}")
        n_keys = fps.count()
        m_bits = max(
            1024, 1 << max(1, (n_keys * bits_per_key - 1).bit_length())
        )
    else:
        n_keys = fps.count()
    _validate_bloom_geometry(m_bits, k)
    fps.write.mode("overwrite").parquet(f"{path}/{_FPS}")
    bloom_state(fps, key_col="fp", m_bits=m_bits, k_hashes=k).write.mode(
        "overwrite"
    ).parquet(f"{path}/{_BLOOM}")
    minhash_band_keys(
        minhash_signatures(corpus, text_col, id_col, num_perm, shingle_k, family),
        num_perm,
        bands,
    ).select(
        F.col("id").alias("corpus_id"), "band", "band_key"
    ).write.mode("overwrite").parquet(f"{path}/{_BANDS}")
    if winnow:
        # decontamination structure: the corpus's DISTINCT winnowing
        # fingerprints — any batch doc sharing a substring of length
        # >= winnow_k + winnow_window - 1 chars with the corpus is
        # guaranteed to collide on at least one stored fp (the MOSS
        # bound, text.winnowing_fingerprints). Opt-in: it is the one
        # structure an ingestion tick can live without, and it costs a
        # third tokenizing corpus pass at build time.
        from hive_io_experimental_spark.operators.text import (
            winnowing_fingerprints,
        )

        winnowing_fingerprints(
            corpus, text_col=text_col, id_col=id_col,
            k=winnow_k, window=winnow_window,
        ).select("fp").distinct().write.mode("overwrite").parquet(
            f"{path}/{_WINNOW}"
        )
    manifest = {
        "version": ARTIFACT_VERSION,
        "m_bits": int(m_bits),
        "k": int(k),
        "num_perm": int(num_perm),
        "bands": int(bands),
        "shingle_k": int(shingle_k),
        "hash_family": family,
        "n_keys": int(n_keys),
        "winnow": bool(winnow),
        "winnow_k": int(winnow_k),
        "winnow_window": int(winnow_window),
    }
    corpus.sparkSession.createDataFrame([manifest]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/{_MANIFEST}")
    return manifest


def load_manifest(spark: SparkSession, path: str) -> dict:
    """The artifact manifest, or an ArtifactError naming the fix.

    A readable manifest is the COMMIT marker: it is written last, so
    its absence means no build ever completed here (or one is still in
    flight) and probing would read partial state.
    """
    try:
        rows = spark.read.parquet(f"{path}/{_MANIFEST}").collect()
    except Exception as exc:  # AnalysisException: path missing
        raise ArtifactError(
            f"no ingestion artifacts at {path!r} (manifest unreadable: "
            f"{exc}) — run build_corpus_artifacts first"
        ) from None
    if len(rows) != 1:
        raise ArtifactError(
            f"corrupt manifest at {path!r}: expected 1 row, got {len(rows)}"
        )
    m = rows[0].asDict()
    if m.get("version") != ARTIFACT_VERSION:
        raise ArtifactError(
            f"artifact version {m.get('version')} at {path!r} != "
            f"supported {ARTIFACT_VERSION} — rebuild"
        )
    return m


def ingest_batch(
    batch: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact incremental dedup of one batch against STORED artifacts —
    dedup_against_corpus_bloom's routing with zero corpus scans: the
    bloom state classifies most batch keys as definitely-new, and only
    the maybe set anti-joins the stored fingerprint table (a parquet
    scan of 32-hex keys, never document text). Geometry comes from the
    manifest; the bloom state re-validates it in-plan. Returns
    surviving (id, fp) rows — the dedup_against_corpus contract.
    """
    spark = batch.sparkSession
    man = load_manifest(spark, path)
    batch_reps = (
        _content_fps(batch, text_col, id_col, man["hash_family"])
        .groupBy("fp")
        .agg(F.min("id").alias("id"))
        .select("id", "fp")
    )
    state = spark.read.parquet(f"{path}/{_BLOOM}")
    member = bloom_membership(
        state,
        batch_reps,
        probe_col="fp",
        m_bits=man["m_bits"],
        k_hashes=man["k"],
    ).select(F.col("key").alias("fp"), "maybe_member")
    probed = reuse(batch_reps.join(member, "fp"))
    definite_new = probed.filter(F.col("maybe_member") == 0).select("id", "fp")
    maybe = probed.filter(F.col("maybe_member") == 1).select("id", "fp")
    seen = spark.read.parquet(f"{path}/{_FPS}")
    survivors = maybe.join(seen, "fp", "left_anti").select("id", "fp")
    return definite_new.unionByName(survivors)


def ingest_batch_neardups(
    batch: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH near-dup CANDIDATES of one batch against the stored band-key
    table — minhash_lsh_against_corpus's candidate stage with zero
    corpus scans. Returns (batch_id, corpus_id) pairs; verification
    (exact Jaccard) needs candidate corpus TEXT, which artifacts
    deliberately do not store — at scale that is a point-lookup of the
    candidate ids against the corpus table, i.e.
    minhash_lsh_against_corpus(batch, corpus_rows, threshold=...).
    """
    spark = batch.sparkSession
    man = load_manifest(spark, path)
    inc_bk = minhash_band_keys(
        minhash_signatures(
            batch,
            text_col,
            id_col,
            man["num_perm"],
            man["shingle_k"],
            man["hash_family"],
        ),
        man["num_perm"],
        man["bands"],
    ).select(F.col("id").alias("batch_id"), "band", "band_key")
    cor_bk = spark.read.parquet(f"{path}/{_BANDS}")
    return (
        inc_bk.join(cor_bk, ["band", "band_key"])
        .select("batch_id", "corpus_id")
        .distinct()
    )


def append_to_artifacts(
    accepted: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Fold an accepted batch into the artifacts: fingerprints and band
    keys APPEND (parquet append of batch-sized increments — no corpus
    rewrite), the bloom state MERGES (bitwise-OR via
    merge_bloom_states, idempotent on re-delivered batches; the state
    is <= m/32 rows, so its rewrite is constant-sized regardless of
    corpus size). Manifest rewritten LAST with the updated key count.

    Only fingerprints not already stored are appended (anti-join), so
    re-ingesting a batch is a no-op on every structure. Not
    transactional across the four directories — a crash mid-append can
    leave extra fp/band rows (harmless: probes only get MORE exact)
    but never a stale manifest claiming them.
    """
    spark = accepted.sparkSession
    man = load_manifest(spark, path)
    # EAGER lineage cut on the input, unconditionally: the natural caller
    # chain (ingest_batch -> accept -> append) hands this function a frame
    # whose PLAN still reads the very directories it rewrites. Spark
    # unifies same-path scans within one query, so the caller's stale
    # pre-append file listing can win over this function's fresh read —
    # measured here as the anti-join "resurrecting" already-stored keys
    # on a second append — and after the bloom overwrite the stale
    # listing points at deleted files outright. Materializing the rows
    # first makes every downstream read the only reader of each path.
    accepted = accepted.localCheckpoint()
    fresh = reuse(
        _content_fps(accepted, text_col, id_col, man["hash_family"])
        .select("id", "fp")
        .groupBy("fp")
        .agg(F.min("id").alias("id"))
        .join(spark.read.parquet(f"{path}/{_FPS}"), "fp", "left_anti")
    )
    n_new = fresh.count()
    if n_new == 0:
        return man
    fresh.select("fp").write.mode("append").parquet(f"{path}/{_FPS}")
    # band keys for the fresh docs only (semi-join prunes re-delivered
    # rows BEFORE tokenization, same as the verify stage's pruning)
    fresh_docs = accepted.join(
        fresh.select(F.col("id").alias(id_col)), id_col, "left_semi"
    )
    minhash_band_keys(
        minhash_signatures(
            fresh_docs,
            text_col,
            id_col,
            man["num_perm"],
            man["shingle_k"],
            man["hash_family"],
        ),
        man["num_perm"],
        man["bands"],
    ).select(
        F.col("id").alias("corpus_id"), "band", "band_key"
    ).write.mode("append").parquet(f"{path}/{_BANDS}")
    if man.get("winnow"):
        from hive_io_experimental_spark.operators.text import (
            winnowing_fingerprints,
        )

        # eager materialization before the append: the anti-join reads
        # the same directory the write appends to (the staleness footgun
        # class again — cut the plan from the path first)
        new_w = (
            winnowing_fingerprints(
                fresh_docs, text_col=text_col, id_col=id_col,
                k=man["winnow_k"], window=man["winnow_window"],
            )
            .select("fp")
            .distinct()
            .join(
                spark.read.parquet(f"{path}/{_WINNOW}"), "fp", "left_anti"
            )
            .localCheckpoint()
        )
        new_w.write.mode("append").parquet(f"{path}/{_WINNOW}")
    delta = bloom_state(
        fresh, key_col="fp", m_bits=man["m_bits"], k_hashes=man["k"]
    )
    # constant-sized rewrite (<= m/32 rows): EAGER localCheckpoint
    # materializes the merged state into executor blocks and cuts the
    # lineage back to the directory being replaced, so the overwrite
    # never reads the path it writes (Spark rejects that plan) and
    # nothing state-sized ever lands on the driver
    merged = merge_bloom_states(
        spark.read.parquet(f"{path}/{_BLOOM}"), delta
    ).localCheckpoint()
    merged.write.mode("overwrite").parquet(f"{path}/{_BLOOM}")
    man = dict(man, n_keys=int(man["n_keys"]) + int(n_new))
    spark.createDataFrame([man]).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/{_MANIFEST}"
    )
    return man


def decontaminate_batch(
    batch: DataFrame,
    path: str,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-leakage check at ingestion time: batch documents whose
    winnowing fingerprints collide with the STORED corpus's — i.e. docs
    sharing a substring of length >= winnow_k + winnow_window - 1 chars
    with anything already ingested (train-on-the-benchmark protection
    when the artifacts were built over held-out eval sets). Zero corpus
    scans: the batch tokenizes once, then a semi-join against the
    stored distinct-fp table. Raises ArtifactError if the artifacts
    were built without winnow=True rather than silently passing
    everything. Returns (doc_id, n_shared_fps) for batch docs with at
    least ``min_shared`` colliding fingerprints.
    """
    from hive_io_experimental_spark.operators.text import (
        winnowing_fingerprints,
    )

    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    spark = batch.sparkSession
    man = load_manifest(spark, path)
    if not man.get("winnow"):
        raise ArtifactError(
            f"artifacts at {path!r} were built without winnow=True — "
            "rebuild (or append) with winnowing enabled before running "
            "decontamination"
        )
    fps = winnowing_fingerprints(
        batch, text_col=text_col, id_col=id_col,
        k=man["winnow_k"], window=man["winnow_window"],
    )
    stored = spark.read.parquet(f"{path}/{_WINNOW}")
    return (
        fps.join(stored, "fp", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= min_shared)
    )
