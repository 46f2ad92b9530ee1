"""Typed engine options with defaults and a registry dump.

Parity with the reference's conf option system (conf/*.java — typed
Bool/Int/Long/Float/Str/Class options with defaults; AllOptions dumps the
registry, conf/AllOptions.java:52-69, surfaced by the cmdline
``conf-options`` command, cmdline/Main.java:39-49).

Spark-first shape: options are declared once, read/written through
``spark.conf`` under the ``hiveio.`` namespace, and fall back to their
defaults — the same get-with-default contract the reference's
``HiveConf.getBoolean(key, default)`` pattern provides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import SparkSession

_REGISTRY: dict[str, "Option"] = {}


@dataclass(frozen=True)
class Option:
    """One typed option (conf/AbstractConfOption shape)."""

    key: str
    default: Any
    parse: Callable[[str], Any]
    doc: str

    def get(self, spark: SparkSession) -> Any:
        raw = spark.conf.get(self.key, None)
        if raw is None:
            return self.default
        return self.parse(raw)

    def set(self, spark: SparkSession, value: Any) -> None:
        spark.conf.set(self.key, str(value))


def _parse_bool(s: str) -> bool:
    return s.strip().lower() in ("1", "true", "yes")


def _register(key: str, default: Any, parse: Callable[[str], Any], doc: str) -> Option:
    opt = Option(key=key, default=default, parse=parse, doc=doc)
    _REGISTRY[key] = opt
    return opt


# -- the engine's options (reference analogs noted) ---------------------------

# OutputConf.java:58-59 HIVE_DROP_PARTITION
DROP_PARTITION = _register(
    "hiveio.output.drop_partition", False, _parse_bool,
    "overwrite an existing target partition instead of erroring",
)
# SplitOptions.java:26-46 splits-per-thread heuristic -> repartition override
NUM_SPLITS = _register(
    "hiveio.input.num_splits", 0, int,
    "override scan parallelism (0 = let Spark/AQE decide)",
)
# Parsers.forcedParser (input/parser/Parsers.java:77-100) -> reader fast path
FORCE_PARSER = _register(
    "hiveio.input.parser", "", str,
    "force a reader strategy: '' auto, 'vectorized', 'row'",
)
# BackoffRetryTask options (common/BackoffRetryTask.java:45-52)
RETRY_MAX_TRIES = _register(
    "hiveio.retry.max_tries", 5, int, "catalog call retry attempts",
)
RETRY_INITIAL_DELAY_S = _register(
    "hiveio.retry.initial_delay_s", 10.0, float, "first retry backoff delay",
)
# merge operators collect distinct partition VALUES (not rows) to the
# driver to plan partition-scoped rewrites; bounded by partition count by
# construction, but a runaway partitioning scheme (e.g. partition-by-userid)
# would make that list itself huge — fail fast instead of OOMing the driver
MERGE_MAX_PARTITIONS = _register(
    "hiveio.merge.max_partitions", 100_000, int,
    "max distinct partition values a merge may plan over (driver-side list)",
)
# content-hash family for dedup/fingerprint operators: md5 (portable,
# oracle-checkable) or xxhash64 (fast path at raw scale)
HASH_FAMILY = _register(
    "hiveio.hash.family", "md5", str,
    "hash family for dedup/LSH/fingerprints: 'md5' (portable) or 'xxhash64'",
)
# exact embedding near-dup blocking (operators/dedup.py:embedding_neardup)
DEDUP_BLOCK_ROWS = _register(
    "hiveio.dedup.block_rows", 4096, int,
    "rows per block in exact embedding near-dup (per-task memory knob)",
)
DEDUP_MAX_BLOCKS = _register(
    "hiveio.dedup.max_blocks", 1024, int,
    "refuse exact all-pairs past this many blocks (LSH-bucket first)",
)
# trained-IVF quantizer sample budget (operators/similarity.py)
IVF_SAMPLE_PER_CENTROID = _register(
    "hiveio.similarity.sample_per_centroid", 256, int,
    "training vectors sampled per centroid for the IVF coarse quantizer",
)
# training-export packing (operators/packing.py)
PACK_WINDOW = _register(
    "hiveio.pack.window", 2048, int,
    "token window size for sequence packing",
)
PACK_SHARDS = _register(
    "hiveio.pack.shards", 32, int,
    "hash shards for sequence packing (parallelism of the pack step)",
)
# tailer RecordPrinter buffer (tailer/TailerArgs.java:52-63)
RECORD_BUFFER_FLUSH = _register(
    "hiveio.tail.record_buffer_flush", 1000, int,
    "rows buffered between stdout flushes in the tail CLI",
)
# shingle document-frequency cut (operators/dedup.py DEFAULT_MAX_SHINGLE_FREQ)
SHINGLE_MAX_FREQ = _register(
    "hiveio.dedup.max_shingle_freq", 1000, int,
    "drop shingles appearing in more docs than this before the pair join "
    "(0 = exact/unbounded semantics)",
)
# LSH band-bucket cap: a bucket holding B docs emits B^2/2 candidate pairs,
# so one boilerplate-heavy bucket (identical headers/templates) turns the
# band join quadratic — the same hazard class the shingle df-cut bounds.
# Oversized buckets are dropped before the self-join; members stay pairable
# only through their other, discriminative bands, so recall CAN degrade.
# The drop is measurable, not silent: dedup.lsh_bucket_report(df, ...) runs
# the same bucket aggregation at the same parameters and returns how many
# buckets/member-rows the cap removes — run it before a capped corpus pass.
LSH_MAX_BUCKET = _register(
    "hiveio.dedup.max_lsh_bucket", 10_000, int,
    "drop LSH band buckets holding more docs than this before the "
    "candidate self-join (0 = unbounded)",
)
# multi-branch intermediate reuse (functions/reuse.py): operators whose
# intermediate feeds >1 non-identical downstream shuffle localCheckpoint it
# so the map pass runs once; blocks are freed by the ContextCleaner when the
# caller drops the result frame. 'recompute' keeps pure lineage (fault
# tolerant on preemptible fleets) at the cost of re-running the map pass.
REUSE_STRATEGY = _register(
    "hiveio.reuse.strategy", "checkpoint", str,
    "multi-branch intermediate reuse: 'checkpoint' (localCheckpoint, "
    "operator-scoped, ContextCleaner-freed) or 'recompute' (pure lineage)",
)
# histogram quantile state bucket width in e4 fixed-point units
# (operators/incremental.py _HIST_BUCKET_E4)
HIST_BUCKET_E4 = _register(
    "hiveio.incremental.hist_bucket_e4", 10_000, int,
    "value-histogram bucket width in e4 fixed-point units (percentile "
    "error bound = one bucket)",
)
# skip-unreadable-splits scan default (ScanSpec.ignore_corrupt_files;
# HiveInput.java:150-199 skip semantics)
IGNORE_CORRUPT_FILES = _register(
    "hiveio.input.ignore_corrupt_files", False, _parse_bool,
    "default for ScanSpec.ignore_corrupt_files: skip unreadable files "
    "instead of failing the scan",
)
# exact-substring span dedup window (operators/dedup.py span_occurrences):
# every duplicated substring of >= this many tokens contains a duplicated
# window, so smaller = more sensitive and more state
SPAN_WINDOW_TOKENS = _register(
    "hiveio.dedup.span_window_tokens", 16, int,
    "token-window width for exact-substring (span) duplicate detection",
)
# heavy-hitter sketch tier sizing (operators/incremental.py
# topk_sketch_state): error bound scales with 1/k, state with k x shards
TOPK_SKETCH_K = _register(
    "hiveio.incremental.topk_k", 32, int,
    "kept keys per shard in the bounded top-k sketch state",
)
TOPK_SKETCH_SHARDS = _register(
    "hiveio.incremental.topk_shards", 8, int,
    "hash shards in the bounded top-k sketch state",
)
# Bloom membership tier sizing (operators/incremental.py bloom_state):
# false-positive rate ~ (1 - e^(-k*n/m))^k; state is m/32 word rows
BLOOM_M_BITS = _register(
    "hiveio.incremental.bloom_m_bits", 16_384, int,
    "bloom filter width in bits (state = m/32 word rows; size to "
    "~10 bits per expected key for ~1% false positives)",
)
BLOOM_K_HASHES = _register(
    "hiveio.incremental.bloom_k", 4, int,
    "independent hash probes per key in the bloom membership tier",
)


def all_options() -> dict[str, Option]:
    """The full registry (AllOptions parity)."""
    return dict(_REGISTRY)


def all_options_string(spark: SparkSession | None = None) -> str:
    """Human-readable dump (AllOptions.allOptionsString parity). When a
    session is given, shows effective values beside defaults."""
    lines = []
    for key in sorted(_REGISTRY):
        opt = _REGISTRY[key]
        line = f"{key} (default: {opt.default!r}) — {opt.doc}"
        if spark is not None:
            line += f" [effective: {opt.get(spark)!r}]"
        lines.append(line)
    return "\n".join(lines)
