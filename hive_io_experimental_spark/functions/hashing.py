"""Portable hashing helpers.

Two families:

* ``xxhash64``-based (:func:`fast_hash64`) — the fast path for scale: one
  JVM-side 64-bit hash per value, used by the production dedup/LSH operators.
* ``md5``-based (:func:`portable_hash64`, :func:`md5_minhash_token`) — the
  *portable* path: MD5 is bit-identical across Spark, DuckDB and every other
  engine, which makes results oracle-checkable. MinHash built on it is still
  a valid uniform hash family, just ~2-3x slower than xxhash64; both run
  JVM-side inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fast_hash64(col: Column | str, seed: int = 42) -> Column:
    """64-bit xxhash64 — preferred at scale; not portable across engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c, F.lit(seed))


def portable_hash64(col: Column | str) -> Column:
    """Unsigned-ish 60-bit integer from the first 15 hex chars of md5.

    15 hex chars keep the value < 2^60, safely inside a signed 64-bit long in
    both Spark and DuckDB (DuckDB oracle: ('0x' || substr(md5(x),1,15))::UBIGINT).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def resolve_family(df, explicit: str | None = None) -> str:
    """Hash family for content hashing: explicit arg > session conf > md5.

    'md5' is the portable default (bit-identical in DuckDB — required for
    the correctness oracle); 'xxhash64' is the production fast path (~2-3x
    cheaper per value, JVM-native, NOT cross-engine portable). Operators
    accept ``hash_family`` and fall back to the ``hiveio.hash.family``
    session conf, so a deployment flips the whole dedup/fingerprint surface
    with one setting.
    """
    if explicit:
        return explicit
    from hive_io_experimental_spark.conf import HASH_FAMILY

    return HASH_FAMILY.get(df.sparkSession)


def content_hash64(col: Column | str, family: str = "md5") -> Column:
    """64-bit-ish content hash in the chosen family (long)."""
    if family == "xxhash64":
        return fast_hash64(col)
    return portable_hash64(col)


def minhash_token(col: Column | str, permutation: int, family: str = "md5") -> Column:
    """Permutation-indexed token hash for MinHash in the chosen family.

    Both are valid uniform hash families under lexicographic/numeric MIN;
    md5 yields hex strings (portable), xxhash64 yields longs (fast).
    """
    if family == "xxhash64":
        c = F.col(col) if isinstance(col, str) else col
        return F.xxhash64(c, F.lit(permutation))
    return md5_minhash_token(col, permutation)


def md5_minhash_token(col: Column | str, permutation: int) -> Column:
    """The permutation-i hash of a shingle for MinHash: md5('<i>:' + shingle).

    Taking the lexicographic MIN of these hex strings per document is a
    MinHash signature component: md5 is a uniform hash family indexed by the
    integer prefix. Identical expression exists in DuckDB SQL, so LSH results
    are oracle-checkable.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.concat(F.lit(f"{permutation}:"), c))
