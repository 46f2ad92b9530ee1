"""Column-level helper functions (all JVM-side built-in compositions)."""

from hive_io_experimental_spark.functions.hashing import (
    md5_minhash_token,
    portable_hash64,
)
from hive_io_experimental_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)
from hive_io_experimental_spark.functions.textfns import (
    char_ngrams,
    word_shingles,
    word_tokens,
)

__all__ = [
    "portable_hash64",
    "md5_minhash_token",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "char_ngrams",
    "word_shingles",
    "word_tokens",
]
