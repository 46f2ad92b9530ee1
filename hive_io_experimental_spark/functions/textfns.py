"""Text tokenization / shingling as built-in column expressions.

All JVM-side (split/sequence/transform) — no Python in the hot path. These
feed the dedup and text-analysis operators; identical logic is expressible in
DuckDB SQL for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(col: Column | str) -> Column:
    """Lowercase + collapse whitespace — the canonical form used for hashing."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def word_tokens(col: Column | str) -> Column:
    """Whitespace/punctuation word tokens (array<string>), lowercased."""
    toks = F.split(F.lower(_c(col)), r"[^\p{L}\p{N}]+")
    return F.filter(toks, lambda t: t != "")


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """k-word shingles (array<string>) built from word_tokens.

    sequence(1, n-k+1) + transform keeps it all in codegen; returns an empty
    array for texts shorter than k words.
    """
    toks = word_tokens(col)
    n = F.size(toks)
    # guard: sequence(1, 0) in Spark counts DOWN ([1, 0]); short texts must
    # yield an empty array, not bogus shingles.
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Character n-grams over the normalized text (array<string>)."""
    s = normalize_text(col)
    ln = F.length(s)
    return F.when(
        ln >= n,
        F.transform(
            F.sequence(F.lit(1), ln - (n - 1)),
            lambda i: s.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
