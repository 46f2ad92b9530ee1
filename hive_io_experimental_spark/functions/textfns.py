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
    """Whitespace/punctuation word tokens (array<string>), lowercased.

    array_remove instead of a filter() lambda: identical result (the split
    only ever produces '' as a removable artifact) but a plain codegen-able
    expression, not an interpreted higher-order function.
    """
    return F.array_remove(F.split(F.lower(_c(col)), r"[^\p{L}\p{N}]+"), "")


def word_shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """k-word shingles from a PRE-TOKENIZED array column.

    The shingling half of word_shingles, for callers that already hold a
    materialized token table (the span-dedup operators share one token
    pass across branches). ``toks`` should be a plain column reference —
    the expression is referenced k+2 times, so an inlined expensive
    expression would evaluate that many times per row.
    """
    n = F.size(toks)
    n_shingles = n - (k - 1)
    shifted = [F.slice(toks, i + 1, n_shingles) for i in range(k)]
    joined = shifted[0]
    for part in shifted[1:]:
        joined = F.zip_with(joined, part, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(n >= k, joined).otherwise(F.array().cast("array<string>"))


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """k-word shingles (array<string>) built from word_tokens.

    Built by zip_with-concatenating k pre-sliced shifted copies of the token
    array. CRITICAL perf property: the tokenization expression is referenced
    a constant number of times PER ROW. The naive formulation —
    transform(sequence(...), i -> array_join(slice(toks, i, k))) — inlines
    the whole tokenization inside the per-position lambda, and Spark's
    interpreted higher-order functions re-evaluate it at EVERY position:
    O(tokens^2) per document (observed 15x slowdown at 400-token docs).

    Returns an empty array for texts shorter than k words.
    """
    return word_shingles_from_tokens(word_tokens(col), k)


def char_ngrams(col: Column | str, n: int = 3, pre_normalized: bool = False) -> Column:
    """Character n-grams over the normalized text (array<string>).

    PERF: the per-position lambda below inlines whatever expression ``s``
    is and re-evaluates it at EVERY position (interpreted HOF semantics, see
    word_shingles). Callers MUST pass a *materialized column* (e.g.
    ``withColumn("_s", normalize_text(...))`` then ``char_ngrams("_s",
    pre_normalized=True)``) when the input is expression-heavy — otherwise a
    regexp_replace runs O(len) times per row (observed 30x slowdown).
    """
    s = _c(col) if pre_normalized else normalize_text(col)
    ln = F.length(s)
    return F.when(
        ln >= n,
        F.transform(
            F.sequence(F.lit(1), ln - (n - 1)),
            lambda i: s.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
