"""Vector math over array<float|double> columns — pure built-in expressions.

No UDFs: ``zip_with`` + ``aggregate`` compile to Catalyst expressions and run
inside whole-stage codegen, so similarity math scales with the scan instead
of bottlenecking on Python. (A Pandas-UDF variant exists in
operators/similarity.py for the batched top-k path where Arrow + numpy BLAS
wins.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Sum of elementwise products, computed JVM-side."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_c(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe on zero norms (returns NULL)."""
    num = dot_product(a, b)
    den = l2_norm(a) * l2_norm(b)
    return F.when(den != 0, num / den)
