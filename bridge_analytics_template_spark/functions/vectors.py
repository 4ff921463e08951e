"""Vector expressions over ``array<float>`` embedding columns.

Dot products and norms are sequential higher-order folds
(``aggregate(zip_with(...))``) — JVM-side, codegen'd, deterministic element
order — so similarity search never leaves the executor or touches Python.
Float inputs are widened to double element-wise before any arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two (double-element) vectors."""
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(vec: Column, n_bits: int = 8) -> Column:
    """Coordinate-hyperplane LSH bucket: the sign pattern of the first
    ``n_bits`` dimensions packed into a long. Vectors with high cosine agree
    on most signs, so bucketing on it prunes the candidate space of a
    similarity join from O(n²) to per-bucket blocks."""
    bits = [
        F.when(F.element_at(vec, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(n_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")
