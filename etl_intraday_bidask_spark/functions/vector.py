"""Vector math over ``ArrayType`` embedding columns — pure higher-order
SQL functions (JVM-side, no Python boundary).

All arithmetic is done in DOUBLE regardless of the storage type (the
fixtures store float32): casting first makes the math bit-compatible
with a DuckDB oracle that applies the same casts, and keeps accumulated
error far below the 4-dp rounding grid.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def as_double(vec: Column | str) -> Column:
    return F.col(vec).cast("array<double>") if isinstance(vec, str) else vec.cast(
        "array<double>"
    )


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns via zip_with + aggregate."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns."""
    return dot(a, b) / (norm(a) * norm(b))


def quantized(vec: Column | str, scale: int) -> Column:
    """Exact integer-grid form of an embedding: round(x * scale) as
    BIGINT per component.

    DuckDB pair: ``list_transform(embedding, v -> CAST(round(CAST(v AS
    DOUBLE) * {scale}) AS BIGINT))``. On the grid, dots and norms are
    exact int64 sums — cross-engine float-sum ordering never arises
    (the embed/knn family's determinism device).
    """
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(
        c, lambda v: F.round(v.cast("double") * float(scale)).cast("long")
    )


def int_dot(a: Column | str, b: Column | str) -> Column:
    """Exact int64 dot product of two quantized (BIGINT) vectors."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def int_norm2(a: Column | str) -> Column:
    """Exact int64 squared norm of a quantized (BIGINT) vector."""
    ca = F.col(a) if isinstance(a, str) else a
    return F.aggregate(
        ca, F.lit(0).cast("long"), lambda acc, x: acc + x * x
    )
