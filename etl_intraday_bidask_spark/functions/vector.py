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
