"""Vector column expressions over ``array<float>`` embeddings.

Native expressions only (``zip_with`` + ``aggregate``): the arithmetic
runs JVM-side inside codegen, Arrow never ships rows to Python. The
accumulation is sequential in element order, which makes results
bit-reproducible across partitionings — and bit-comparable to the
DuckDB oracle's list functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["to_double_array", "dot", "l2_norm", "cosine_similarity"]


def to_double_array(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column) -> Column:
    return F.sqrt(dot(v, v))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays (callers cast first via
    ``to_double_array`` so float→double widening matches the oracle)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
