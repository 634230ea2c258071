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

__all__ = [
    "to_double_array",
    "dot",
    "l2_norm",
    "cosine_similarity",
    "dot_fixed",
    "l2_norm_fixed",
    "cosine_fixed",
]


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


# --------------------------------------------------------------------
# Fixed-dimension flat spellings (r12 optimization round).
#
# The HOF spellings above are interpreted per row — lambdas defeat
# whole-stage codegen, and the optimization-guide §4.1 measurement
# showed them dominating every exact-rerank stage (3 aggregates ×
# 64 lambda steps × |candidate pairs|). When the dimension is
# statically known (the 64-dim embedding fixture, Matryoshka
# prefixes), the same arithmetic spelled as a flat expression tree
# code-generates. Bit-identity: the fold order is EXACTLY the HOF
# fold — acc starts at 0.0 and accumulates left-to-right in element
# order — so every IEEE intermediate equals the ``aggregate``
# spelling's and results stay bit-equal to the DuckDB oracle.
# Elements are cast to double individually (same widening as
# ``to_double_array`` + multiply, without materializing the
# intermediate array per row).
# --------------------------------------------------------------------


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    acc = F.lit(0.0)
    for i in range(1, dim + 1):
        acc = acc + (
            F.element_at(a, i).cast("double")
            * F.element_at(b, i).cast("double")
        )
    return acc


def l2_norm_fixed(v: Column, dim: int) -> Column:
    return F.sqrt(dot_fixed(v, v, dim))


def cosine_fixed(a: Column, b: Column, dim: int) -> Column:
    """Flat codegen twin of :func:`cosine_similarity` for
    statically-known dimension; accepts float or double arrays."""
    return dot_fixed(a, b, dim) / (
        l2_norm_fixed(a, dim) * l2_norm_fixed(b, dim)
    )
