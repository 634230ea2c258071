"""Tokenization and word n-gram shingling as native expressions.

The shingle relation ``(doc_id, shingle)`` is the foundation of both
MinHash/LSH and n-gram Jaccard dedup. Explode + distinct is one
shuffle; at 100 TB the downstream LSH banding keeps all pair
generation bucket-local, so nothing here is quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["doc_tokens", "doc_shingles", "doc_shingle_arrays"]


def doc_tokens(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct (doc_id, token) pairs — whitespace tokenizer."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return (
        corpus.select(id_col, F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
    )


def doc_shingles(
    corpus: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct (doc_id, shingle) pairs — word ``n``-gram shingles.

    Docs with fewer than ``n`` tokens produce no shingles (sequence
    guard avoids Spark's descending-sequence surprise when
    ``size - n < 0``).
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    with_toks = corpus.select(id_col, toks.alias("__toks")).filter(
        F.size("__toks") >= n
    )
    idx = F.sequence(F.lit(1), F.size("__toks") - (n - 1))
    # slice + array_join, not an element_at chain: one subarray copy per
    # shingle instead of n indexed lookups — measured 5x faster at n=8.
    shingle = F.transform(idx, lambda i: F.array_join(F.slice("__toks", i, n), " "))
    return (
        with_toks.select(id_col, F.explode(shingle).alias("shingle"))
        .distinct()
    )


def doc_shingle_arrays(
    corpus: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct shingles per doc as ONE array column — zero shuffle.

    The exploded relation (:func:`doc_shingles`) pays an explode +
    distinct shuffle before anything else can run; this variant keeps
    each doc's shingle set scan-local (``array_distinct`` dedups within
    the row), which lets MinHash signatures be computed with no
    exchange at all. Same sets, different physical shape.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    with_toks = corpus.select(id_col, toks.alias("__toks")).filter(
        F.size("__toks") >= n
    )
    idx = F.sequence(F.lit(1), F.size("__toks") - (n - 1))
    shingle = F.transform(idx, lambda i: F.array_join(F.slice("__toks", i, n), " "))
    return with_toks.select(id_col, F.array_distinct(shingle).alias("shingles"))
