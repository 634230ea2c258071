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
    distinct: bool = True,
) -> DataFrame:
    """Distinct (doc_id, shingle) pairs — word ``n``-gram shingles.

    Docs with fewer than ``n`` tokens produce no shingles (sequence
    guard avoids Spark's descending-sequence surprise when
    ``size - n < 0``).

    Plan shape matters here: the explode runs over the CHEAP index
    sequence ``1..size-n+1`` and each shingle string is built AFTER the
    Generate (one slice+array_join per output row). Exploding a
    pre-built shingle array instead fuses the whole transform
    expression into the Generate node, where Spark re-evaluates it
    per output element — measured 7x slower at n=8 on the fixture
    corpus (2.9 s -> 0.4 s for the exploded train-side relation).
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    with_toks = corpus.select(id_col, toks.alias("__toks")).filter(
        F.size("__toks") >= n
    )
    idx = F.sequence(F.lit(1), F.size("__toks") - (n - 1))
    exploded = with_toks.select(
        id_col, "__toks", F.explode(idx).alias("__i")
    )
    shingle = F.array_join(F.slice("__toks", F.col("__i"), n), " ")
    out = exploded.select(id_col, shingle.alias("shingle"))
    # distinct=False skips the dedup exchange for consumers that dedup
    # downstream anyway (e.g. a contamination probe that only keeps
    # DISTINCT doc_id after the join).
    return out.distinct() if distinct else out


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
