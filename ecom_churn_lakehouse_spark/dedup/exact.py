"""Exact deduplication: hash-groupBy on a content fingerprint.

The scalable baseline (SURVEY §7.7): one sha256 per row (codegen), one
hash aggregation on the digest. At 100 TB the digest groupBy is the
only shuffle, and the digest is uniformly distributed — no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["exact_duplicate_groups"]


def exact_duplicate_groups(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical documents.

    Returns ``(content_sha256, canonical_doc_id, n_copies)`` for every
    group with more than one member; ``canonical_doc_id`` is the
    minimum id (deterministic survivor pick, mirroring the reference's
    deterministic dedup discipline, orders_bronze_to_silver.py:79-90).
    """
    return (
        corpus.select(F.sha2(F.col(text_col), 256).alias("content_sha256"), id_col)
        .groupBy("content_sha256")
        .agg(
            F.min(id_col).alias("canonical_doc_id"),
            F.count("*").alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )
