"""Prefix-filtered set-similarity join (PPJoin-style, lossless).

For a Jaccard threshold ``t``, two shingle sets A, B with
``J(A,B) >= t`` must overlap by at least ``ceil(t * max(|A|,|B|))``
elements, so — with all sets sorted by one global token order — their
*prefixes* of length ``|X| - ceil(t*|X|) + 1`` are guaranteed to
intersect (Xiao, Wang, Lin, Yu: "Efficient Similarity Joins for Near
Duplicate Detection", WWW'08; same principle as the reference's
near-dup pass, re-expressed relationally).

Why this is the scale path: the naive candidate join pairs every two
docs sharing ANY shingle — hot shingles ("the quick brown") produce
quadratic bucket blowups. The global order here is ascending document
frequency, so prefixes hold each doc's RAREST shingles and the
candidate equi-join only ever touches cold keys. Length filtering
(``min >= t * max``) prunes further. Both filters are conservative:
no true pair is dropped, so downstream exact verification returns
exactly the same result as the exhaustive join — which is how the
DuckDB oracle checks this operator.

Everything is native DataFrame ops: two shuffles (frequency join on
``shingle``, per-doc window) before the candidate join, map-side
arithmetic elsewhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["prefix_filter_candidates"]


def prefix_filter_candidates(
    shingled: DataFrame, threshold: float, id_col: str = "doc_id"
) -> DataFrame:
    """Candidate pairs (doc_a < doc_b) that can possibly reach
    ``J >= threshold`` — a superset of the true pairs, never missing one.

    ``shingled``: distinct (id, shingle) rows.
    """
    freq = shingled.groupBy("shingle").agg(F.count("*").alias("__cnt"))
    w_doc = Window.partitionBy(id_col)
    ranked = (
        shingled.join(freq, on="shingle")
        .select(
            F.col(id_col),
            "shingle",
            F.row_number()
            .over(w_doc.orderBy("__cnt", "shingle"))
            .alias("__pos"),
            F.count("*").over(w_doc).alias("__n"),
        )
    )
    prefix = ranked.filter(
        F.col("__pos")
        <= F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n")) + 1
    )
    a = prefix.select(
        F.col(id_col).alias("doc_a"), "shingle", F.col("__n").alias("__na")
    )
    b = prefix.select(
        F.col(id_col).alias("doc_b"), "shingle", F.col("__n").alias("__nb")
    )
    return (
        a.join(b, on="shingle")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("__nb") >= threshold * F.col("__na"))
            & (F.col("__na") >= threshold * F.col("__nb"))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
