"""SimHash near-duplicate detection (32-bit, engine-portable).

Per doc: token hash t = 32-bit md5-prefix integer; bit j of the
signature is set iff ``sum over tokens of (2*bit_j(t) - 1) >= 0``.
Near-dups are pairs at small Hamming distance; candidate generation
blocks on the 4 signature bytes (two docs within Hamming ≤ 6 of a
32-bit signature share at least one byte only heuristically — byte
blocking is the standard recall/cost trade; more/smaller blocks raise
recall).

Everything is integer arithmetic on md5 prefixes, so the DuckDB oracle
reproduces signatures bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["SIMHASH_BITS", "simhash_signatures", "simhash_candidate_pairs"]

SIMHASH_BITS = 32
NUM_BYTES = 4


def _token_hash(token):
    """32-bit portable token hash (md5 8-hex-digit prefix)."""
    return F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long")


def simhash_signatures(tokens: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash) — 32-bit signature per doc.

    Token hash projected once before the aggregate (one md5 per row,
    not one per bit expression).
    """
    hashed = tokens.select(id_col, _token_hash(F.col("token")).alias("__th"))
    th = F.col("__th")
    bit_sums = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(th, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    sig = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return bit_sums.select(id_col, sig.cast("long").alias("simhash"))


def simhash_candidate_pairs(
    signatures: DataFrame, max_hamming: int = 6, id_col: str = "doc_id"
) -> DataFrame:
    """Pairs (doc_a < doc_b) sharing ≥1 signature byte with Hamming ≤ k.

    Dedup across blocks is ROW-LOCAL: a pair that collides on several
    bytes is kept only where the joined byte_idx equals the pair's
    SMALLEST matching byte index — computable from the two signatures
    alone, so no ``distinct`` exchange over the candidate fan-out.
    (The previous spelling deduped 4-way collisions with a distinct
    over the full candidate set; on this fixture's low-entropy
    signatures that was a multi-million-row shuffle concentrated on a
    few hot (byte_idx, byte_val) cells.)
    """
    bytes_arr = F.array(
        *[
            F.struct(
                F.lit(j).alias("byte_idx"),
                F.shiftright(F.col("simhash"), 8 * j)
                .bitwiseAND(F.lit(255))
                .alias("byte_val"),
            )
            for j in range(NUM_BYTES)
        ]
    )
    blocked = signatures.select(id_col, "simhash", F.explode(bytes_arr).alias("b")).select(
        id_col, "simhash", F.col("b.byte_idx").alias("byte_idx"), F.col("b.byte_val").alias("byte_val")
    )
    a = blocked.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sim_a"), "byte_idx", "byte_val"
    )
    b = blocked.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sim_b"), "byte_idx", "byte_val"
    )

    def _byte(col, j):
        return F.shiftright(F.col(col), 8 * j).bitwiseAND(F.lit(255))

    first_match = F.lit(NUM_BYTES - 1)
    for j in range(NUM_BYTES - 2, -1, -1):
        first_match = F.when(
            _byte("sim_a", j) == _byte("sim_b", j), F.lit(j)
        ).otherwise(first_match)
    return (
        a.join(b, on=["byte_idx", "byte_val"])
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("byte_idx") == first_match)
        )
        .withColumn(
            "hamming",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
