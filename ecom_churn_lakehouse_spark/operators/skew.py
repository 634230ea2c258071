"""Skew-mitigation operators for hot keys at scale (SURVEY §7.7 notes).

AQE's skew-join splitting handles moderate skew automatically
(session.py turns it on); these operators are the explicit tools for
pathological cases — a handful of keys holding a double-digit share of
a 100 TB fact table:

- ``salted_join``: spread a hot LEFT key across ``salt_n`` composite
  keys; replicate the (medium-sized) right side per salt. Output is
  exactly the plain join's; the salt values only affect placement,
  never the result.
- ``salted_count_distinct``: two-phase distinct count — per-(key,
  value-hash-salt) partial dedup, then final count per key. Plain
  ``count_distinct`` must co-locate every distinct value of a hot key
  on one task; the salted form bounds any task at ~1/salt_n of it.

Both are pure DataFrame compositions — no custom shuffles, no RDDs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "salted_count_distinct"]

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side salted and the right side replicated.

    Correct for ``inner`` and ``left`` joins (each left row carries one
    salt; the matching right copy exists for every salt). The left
    salt is pseudorandom per row — its distribution affects balance
    only, never correctness.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    l_salted = left.withColumn(
        _SALT, F.floor(F.rand(seed=42) * salt_n).cast("int")
    )
    r_replicated = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)).cast("array<int>"))
    )
    return l_salted.join(r_replicated, on=[*on, _SALT], how=how).drop(_SALT)


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    value: str | Column,
    alias: str = "n_distinct",
    salt_n: int = 64,
) -> DataFrame:
    """count_distinct(value) per key without co-locating hot keys.

    Phase 1 dedups (key, value) within (key, value-hash mod salt_n)
    buckets — each bucket is an independent slice of the value space,
    so bucket-level distinct counts sum exactly. Phase 2 sums per key.
    """
    v = F.col(value) if isinstance(value, str) else value
    bucket = F.pmod(F.xxhash64(v), F.lit(salt_n))
    partial = (
        df.select(*keys, v.alias("__v"), bucket.alias(_SALT))
        .groupBy(*keys, _SALT)
        .agg(F.count_distinct("__v").alias("__partial"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("__partial").cast("long").alias(alias)
    )
