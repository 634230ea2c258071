"""Deterministic sampling, splitting, and class balancing.

Training-data pipelines need *reproducible* row selection — the split a
row lands in must depend only on its key, never on partitioning, task
order, or RNG state. ``df.sample()`` gives none of that. These
operators use hash-based assignment instead:

    bucket(key) = int(md5(salt || key)[0:15 hex]) mod 10_000

which is

- stable across runs, partitionings, and cluster sizes,
- stable under data growth (a customer stays in 'train' when new rows
  arrive — the property feature-store splits need),
- engine-portable (the same md5-prefix idiom the dedup sketches use),
  which is what lets the DuckDB oracle verify assignments bit-for-bit.

Scale: bucket assignment is a narrow projection + filter — no shuffle,
no sort, pushdown-unaffected; at 100 TB a split/sample costs exactly
one scan. The only shuffled op here is exact class rebalancing, whose
per-class window is documented (and bounded) below.

The reference has no sampling surface (SURVEY §2 — absent); this is
extension surface per §7.7.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "HASH_MOD",
    "hash_bucket",
    "assign_split",
    "stratified_sample",
    "balance_classes",
]

#: Bucket granularity — fractions resolve to 1/10_000.
HASH_MOD = 10_000


def hash_bucket(key: Column, salt: str, mod: int = HASH_MOD) -> Column:
    """Uniform deterministic bucket in [0, ``mod``) from a key column."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        % mod
    )


def hash_bucket_sql(key: str, salt: str, mod: int = HASH_MOD) -> str:
    """The DuckDB-SQL twin of :func:`hash_bucket` — the ONE place the
    portable md5-prefix bucket idiom is spelled for oracles. Every
    split/fold/sample oracle must use this so a change to the idiom
    (prefix width, modulus) cannot silently desynchronize the Spark
    and SQL sides."""
    return (
        f"CAST(('0x' || substring(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) % {mod}"
    )


def assign_split(
    df: DataFrame,
    key_col: str,
    splits: list[tuple[str, float]],
    salt: str = "split:",
    out_col: str = "split",
) -> DataFrame:
    """Add a split label ('train'/'val'/'test'/...) keyed on ``key_col``.

    ``splits`` is an ordered list of (name, fraction); fractions must
    sum to 1. Assignment is a pure projection — every row with the same
    key gets the same label, on any cluster, forever.
    """
    total = sum(f for _, f in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    hb = hash_bucket(F.col(key_col), salt)
    expr = None
    cum = 0.0
    for name, frac in splits[:-1]:
        cum += frac
        cond = hb < int(round(cum * HASH_MOD))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "sample:",
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows.

    Curation shape: oversample rare/valuable strata, thin the noisy
    ones. Compiles to one when/otherwise threshold over the hash
    bucket — a scan-local filter, no shuffle at any scale.
    """
    hb = hash_bucket(F.col(key_col), salt)
    thresh = None
    for value, frac in sorted(fractions.items()):
        t = F.lit(int(round(frac * HASH_MOD)))
        cond = F.col(strata_col) == value
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    default_t = F.lit(int(round(default_fraction * HASH_MOD)))
    thresh = default_t if thresh is None else thresh.otherwise(default_t)
    return df.filter(hb < thresh)


def balance_classes(
    df: DataFrame,
    key_col: str,
    label_col: str,
    salt: str = "balance:",
    exact: bool = True,
) -> DataFrame:
    """Downsample every class to the minority-class size, deterministically.

    ``exact=True``: rank rows inside each class by (bucket, key) and
    keep the first ``min_count`` — class counts come out exactly equal.
    The window partitions by ``label_col``, so each class is one task:
    fine for the label side of a training set (few classes × modest
    rows after feature aggregation), wrong for a 100 TB raw fact table.

    ``exact=False`` is the scale path: keep rows where
    ``bucket * class_count < min_count * HASH_MOD`` — a broadcast join
    of per-class counts (|classes| rows) plus a scan-local filter. No
    window, no per-class task; counts land within ~class_count/HASH_MOD
    of equal. Both variants are deterministic and oracle-verifiable.

    ``min_count`` travels as a broadcast 1-row frame (no driver
    collect), same discipline as the churn label bounds.
    """
    counts = df.groupBy(label_col).agg(F.count("*").alias("__cls_cnt"))
    min_cnt = counts.agg(F.min("__cls_cnt").alias("__min_cnt"))
    hb = hash_bucket(F.col(key_col), salt)
    if exact:
        w = Window.partitionBy(label_col).orderBy(hb.asc(), F.col(key_col).asc())
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .join(F.broadcast(min_cnt))
            .filter(F.col("__rn") <= F.col("__min_cnt"))
            .drop("__rn", "__min_cnt")
        )
    return (
        df.join(F.broadcast(counts), on=label_col)
        .join(F.broadcast(min_cnt))
        .filter(hb * F.col("__cls_cnt") < F.col("__min_cnt") * HASH_MOD)
        .drop("__cls_cnt", "__min_cnt")
    )
