"""Window-function operators (SURVEY.md §2.5 W1/W2/O4).

Generalizations of the reference's two signature window patterns:
- W1 deterministic dedup top-1 per key
  (``orders_bronze_to_silver.py:79-90``)
- W2 latest-snapshot-per-key argmax (``build_latest_features.py:112-122``)
- O4 general per-group top-k (the reference only has k=1)

Scale note: ``row_number`` over ``partitionBy(key)`` is one shuffle on
the key. For 100 TB inputs where only the winner is needed, Spark's
physical plan applies partial top-k (``WindowGroupLimit``) before the
exchange when the filter is ``rn <= k``, so the shuffle moves at most
k rows per key per map partition — keep the ``rn`` filter directly on
top of the window for that to kick in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["dedup_top1", "latest_per_key", "topk_per_group"]

_RN = "__rn"


def topk_per_group(
    df: DataFrame, keys: list[str], order_by: list[Column], k: int
) -> DataFrame:
    """Keep the top-``k`` rows per key group under ``order_by``.

    ``order_by`` must be a deterministic total order within each group
    (append a unique id column as final tie-break — the reference's
    4-level tie-break discipline, orders_bronze_to_silver.py:79-84).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) <= k)
        .drop(_RN)
    )


def dedup_top1(
    df: DataFrame, keys: list[str], order_by: list[Column]
) -> DataFrame:
    """W1: deterministic dedup — the single winning row per key."""
    return topk_per_group(df, keys, order_by, 1)


def latest_per_key(
    df: DataFrame, keys: list[str], ts_order: list[Column]
) -> DataFrame:
    """W2: argmax-per-key (newest row under ``ts_order`` descending)."""
    return topk_per_group(df, keys, ts_order, 1)
