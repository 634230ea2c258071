"""Bucketed tables: co-located, shuffle-free joins (SURVEY §7 scale note).

At 100 TB the dominant recurring cost of fact⋈fact joins is the
shuffle. Writing both sides bucketed (and sorted) by the join key lets
Spark plan a SortMergeJoin with NO Exchange on either side — the
bucket layout IS the partitioning. The helpers here wrap
``bucketBy``/``sortBy`` writes (catalog-backed, as Spark requires) and
a reader; tests assert the exchange-free plan shape.

Usage pattern for a recurring pipeline: land bronze/silver once
bucketed by the downstream join key (order/customer id); every
subsequent per-as-of gold build then aggregates and joins without
reshuffling the fact table.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed_table", "read_table", "is_exchange_free_join"]


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_keys: list[str],
    num_buckets: int,
    sort_keys: list[str] | None = None,
) -> None:
    """Save as a bucketed (+sorted) catalog table, overwriting.

    Robust to stale state: drops any same-named catalog entry AND a
    leftover warehouse directory from a previous session (the
    in-memory catalog forgets tables on restart but their managed
    locations persist, and saveAsTable refuses to reuse them).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table_name.lower())
    if os.path.exists(loc):
        shutil.rmtree(loc, ignore_errors=True)
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_keys)
    )
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def is_exchange_free_join(joined: DataFrame) -> bool:
    """True when the join plan contains no shuffle Exchange — the
    bucketed-layout goal. (BroadcastExchange doesn't count; it's not
    a shuffle.)"""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan
