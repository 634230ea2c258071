"""Deterministic sharded export — the training-data write path.

A training corpus leaves the lakehouse as N shards that downstream
loaders stream independently. Two properties matter and both are
guaranteed here:

- **Deterministic membership**: a row's shard derives from a portable
  md5 hash of its key columns — NOT from Spark's partitioning — so
  re-running the export (any cluster size, any input order) produces
  identical shard contents. Replayable, diffable, resumable.
- **Bounded shard count**: one output file per shard (repartition by
  the shard id before a partitioned write), so the loader sees exactly
  ``n_shards`` streams.

Scale posture: the shard id is a scan-local expression; the only
shuffle is the repartition to shard-aligned writers — the same single
shuffle any sharded write needs. Skewed keys can't skew shards (md5
is uniform); shard size tracks row count / n_shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["shard_column", "write_training_shards"]


def shard_column(key_cols: list[str], n_shards: int):
    """Portable shard id in [0, n_shards): md5 over the concatenated
    key columns (the repo's engine-portable hash discipline — any
    engine can recompute membership)."""
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    return (
        F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
        % n_shards
    ).cast("int")


def write_training_shards(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    n_shards: int,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as ``n_shards`` deterministic shards under
    ``path/shard=K/``; one file per shard. ``fmt``: parquet or json
    (json = the JSONL layout LLM data loaders consume)."""
    if fmt not in ("parquet", "json"):
        raise ValueError(f"fmt must be parquet|json, got {fmt!r}")
    sharded = df.withColumn("shard", shard_column(key_cols, n_shards))
    (
        sharded.repartition(n_shards, F.col("shard"))
        .write.partitionBy("shard")
        .mode("overwrite")
        .format(fmt)
        .save(path)
    )
