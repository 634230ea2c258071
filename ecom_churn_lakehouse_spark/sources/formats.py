"""Multi-format batch sources/sinks (engine breadth beyond the
reference's parquet+Delta surface).

One reader/writer pair covering parquet, csv, json, and orc with the
engine's conventions: explicit schemas for text formats (inference is
a full extra pass at 100 TB — never rely on it in pipelines), and
format-appropriate defaults (csv headers, compressed json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "read_source",
    "write_sink",
    "read_binary_files",
    "SUPPORTED_FORMATS",
]

SUPPORTED_FORMATS = ("parquet", "csv", "json", "orc")


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Batch scan of any supported format.

    Text formats (csv/json) REQUIRE a schema — schema inference reads
    the data twice and types drift between runs; pipelines must pin
    the contract schema instead (contracts.py compiles one).
    """
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED_FORMATS}")
    if fmt in ("csv", "json") and schema is None:
        raise ValueError(f"{fmt} sources require an explicit schema")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).load(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Raw-file scan via Spark's ``binaryFile`` source — the ingestion
    half of the multimodal surface (multimodal/decode.py consumes the
    ``content`` column).

    Yields ``(path, modificationTime, length, content)`` per file with
    one file per row; Spark parallelizes by file, so a 100 TB image
    corpus scans with full cluster width as long as the object store
    layout avoids giant single files. Pair with ``glob`` (e.g.
    ``*.jpg``) so pruning happens at file listing, before any bytes
    move.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED_FORMATS}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).save(path)
