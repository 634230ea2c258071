"""Interchange-format round-trips: CSV and JSON-lines source/sink
paths proven lossless by hash against the parquet-direct oracle.

The reference reads parquet only (SURVEY §2.1); a drop-in engine needs
the text interchange formats every upstream system emits. Each entry
writes a typed extract to scratch in the format under test, reads it
back with an EXPLICIT schema (schema inference is a correctness
hazard, not a feature — a column of '123' strings infers as BIGINT and
corrupts the round-trip), and aggregates the re-read frame; the oracle
aggregates the original parquet directly, so any value mangled by
serialization (quoting, date formatting, nested encoding, NULL
spelling) hash-fails.

Float discipline: money is converted to integer cents BEFORE the text
write — doubles through decimal-string round-trips are the classic
silent-corruption path, so the engine's contract is: quantize first.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.registry import register
from ecom_churn_lakehouse_spark.sources import load_table

_EXTRACT_SQL = """
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS total_cents,
       CAST(MIN(CAST(o_orderdate AS DATE)) AS DATE) AS first_date,
       CAST(MAX(CAST(o_orderdate AS DATE)) AS DATE) AS last_date,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys
FROM orders
GROUP BY o_orderstatus
"""


def _extract(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
        F.col("o_orderstatus").alias("status"),
        F.to_date("o_orderdate").alias("order_date"),
    )


_READBACK_SCHEMA = (
    "order_key long, cents long, status string, order_date date"
)


def _summarize(df):
    return df.groupBy("status").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.min("order_date").alias("first_date"),
        F.max("order_date").alias("last_date"),
        F.countDistinct("order_key").cast("long").alias("n_keys"),
    )


@register(
    "csv_roundtrip_integrity",
    _EXTRACT_SQL,
    doc="CSV sink + source round-trip: typed orders extract -> "
    "header CSV at scratch -> read back with an explicit schema -> "
    "per-status aggregate hash-equal to the parquet-direct oracle. "
    "Proves quoting, date formatting, and integer fidelity through "
    "the text path; money is pre-quantized to cents because doubles "
    "through decimal strings are the silent-corruption classic. At "
    "scale the CSV read is splittable line-parallel and the "
    "explicit schema skips the inference pre-pass (a full extra "
    "scan).",
)
def q_csv_roundtrip_integrity(spark, sf_dir):
    from ecom_churn_lakehouse_spark.scratch import scratch_dir

    base = scratch_dir(prefix="fmt_csv_")
    _extract(spark, sf_dir).write.mode("overwrite").option(
        "header", True
    ).csv(f"{base}/orders_csv")
    back = (
        spark.read.schema(_READBACK_SCHEMA)
        .option("header", True)
        .csv(f"{base}/orders_csv")
    )
    return _summarize(back)


@register(
    "json_roundtrip_integrity",
    _EXTRACT_SQL,
    doc="JSON-lines sink + source round-trip, with the payload "
    "NESTED under a struct on the way out and flattened on the way "
    "back — the shape most event buses deliver. Read uses an "
    "explicit nested schema (no inference scan); the per-status "
    "aggregate must hash-equal the parquet-direct oracle, pinning "
    "nested encoding, date-string round-trip, and field-order "
    "independence of the JSON path.",
)
def q_json_roundtrip_integrity(spark, sf_dir):
    from ecom_churn_lakehouse_spark.scratch import scratch_dir

    base = scratch_dir(prefix="fmt_json_")
    nested = _extract(spark, sf_dir).select(
        F.col("order_key"),
        F.struct("cents", "status", "order_date").alias("payload"),
    )
    nested.write.mode("overwrite").json(f"{base}/orders_json")
    back = spark.read.schema(
        "order_key long, "
        "payload struct<cents: long, status: string, order_date: date>"
    ).json(f"{base}/orders_json")
    flat = back.select(
        "order_key",
        F.col("payload.cents").alias("cents"),
        F.col("payload.status").alias("status"),
        F.col("payload.order_date").alias("order_date"),
    )
    return _summarize(flat)


@register(
    "orc_roundtrip_integrity",
    _EXTRACT_SQL,
    doc="ORC sink + source round-trip: the same typed orders extract "
    "through Spark's built-in columnar ORC path (snappy, column "
    "statistics on by default), read back and aggregated to the same "
    "parquet-direct oracle. Completes the built-in format matrix "
    "(parquet/CSV/JSON/ORC); at scale ORC reads are stripe-parallel "
    "and predicate pushdown works off the stripe statistics exactly "
    "as parquet row groups do.",
)
def q_orc_roundtrip_integrity(spark, sf_dir):
    from ecom_churn_lakehouse_spark.scratch import scratch_dir

    base = scratch_dir(prefix="fmt_orc_")
    _extract(spark, sf_dir).write.mode("overwrite").orc(f"{base}/orders_orc")
    back = spark.read.orc(f"{base}/orders_orc")
    return _summarize(back)
