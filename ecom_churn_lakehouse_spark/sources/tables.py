"""Batch sources over the harness's parquet star schema.

Covers SURVEY.md §2.1 S1 (parquet batch scan, schema from footers,
``/root/reference/src/ingestion/orders_to_bronze.py:218``) and the
projection discipline of §4 (early narrow selects so Catalyst prunes
columns down to the parquet reader).

At 100 TB these scans are the dominant cost; everything here is lazy
and declarative so predicate pushdown / partition pruning / column
pruning happen inside the scan node, not after it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Every table the harness materializes (TESTDATA.md / FIXTURES.md §2).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet batch scan; schema comes from the parquet footers (S1)."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def event_ts_column(ts_dtype: str) -> F.Column:
    """Normalize the fixture's ``ts`` to a session-tz TIMESTAMP.

    The fixture has shipped two physical encodings: parquet INT64
    TIMESTAMP(NANOS), which Spark 4 only reads as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and we truncate to
    microseconds with integer division (``div`` — float division would
    lose precision above 2^53 ns); and native TIMESTAMP(MICROS)
    (NTZ under parquet ``isAdjustedToUTC=false``), which we cast to
    TIMESTAMP — value-preserving because the session tz is pinned UTC
    (session.py). Both match DuckDB's reading bit-for-bit at sf0.01.
    """
    if ts_dtype == "bigint":
        return F.timestamp_micros(F.expr("ts div 1000"))
    return F.col("ts").cast("timestamp")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events scan, schema-adaptive over the fixture's ts encodings."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.select(
        "event_id",
        event_ts_column(dict(raw.dtypes)["ts"]).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def normalized_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The churn domain's canonical orders frame.

    Maps the TPC-H-ish fixture onto the reference's silver-orders shape
    (SURVEY.md §7.0): ``o_custkey``→customer_id, ``o_orderkey``→order_id,
    ``to_date(o_orderdate)``→order_date, ``o_orderstatus``→order_status.
    Early narrow select → Catalyst prunes the scan to 4 columns.
    """
    return load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderkey").alias("order_id"),
        F.to_date("o_orderdate").alias("order_date"),
        F.col("o_orderstatus").alias("order_status"),
    )
