"""Gap-based sessionization — batch form (SURVEY.md §2.9 extension).

Assigns a per-user session ordinal: a new session starts when the gap
to the previous event exceeds ``gap``. This is the batch equivalent of
Structured Streaming's ``session_window``; the streaming form lives in
:mod:`ecom_churn_lakehouse_spark.streaming`.

Scale: one shuffle on the user key; both window passes share the same
partitioning so Catalyst plans a single exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["sessionize"]


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    id_col: str = "event_id",
) -> DataFrame:
    """Add a ``session_id`` column (1-based per-user ordinal)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap_us = gap_minutes * 60 * 1_000_000  # µs precision, not seconds
    prev = F.lag(ts_col).over(w)
    new_session = F.when(
        prev.isNull() | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev) > gap_us),
        1,
    ).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("__new", new_session).withColumn(
        "session_id", F.sum("__new").over(run).cast("int")
    ).drop("__new")
