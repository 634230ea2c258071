"""Slowly-changing-dimension type-2 build from an event stream.

Gaps-and-islands run detection (change flag → running-sum version id)
followed by interval stitching (LEAD of the next run's start). Every
window and the run aggregate share the one dimension-key partition, so
the whole build is a SINGLE shuffle on the key at any scale — and
because each key's history is independent, the build is per-key
decomposable, which is what makes incremental maintenance exact
(``pipelines/scd2.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["scd2_build"]


def scd2_build(
    events: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """SCD2 intervals for ``attr_col`` per ``key_col``.

    ``events`` rows are observations ordered by (``ts_col``,
    ``tiebreak_col``) within each key. Output: one row per
    constant-attribute run with ``version`` (dense from 1),
    ``valid_from`` / ``valid_to`` (valid_to NULL on the open run),
    ``n_events`` in the run, and ``is_current``.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    runs = events.withColumn(
        "__chg",
        F.when(
            ~F.lag(attr_col).over(w).eqNullSafe(F.col(attr_col)), 1
        ).otherwise(0),
    ).withColumn(
        "version",
        F.sum("__chg")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int"),
    )
    islands = runs.groupBy(key_col, "version", attr_col).agg(
        F.min(ts_col).alias("valid_from"),
        F.count("*").cast("long").alias("n_events"),
    )
    wv = Window.partitionBy(key_col).orderBy("version")
    return islands.select(
        key_col,
        "version",
        attr_col,
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "n_events",
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
    )
