"""SQL front-end: register the fixture tables as temp views and run
SQL strings against them.

The reference is pure DataFrame API (zero SQL strings — SURVEY §1
verified by grep), but a reusable engine should expose BOTH fronts:
everything the registry does with the DataFrame API is equally
reachable through ``spark.sql`` once the tables are cataloged. The
views carry the same normalization as the programmatic loaders
(``load_events`` for the ns-timestamp handling), so the two fronts
see identical data.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession

from ecom_churn_lakehouse_spark.sources.tables import TABLES, load_events, load_table

__all__ = ["register_tables", "run_sql"]


# (session id, sf_dir) pairs whose views are already registered —
# re-registering all 10 views on EVERY run_sql call cost a measurable
# constant (~0.5 s per query in BENCH_r04: sql_pricing_summary 1.95 s
# vs 1.30 s for its DataFrame twin with an identical Catalyst plan).
# Keyed on the session OBJECT via weakref so a new session (new
# temp-view namespace) re-registers even if CPython reuses a dead
# session's id(); a different sf_dir in the same session re-registers
# and takes over the view names (last writer wins, matching the old
# behavior). A dead session's entry is dropped automatically, so it
# can never alias a freshly created one (ADVICE r5).
_REGISTERED: "weakref.WeakKeyDictionary[SparkSession, str]" = (
    weakref.WeakKeyDictionary()
)


def register_tables(
    spark: SparkSession, sf_dir: str, force: bool = False
) -> list[str]:
    """Register every fixture table as a temp view; returns the names.

    Idempotent per (session, sf_dir): repeated calls are a dict probe,
    not ten plan-analysis round-trips.
    """
    if not force and _REGISTERED.get(spark) == sf_dir:
        return list(TABLES)
    names = []
    for name in TABLES:
        df = (
            load_events(spark, sf_dir)
            if name == "events"
            else load_table(spark, sf_dir, name)
        )
        df.createOrReplaceTempView(name)
        names.append(name)
    _REGISTERED[spark] = sf_dir
    return names


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Catalog the fixture tables, then evaluate one SQL string —
    the engine's SQL front door. Catalyst sees the same logical plan
    space as the DataFrame front, so pushdown/pruning/AQE behave
    identically."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
