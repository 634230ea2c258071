"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over :mod:`ecom_churn_lakehouse_spark.registry` — the
package owns the query inventory; this module exposes the three
driver hooks (``entry``, ``queries``, ``oracle_sql``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ecom_churn_lakehouse_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (point-in-time customer feature snapshot,
    SURVEY.md §7.1) on /root/testdata/sf0.001."""
    fn = registry.queries()["customer_features"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
