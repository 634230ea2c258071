"""Partitioning-independence: the float-discipline contract.

The engine claims its numeric outputs are BIT-IDENTICAL regardless of
partitioning (decimal accumulation, exact moments, rational squashes
— README 'Exact, order-independent numerics'). At 100 TB that is the
difference between a reproducible pipeline and one whose metrics
drift with cluster size. This test executes a sample of float-heavy
entries under different shuffle widths and asserts byte-equal rows.
"""

import pytest

from ecom_churn_lakehouse_spark.registry import queries

SF = "/root/testdata/sf0.001"

#: float-heavy entries whose aggregates must not depend on partial
#: aggregation order
ENTRIES = [
    "pricing_summary",
    "customer_features",
    "corpus_curation",
    "cuped_adjusted_spend",
    "unigram_lm_doc_scores",
    "hourly_value_interpolated",
    "order_value_psi_drift",
    "discount_quantity_regression",
    "model_eval_metrics",
    # round-5 exact-integer surfaces: ppm/micros floor arithmetic must
    # be partition-invariant by construction — prove it anyway
    "churn_hazard_table",
    "event_value_twap",
    "embedding_power_iteration",
    "isotonic_calibration",
    "cross_source_neardup_matrix",
]


def _rows(spark, name):
    return sorted(map(tuple, queries()[name](spark, SF).collect()))


@pytest.mark.parametrize("name", ENTRIES)
def test_result_identical_across_shuffle_widths(spark, name):
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        narrow = _rows(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        wide = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert narrow == wide, f"{name}: results depend on shuffle width"
