"""Semantic invariants for the advanced analytics shapes — properties
the DuckDB oracle's hash equality can't express, checked at sf0.001.
"""

from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.queries.advanced_queries import (
    q_cohort_retention,
    q_copurchase_part_pairs,
    q_hashed_feature_cross,
    q_session_first_touch,
    q_tfidf_top_terms,
    q_user_activity_zscore,
    q_weighted_order_sample,
)
from ecom_churn_lakehouse_spark.sources import load_events, load_table

SF = "/root/testdata/sf0.001"


def test_cohort_month_zero_is_cohort_size(spark):
    """Every cohort's months_since=0 count equals its cohort size, and
    retention never exceeds the cohort size at any later offset."""
    ret = q_cohort_retention(spark, SF).cache()
    base = ret.filter(F.col("months_since") == 0).select(
        "cohort_month", F.col("n_active").alias("n_cohort")
    )
    # every customer appears in their own cohort month
    joined = ret.join(base, "cohort_month")
    assert joined.filter(F.col("n_active") > F.col("n_cohort")).count() == 0
    n_customers = (
        load_table(spark, SF, "orders").select("o_custkey").distinct().count()
    )
    assert base.agg(F.sum("n_cohort")).collect()[0][0] == n_customers
    ret.unpersist()


def test_copurchase_pairs_canonical_and_supported(spark):
    rows = q_copurchase_part_pairs(spark, SF).collect()
    for r in rows:
        assert r.part_a < r.part_b
        assert r.n_orders >= 2


def test_zscore_flags_are_extreme(spark):
    """Flagged users deviate from their type's mean by >= 2 sigma."""
    cnt = (
        load_events(spark, SF)
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .toPandas()
    )
    flagged = q_user_activity_zscore(spark, SF).toPandas()
    for _, row in flagged.iterrows():
        grp = cnt[cnt.event_type == row.event_type].n
        mean, std = grp.mean(), grp.std(ddof=0)
        assert abs(row.n_events - mean) >= 2.0 * std * 0.999999


def test_tfidf_three_per_doc_rarest_wins_ties(spark):
    pdf = q_tfidf_top_terms(spark, SF).toPandas()
    per_doc = pdf.groupby("doc_id").size()
    assert per_doc.max() <= 3
    # score is monotone: tf up or df down -> score up
    assert (pdf.score > 0).all()


def test_weighted_sample_prefers_heavy_orders(spark):
    """Inclusion rate of the top price quartile must beat the bottom."""
    orders = load_table(spark, SF, "orders")
    kept = q_weighted_order_sample(spark, SF)
    q1, q3 = orders.approxQuantile("o_totalprice", [0.25, 0.75], 0.0)
    n_low = orders.filter(F.col("o_totalprice") <= q1).count()
    n_high = orders.filter(F.col("o_totalprice") >= q3).count()
    k_low = kept.filter(F.col("o_totalprice") <= q1).count()
    k_high = kept.filter(F.col("o_totalprice") >= q3).count()
    assert k_high / n_high > k_low / n_low


def test_first_touch_rates_and_totals(spark):
    pdf = q_session_first_touch(spark, SF).toPandas()
    assert ((pdf.conversion_rate >= 0) & (pdf.conversion_rate <= 1)).all()
    assert (pdf.n_converted <= pdf.n_sessions).all()
    # attributed revenue equals total purchase value (no double counting)
    total = (
        load_events(spark, SF)
        .filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.col("value").cast("decimal(18,2)")))
        .collect()[0][0]
    )
    assert abs(pdf.purchase_value.sum() - float(total)) < 1e-6


def test_feature_cross_bucket_space_is_bounded(spark):
    pdf = q_hashed_feature_cross(spark, SF).toPandas()
    assert pdf.feature_bucket.between(0, 255).all()
    # 5 segments x 5 priorities = 25 crosses, conserved across buckets
    assert pdf.n_crosses.sum() == 25
    n_orders = load_table(spark, SF, "orders").count()
    assert pdf.n_orders.sum() == n_orders
