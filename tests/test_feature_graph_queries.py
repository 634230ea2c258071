"""Invariant tests for the feature/graph/search query families —
properties the DuckDB oracle can't express (it only proves Spark and
DuckDB agree; these prove the shared semantics are the INTENDED ones).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.queries.feature_queries import (
    q_churn_feature_correlation,
    q_decayed_customer_spend,
    q_event_type_transitions,
    q_segment_churn_encoding,
)
from ecom_churn_lakehouse_spark.queries.graph_queries import (
    _PR_SCALE,
    q_copurchase_pagerank,
)
from ecom_churn_lakehouse_spark.queries.search_queries import q_doc_bm25_scores
from ecom_churn_lakehouse_spark.registry import AS_OF
from ecom_churn_lakehouse_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_transition_probs_are_row_stochastic(spark):
    rows = q_event_type_transitions(spark, SF).collect()
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r["from_type"]] = by_from.get(r["from_type"], 0.0) + r["transition_prob"]
        assert 0.0 < r["transition_prob"] <= 1.0
    for total in by_from.values():
        assert total == pytest.approx(1.0, abs=1e-4)  # rounded to 6dp


def test_correlation_bounds_and_redundancy_signal(spark):
    rows = {(r["feature_a"], r["feature_b"]): r["pearson_corr"]
            for r in q_churn_feature_correlation(spark, SF).collect()}
    assert len(rows) == 10
    for v in rows.values():
        assert -1.0 <= v <= 1.0
    # trailing-window counts are nested subsets -> strongly positive corr
    assert rows[("orders_30d", "orders_90d")] > 0.3


def test_decayed_spend_bounded_by_plain_spend(spark):
    decayed = q_decayed_customer_spend(spark, SF)
    plain = (
        load_table(spark, SF, "orders")
        .filter(F.to_date("o_orderdate") <= F.lit(AS_OF).cast("date"))
        .groupBy(F.col("o_custkey").alias("customer_id"))
        .agg(F.sum("o_totalprice").alias("total_spend"))
    )
    bad = decayed.join(plain, on="customer_id").filter(
        (F.col("decayed_spend") > F.col("total_spend"))
        | (F.col("decayed_spend") <= 0)
    )
    assert bad.count() == 0


def test_target_encoding_shrinks_toward_global(spark):
    rows = q_segment_churn_encoding(spark, SF).collect()
    n = sum(r["n_customers"] for r in rows)
    churned = sum(r["n_churned"] for r in rows)
    global_rate = churned / n
    for r in rows:
        raw = r["n_churned"] / r["n_customers"]
        lo, hi = sorted((raw, global_rate))
        assert lo - 1e-6 <= r["smoothed_churn_rate"] <= hi + 1e-6


def test_pagerank_mass_and_floor(spark):
    rows = q_copurchase_pagerank(spark, SF).collect()
    n = len(rows)
    assert n > 0
    total = sum(r["pagerank_fp"] for r in rows)
    # floor division only ever drops mass; base term bounds from below
    assert total <= n * _PR_SCALE
    base = 150_000_000_000 // n
    assert all(r["pagerank_fp"] >= base for r in rows)
    # hubs differentiate: not all equal
    assert len({r["pagerank_fp"] for r in rows}) > 1


def test_bm25_positive_and_term_sensitive(spark):
    scored = {r["doc_id"]: r["bm25"] for r in q_doc_bm25_scores(spark, SF).collect()}
    assert scored and all(v > 0 for v in scored.values())
    # a doc with no query term must not be scored
    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    for d in docs:
        has_term = any(t in d["text"].split() for t in ("spark", "join", "window"))
        assert (d["doc_id"] in scored) == has_term
