"""Invariant tests for the decision-support query family (TPC-H
Q18/Q10/Q21 analogues, triangle counting, quantile binning) — semantic
properties beyond the Spark-vs-DuckDB oracle agreement.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.queries.decision_queries import (
    _BASKET_QTY,
    q_copurchase_triangles,
    q_large_basket_customers,
    q_order_value_quartile_stats,
    q_returned_revenue_by_customer,
    q_sole_blame_suppliers,
)
from ecom_churn_lakehouse_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_large_baskets_exceed_threshold_and_match_recount(spark):
    rows = q_large_basket_customers(spark, SF).collect()
    truth = {
        r["l_orderkey"]: r["q"]
        for r in load_table(spark, SF, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > _BASKET_QTY)
        .collect()
    }
    assert {r["orderkey"] for r in rows} == set(truth)
    for r in rows:
        assert r["total_qty"] > _BASKET_QTY
        assert abs(r["total_qty"] - truth[r["orderkey"]]) < 1e-6


def test_returned_revenue_is_descending_and_positive(spark):
    rows = q_returned_revenue_by_customer(spark, SF).collect()
    assert 0 < len(rows) <= 20
    revs = [r["lost_revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert all(v > 0 for v in revs)
    assert all(r["returned_lines"] >= 1 for r in rows)


def test_sole_blame_matches_naive_exists_not_exists(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    ).collect()
    by_order: dict[int, list] = {}
    for r in li:
        by_order.setdefault(r["l_orderkey"], []).append(r)
    naive: dict[int, int] = {}
    for lines in by_order.values():
        supps = {r["l_suppkey"] for r in lines}
        ret_supps = {r["l_suppkey"] for r in lines if r["l_returnflag"] == "R"}
        # EXISTS another supplier's line AND NOT EXISTS another
        # supplier's returned line == sole returned supplier in a
        # multi-supplier order.
        if len(supps) > 1 and len(ret_supps) == 1:
            s = next(iter(ret_supps))
            naive[s] = naive.get(s, 0) + 1
    got = {r["suppkey"]: r["blamed_orders"] for r in
           q_sole_blame_suppliers(spark, SF).collect()}
    top = sorted(naive.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
    assert got == dict(top)


def test_triangles_match_bruteforce(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct().collect()
    baskets: dict[int, set] = {}
    for r in li:
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    edges = set()
    for parts in baskets.values():
        for a, b in combinations(sorted(parts), 2):
            edges.add((a, b))
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    counts: dict[int, int] = {}
    for a, b in edges:
        for c in adj.get(b, ()):  # a<b<c with (a,c) also an edge
            if c in adj.get(a, ()):
                for n in (a, b, c):
                    counts[n] = counts.get(n, 0) + 1
    got = {r["partkey"]: r["triangle_count"] for r in
           q_copurchase_triangles(spark, SF).collect()}
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
    assert got == dict(top)


def test_quartiles_partition_orders_evenly(spark):
    rows = {r["quartile"]: r for r in
            q_order_value_quartile_stats(spark, SF).collect()}
    n_orders = load_table(spark, SF, "orders").count()
    assert sorted(rows) == [1, 2, 3, 4]
    sizes = [rows[q]["n_orders"] for q in sorted(rows)]
    assert sum(sizes) == n_orders
    assert max(sizes) - min(sizes) <= 1  # NTILE balance guarantee
    # bins are ordered: each quartile's max <= next quartile's min
    # (ties may share a value across the boundary, never invert)
    for q in (1, 2, 3):
        assert rows[q]["max_value"] <= rows[q + 1]["min_value"] + 1e-9
    for q in (1, 2, 3, 4):
        assert rows[q]["min_value"] <= rows[q]["max_value"]
