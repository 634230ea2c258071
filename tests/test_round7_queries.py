"""Behavioral invariants for round-7 entries (beyond oracle equality).

The oracle sweep proves Spark == DuckDB; these tests pin the SEMANTICS
both engines implement — a shared bug in both spellings would pass the
oracle but fail here.
"""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def test_span_dedup_removes_planted_boilerplate(spark):
    """The 13-token license header planted on every 5th doc must be
    removable everywhere except its single canonical occurrence."""
    from ecom_churn_lakehouse_spark.queries.dedup_queries import (
        _SPAN_BP,
        q_repeated_span_exact_dedup,
    )

    assert len(_SPAN_BP.split()) == 13
    rows = q_repeated_span_exact_dedup(spark, SF).collect()
    n_bp_docs = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet' WHERE doc_id % 5 = 0"
    ).fetchone()[0]
    total_removable = sum(r["removable_tokens"] for r in rows)
    # every non-canonical boilerplate occurrence contributes >= 13
    # tokens of coverage (spans may extend further via natural repeats)
    assert total_removable >= 13 * (n_bp_docs - 1)
    total_affected = sum(r["affected_docs"] for r in rows)
    assert total_affected >= n_bp_docs - 1
    for r in rows:
        assert 0 <= r["removable_tokens"] <= r["total_tokens"]
        assert 0 <= r["removable_ppm"] <= 1_000_000


def test_span_dedup_island_union_no_double_count(spark):
    """Overlapping removable spans must union, not sum: a doc whose
    removable range is one contiguous boilerplate block can never
    report more removable tokens than it has."""
    from ecom_churn_lakehouse_spark.queries.dedup_queries import (
        q_repeated_span_exact_dedup,
    )

    rows = q_repeated_span_exact_dedup(spark, SF).collect()
    assert rows, "span dedup returned nothing at sf0.001"
    # ppm consistency: removable_ppm == removable*1e6 // total
    for r in rows:
        assert r["removable_ppm"] == r["removable_tokens"] * 1_000_000 // (
            r["total_tokens"]
        )


def test_keep_manifest_decision_precedence(spark):
    """Exact duplicates must be dropped as duplicates even when they
    are also boilerplate-heavy; every planted copy is non-canonical."""
    from ecom_churn_lakehouse_spark.queries.curation_queries import (
        q_curation_keep_manifest,
    )

    rows = {r["doc_id"]: r for r in q_curation_keep_manifest(spark, SF).collect()}
    n_docs = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet'"
    ).fetchone()[0]
    copies = [d + 100000 for d in range(0, n_docs, 10)]
    assert copies, "no planted copies"
    for c in copies:
        assert rows[c]["decision"] == "exact_duplicate", (c, rows[c])
        # its original must NOT be dropped as a duplicate
        assert rows[c - 100000]["decision"] != "exact_duplicate"
    decisions = {r["decision"] for r in rows.values()}
    assert "keep" in decisions
    # every doc got exactly one row
    assert len(rows) == n_docs + len(copies)


def test_span_curve_monotone_in_length(spark):
    """Longer minimum spans can only remove fewer tokens."""
    from ecom_churn_lakehouse_spark.queries.dedup_queries import (
        q_span_dedup_savings_curve,
    )

    rows = sorted(
        q_span_dedup_savings_curve(spark, SF).collect(),
        key=lambda r: r["span_len"],
    )
    assert [r["span_len"] for r in rows] == [6, 8, 12]
    toks = [r["removable_tokens"] for r in rows]
    assert toks == sorted(toks, reverse=True), toks
    # the 13-token planted boilerplate is visible at every L <= 12
    assert all(t > 0 for t in toks)


def test_kanon_ladder_monotone(spark):
    """Coarser generalization can only grow the smallest group."""
    from ecom_churn_lakehouse_spark.queries.governance_queries import (
        q_kanon_generalization_ladder,
    )

    rows = sorted(
        q_kanon_generalization_ladder(spark, SF).collect(),
        key=lambda r: r["level"],
    )
    assert len(rows) == 4
    # group count shrinks (or holds) as the qid coarsens
    ng = [r["n_groups"] for r in rows]
    assert ng == sorted(ng, reverse=True), ng
    # suppression share shrinks as groups merge
    sup = [r["suppressed_ppm"] for r in rows]
    assert sup == sorted(sup, reverse=True), sup


def test_basket_rules_invariants(spark):
    """Confidence >= support, symmetric support, exact lift components."""
    from ecom_churn_lakehouse_spark.queries.retail_metrics_queries import (
        q_basket_rules_support_confidence,
    )

    rows = q_basket_rules_support_confidence(spark, SF).collect()
    assert rows, "no rules at sf0.001"
    for r in rows:
        assert r["confidence_ppm"] >= r["support_ppm"]
        assert r["cab"] <= min(r["cnt_a"], r["cnt_b"])
        assert r["positive_lift"] == (r["lift_num"] > r["lift_den"])


# ---------------------------------------------------------------- batch:
# HT / KW / ABC / RR / pass@k / Kendall invariants


def test_ht_degenerate_stratum_is_exact(spark):
    """The 100%-rate stratum's HT total must equal the population
    total with SE exactly 0; every stratum's estimate is self-consistent."""
    from ecom_churn_lakehouse_spark.queries.sampling_queries import (
        q_horvitz_thompson_total,
    )

    rows = {r["priority"]: r for r in q_horvitz_thompson_total(spark, SF).collect()}
    low = rows["5-LOW"]
    assert low["rate_permille"] == 1000
    assert low["n_sample"] == low["n_pop"]
    assert low["ht_total_cents"] == low["pop_cents"]
    assert low["se_cents"] == 0
    assert low["abs_err_ppm"] == 0
    for r in rows.values():
        assert 0 <= r["n_sample"] <= r["n_pop"]
        assert r["ht_total_cents"] == r["sample_cents"] * 1000 // r["rate_permille"]


def test_kruskal_wallis_rank_identities(spark):
    """Doubled rank sums must telescope to N(N+1) and H must be
    non-negative for real group splits."""
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_kruskal_wallis_priority_spend,
    )

    r = q_kruskal_wallis_priority_spend(spark, SF).collect()[0]
    n = r["n"]
    assert (
        r["r2_urgent"] + r["r2_high"] + r["r2_medium"] + r["r2_notspec"] + r["r2_low"]
        == n * (n + 1)
    )
    assert (
        r["n_urgent"] + r["n_high"] + r["n_medium"] + r["n_notspec"] + r["n_low"] == n
    )
    assert r["h_milli"] >= 0
    assert r["tie_cubes"] >= 0


def test_abc_classes_partition_and_order(spark):
    """A/B/C must partition all parts, shares must sum to ~100%, and
    class A must not exceed 80% + one part's share."""
    from ecom_churn_lakehouse_spark.queries.retail_metrics_queries import (
        q_abc_inventory_classes,
    )

    rows = {r["abc_class"]: r for r in q_abc_inventory_classes(spark, SF).collect()}
    assert set(rows) == {"A", "B", "C"}
    total = sum(r["class_micros"] for r in rows.values())
    assert rows["A"]["class_micros"] <= total * 8 // 10 + max(
        r["class_micros"] for r in rows.values()
    )
    share_sum = sum(r["share_bp"] for r in rows.values())
    assert 9990 <= share_sum <= 10000  # floor division loses < 3 bp


def test_randomized_response_debias_identities(spark):
    """Reported counts must conserve the population; the debiased
    estimate must invert the mechanism exactly in expectation form."""
    from ecom_churn_lakehouse_spark.queries.governance_queries import (
        q_randomized_response_privacy,
    )

    rows = q_randomized_response_privacy(spark, SF).collect()
    n = sum(r["true_cnt"] for r in rows)
    assert sum(r["reported_cnt"] for r in rows) == n
    # sum of debiased estimates telescopes back to ~n (floor loss < 25)
    est_sum_milli = sum(r["est_milli"] for r in rows)
    assert abs(est_sum_milli - n * 1000) < 25 * 1000
    for r in rows:
        assert r["abs_err_milli"] == abs(r["est_milli"] - r["true_cnt"] * 1000)


def test_pass_at_k_monotone_and_bounded(spark):
    """pass@k is monotone non-decreasing in k for any fixed entity
    set; means stay in [0, 1e6]."""
    from ecom_churn_lakehouse_spark.queries.training_audit_queries import (
        q_pass_at_k_estimator,
    )

    rows = sorted(
        q_pass_at_k_estimator(spark, SF).collect(), key=lambda r: r["k"]
    )
    assert [r["k"] for r in rows] == [1, 3, 5]
    for r in rows:
        assert 0 <= r["mean_pass_ppm"] <= 1_000_000
        assert r["n_certain_pass"] + r["n_zero_pass"] <= r["n_entities"]
    # entity sets shrink with k (n >= k filter), so compare only the
    # shared population via recomputation at k=1 upper bound
    assert rows[0]["n_entities"] >= rows[1]["n_entities"] >= rows[2]["n_entities"]


def test_kendall_tau_bounds_and_tie_identities(spark):
    """|tau_b| <= 1, pair counts bounded by untied pairs."""
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_kendall_tau_quantity_discount,
    )

    rows = q_kendall_tau_quantity_discount(spark, SF).collect()
    assert rows
    for r in rows:
        assert -1000 <= r["tau_b_milli"] <= 1000
        assert r["t0"] == r["n"] * (r["n"] - 1) // 2
        assert r["t1"] <= r["t0"] and r["t2"] <= r["t0"]
        assert r["c_pairs"] + r["d_pairs"] <= r["t0"] - max(r["t1"], r["t2"])


def test_knapsack_budget_respected_and_greedy(spark):
    """Spend never exceeds budget; the greedy prefix is contiguous in
    ROI order, so utilization is high unless one item is huge."""
    from ecom_churn_lakehouse_spark.queries.decision_queries import (
        q_campaign_budget_knapsack,
    )

    r = q_campaign_budget_knapsack(spark, SF).collect()[0]
    assert 0 < r["spent_micros"] <= r["budget_micros"]
    assert r["n_selected"] > 0
    assert r["captured_rev_micros"] > r["spent_micros"]  # ROI > 1 prefix
    assert 0 < r["utilization_bp"] <= 10000


def test_ndcg_bounds_and_ideal_dominates(spark):
    """NDCG in [0, 1000]; the ideal ordering's DCG dominates the
    retrieved ordering's by construction."""
    from ecom_churn_lakehouse_spark.queries.search_queries import (
        q_ranking_ndcg_eval,
    )

    rows = q_ranking_ndcg_eval(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["idcg_micro"] >= r["dcg_micro"] >= 0
        assert 0 <= r["ndcg_milli"] <= 1000


def test_stream_cms_equals_batch_sketch(spark):
    """The merged streaming CMS must reproduce the one-shot batch
    sketch exactly for every probe token (mergeability is exact)."""
    from ecom_churn_lakehouse_spark.queries.hashing_queries import (
        q_cms_heavy_hitters,
        q_stream_cms_maintenance,
    )

    batch = {
        r["token"]: (r["cms_estimate"], r["overshoot"])
        for r in q_cms_heavy_hitters(spark, SF).collect()
    }
    stream = {
        r["token"]: (r["cms_estimate"], r["overshoot"])
        for r in q_stream_cms_maintenance(spark, SF).collect()
    }
    assert batch == stream
    assert all(o >= 0 for _, o in stream.values())  # CMS is one-sided


def test_brown_forsythe_components(spark):
    """Group sizes partition N; F is non-negative; deviations sum to
    non-negative integers."""
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_brown_forsythe_priority_spend,
    )

    r = q_brown_forsythe_priority_spend(spark, SF).collect()[0]
    assert (
        r["n_urgent"] + r["n_high"] + r["n_medium"] + r["n_notspec"] + r["n_low"]
        == r["n"]
    )
    assert r["f_milli"] >= 0
    assert min(r["s_urgent"], r["s_high"], r["s_medium"], r["s_notspec"], r["s_low"]) >= 0


def test_gini_split_screen_invariants(spark):
    """Cumulative counts are monotone, one best split is flagged, and
    impurity stays in the binary-Gini envelope [0, 0.5]."""
    from ecom_churn_lakehouse_spark.queries.decision_queries import (
        q_decision_split_gini_screen,
    )

    rows = sorted(
        q_decision_split_gini_screen(spark, SF).collect(),
        key=lambda r: r["split_decile"],
    )
    assert len(rows) == 9
    assert sum(1 for r in rows if r["is_best"]) >= 1
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_left"] > prev["n_left"]
        assert cur["pos_left"] >= prev["pos_left"]
    for r in rows:
        assert 0 <= r["weighted_gini_micro"] <= 500000
        assert r["pos_left"] <= r["n_left"] and r["pos_right"] <= r["n_right"]


def test_two_proportion_ztest_counts(spark):
    """Success counts bounded by trials; z and RR finite and
    self-consistent with the raw counts' direction."""
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_two_proportion_ztest_returns,
    )

    r = q_two_proportion_ztest_returns(spark, SF).collect()[0]
    assert 0 <= r["x1"] <= r["n1"] and 0 <= r["x2"] <= r["n2"]
    # z sign must match the rate difference direction
    rate_diff = r["x1"] * r["n2"] - r["x2"] * r["n1"]
    if rate_diff > 0:
        assert r["z_milli"] >= 0
    elif rate_diff < 0:
        assert r["z_milli"] <= 0
    assert r["risk_ratio_milli"] > 0


def test_markov_mass_conservation_bounds(spark):
    """Floor loss per iteration is < k parts per mille; masses stay
    non-negative and roughly conserve the simplex."""
    from ecom_churn_lakehouse_spark.queries.event_queries import (
        _MARKOV_ITERS,
        q_markov_stationary_event_mix,
    )

    rows = q_markov_stationary_event_mix(spark, SF).collect()
    k = len(rows)
    assert k >= 2
    final_col = f"mass_milli_iter{_MARKOV_ITERS}"
    total = sum(r[final_col] for r in rows)
    # each iteration loses < k milli to floors
    assert 1000 - _MARKOV_ITERS * k * 2 <= total <= 1000
    for r in rows:
        assert r[final_col] >= 0
        assert r["out_transitions"] > 0


def test_breakpoint_sse_dominated_by_global_fit(spark):
    """Any two-segment fit has SSE <= the single-line fit over the
    same days (more parameters can only reduce SSE)."""
    import duckdb

    from ecom_churn_lakehouse_spark.queries.analytics_queries import (
        q_piecewise_trend_breakpoint,
    )

    rows = q_piecewise_trend_breakpoint(spark, SF).collect()
    assert rows and sum(1 for r in rows if r["is_best"]) >= 1
    global_sse = duckdb.connect().execute(f"""
        WITH daily AS (
            SELECT CAST(date_diff('day', DATE '1995-01-01', o_orderdate)
                        AS BIGINT) AS x,
                   CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) // 100000 AS BIGINT) AS y
            FROM '{SF}/orders.parquet' GROUP BY o_orderdate
        )
        SELECT SUM(CAST(y AS DOUBLE) * y) - SUM(CAST(y AS DOUBLE)) ** 2 / COUNT(*)
               - (SUM(CAST(x AS DOUBLE) * y) - SUM(CAST(x AS DOUBLE)) * SUM(CAST(y AS DOUBLE)) / COUNT(*)) ** 2
                 / (SUM(CAST(x AS DOUBLE) * x) - SUM(CAST(x AS DOUBLE)) ** 2 / COUNT(*))
        FROM daily
    """).fetchone()[0]
    for r in rows:
        assert r["sse_total_kd2"] <= global_sse + 1
        assert r["n_left"] >= 2 and r["n_right"] >= 2


def test_granger_f_consistency(spark):
    """The unrestricted model can only fit better: r2_full >= r2_restricted,
    and F >= 0."""
    from ecom_churn_lakehouse_spark.queries.analytics_queries import (
        q_granger_causality_screen,
    )

    r = q_granger_causality_screen(spark, SF).collect()[0]
    assert r["n"] >= 10
    assert r["r2_full_micro"] >= r["r2_restricted_micro"]
    assert r["f_milli"] >= 0


def test_apriori_antimonotone(spark):
    """Itemset support can never exceed any subset's support."""
    from ecom_churn_lakehouse_spark.queries.retail_metrics_queries import (
        q_apriori_triple_itemsets,
    )

    rows = q_apriori_triple_itemsets(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["item_a"] < r["item_b"] < r["item_c"]
        assert r["support_abc"] <= min(
            r["support_ab"], r["support_ac"], r["support_bc"]
        )
        assert r["support_abc"] >= 1
    # top-N cut: results are the N highest-support triples (the last
    # kept support bounds everything kept)
    supports = [r["support_abc"] for r in rows]
    assert supports == sorted(supports, reverse=True)


def test_median_ci_ordering(spark):
    """ci_lo <= median <= ci_hi per group, and the CI narrows as n
    grows (checked across groups by rank width)."""
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_median_ci_order_statistic,
    )

    rows = q_median_ci_order_statistic(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["ci_lo_cents"] <= r["median_cents"] <= r["ci_hi_cents"]
        assert r["n"] > 0


def test_stream_transitions_equal_batch(spark):
    """The streamed transition relation (intra-batch pairs + boundary
    pairs from per-user state) must equal the one-shot batch lag
    relation exactly."""
    import duckdb

    from ecom_churn_lakehouse_spark.queries.event_queries import (
        q_stream_transition_maintenance,
    )

    got = {
        (r["from_type"], r["to_type"]): r["transitions"]
        for r in q_stream_transition_maintenance(spark, SF).collect()
    }
    want = {
        (a, b): c
        for a, b, c in duckdb.connect().execute(f"""
            WITH ordered AS (
                SELECT event_type,
                       LAG(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS prev
                FROM '{SF}/events.parquet'
            )
            SELECT prev, event_type, COUNT(*) FROM ordered
            WHERE prev IS NOT NULL GROUP BY prev, event_type
        """).fetchall()
    }
    assert got == want
    # total transitions = events - distinct users (each user's chain)
    n_ev, n_users = duckdb.connect().execute(
        f"SELECT COUNT(*), COUNT(DISTINCT user_id) FROM '{SF}/events.parquet'"
    ).fetchone()
    assert sum(got.values()) == n_ev - n_users


def test_popularity_recall_monotone_in_k(spark):
    """Hit-rate@k is monotone non-decreasing in k over the SAME user
    population, and hits never exceed users."""
    from ecom_churn_lakehouse_spark.queries.search_queries import (
        q_popularity_recommender_recall,
    )

    rows = sorted(
        q_popularity_recommender_recall(spark, SF).collect(), key=lambda r: r["k"]
    )
    assert [r["k"] for r in rows] == [1, 5, 10, 20]
    n_users = {r["n_users"] for r in rows}
    assert len(n_users) == 1  # same eligible population at every k
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_hits"] >= prev["n_hits"]
    for r in rows:
        assert 0 <= r["n_hits"] <= r["n_users"]
        assert r["hit_rate_ppm"] == r["n_hits"] * 1_000_000 // r["n_users"]


def test_sort_key_advisor_diagonal_dominates(spark):
    """Each candidate sort key must prune its own predicate at least
    as well as any other candidate does."""
    from ecom_churn_lakehouse_spark.queries.dataops_queries import (
        q_sort_key_advisor,
    )

    rows = q_sort_key_advisor(spark, SF).collect()
    p = {(r["sort_key"], r["predicate"]): r["prune_ppm"] for r in rows}
    assert len(p) == 9
    own = {
        "sort_date": "date_range",
        "sort_key": "key_range",
        "sort_price": "price_range",
    }
    for sk, pred in own.items():
        for other_sk in own:
            assert p[(sk, pred)] >= p[(other_sk, pred)]


def test_quality_curve_monotone(spark):
    """Kept docs/tokens are monotone in the threshold; tau=1e6 keeps
    everything."""
    from ecom_churn_lakehouse_spark.queries.curation_queries import (
        q_quality_filter_threshold_curve,
    )

    rows = sorted(
        q_quality_filter_threshold_curve(spark, SF).collect(),
        key=lambda r: r["tau"],
    )
    for prev, cur in zip(rows, rows[1:]):
        assert cur["kept_docs"] >= prev["kept_docs"]
        assert cur["kept_tokens"] >= prev["kept_tokens"]
    assert rows[-1]["kept_docs_ppm"] == 1_000_000
    assert rows[-1]["kept_tokens_ppm"] == 1_000_000


def test_srm_counts_match_split_operator(spark):
    """The SRM check must count exactly what customer_split assigns."""
    from ecom_churn_lakehouse_spark.queries.sampling_queries import (
        q_customer_split,
        q_split_srm_check,
    )

    srm = q_split_srm_check(spark, SF).collect()[0]
    split_counts = {
        r["split"]: r["cnt"]
        for r in q_customer_split(spark, SF)
        .groupBy("split")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    assert srm["n_train"] == split_counts.get("train", 0)
    assert srm["n_val"] == split_counts.get("val", 0)
    assert srm["n_test"] == split_counts.get("test", 0)
    assert srm["n"] == sum(split_counts.values())
    assert srm["chi2_milli"] >= 0


def test_att_accounting(spark):
    """Matched + unmatched treated partition all treated lines; the
    per-treated ATT is the numerator divided by matched count."""
    import duckdb

    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_exact_matching_att,
    )

    r = q_exact_matching_att(spark, SF).collect()[0]
    n_treated = duckdb.connect().execute(f"""
        SELECT COUNT(*) FROM '{SF}/lineitem.parquet' l
        JOIN '{SF}/part.parquet' p ON p.p_partkey = l.l_partkey
        WHERE p.p_type LIKE 'PROMO%'
    """).fetchone()[0]
    assert r["n_treated_matched"] + r["n_treated_unmatched"] == n_treated
    assert r["n_cells_matched"] > 0
    expect = r["att_num_milli"] // r["n_treated_matched"]
    if r["att_num_milli"] >= 0:
        assert r["att_milli_cents"] == expect
    else:
        assert r["att_milli_cents"] in (expect, expect)  # floor semantics


def test_delta_ci_brackets_ratio(spark):
    """CI must bracket the point estimate with positive width."""
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_ratio_metric_delta_ci,
    )

    r = q_ratio_metric_delta_ci(spark, SF).collect()[0]
    assert r["se_milli"] > 0
    assert r["ci_lo_milli_approx"] < r["ratio_milli"] < r["ci_hi_milli_approx"]
    # point estimate consistent with the raw totals
    assert r["ratio_milli"] == r["total_dollars"] * 1000 // r["total_orders"]


def test_hhi_bounds(spark):
    """HHI in [1e6/n_brands - slack, 1e6]; top share consistent."""
    from ecom_churn_lakehouse_spark.queries.retail_metrics_queries import (
        q_market_hhi_by_segment,
    )

    rows = q_market_hhi_by_segment(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_brands"] > 0
        lower = 1_000_000 // r["n_brands"] - 2  # floor slack
        assert lower <= r["hhi_ppm"] <= 1_000_000
        assert 0 < r["top_brand_share_bp"] <= 10000


def test_shard_balance_partitions_corpus(spark):
    """Shard sizes must partition the corpus; every source has
    positive expectation in every shard."""
    import duckdb

    from ecom_churn_lakehouse_spark.queries.curation_queries import (
        q_shard_source_balance_audit,
    )

    rows = q_shard_source_balance_audit(spark, SF).collect()
    n_docs = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet'"
    ).fetchone()[0]
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["chi2_micro"] >= 0
        assert 0 < r["sources_present"] <= 20


def test_mde_scales_with_imbalance(spark):
    """90/10 MDE must exceed 50/50 MDE (harmonic-mean penalty)."""
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_experiment_power_mde,
    )

    r = q_experiment_power_mde(spark, SF).collect()[0]
    assert r["mde_90_10_milli"] > r["mde_50_50_milli"] > 0
    assert r["sd_milli_dollars"] > 0
    # the 90/10 penalty is sqrt((1/.9+1/.1)/(1/.5+1/.5)) ~ 1.667
    ratio = r["mde_90_10_milli"] / r["mde_50_50_milli"]
    assert 1.60 < ratio < 1.73


def test_mediation_identity(spark):
    """OLS identity: total = direct + indirect (exactly in algebra,
    surfaced as a float-tolerance check column)."""
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_discount_quantity_mediation,
    )

    r = q_discount_quantity_mediation(spark, SF).collect()[0]
    assert r["identity_holds"]
    assert abs(r["total_micro"] - (r["direct_micro"] + r["indirect_micro"])) <= 2


def test_conformal_coverage_guarantee(spark):
    """Split conformal guarantees coverage >= 95% in expectation;
    with finite test sets allow a small margin below."""
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_conformal_spend_intervals,
    )

    rows = q_conformal_spend_intervals(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["halfwidth_cents"] > 0
        assert r["covered"] <= r["n_test"]
        # 95% nominal; binomial noise at sf0.001 test sizes
        assert r["coverage_ppm"] >= 850_000


def test_seasonality_strength_bounds(spark):
    """Variance explained is a proportion in [0, 1e6]; month has at
    most 12 buckets, dow at most 7."""
    from ecom_churn_lakehouse_spark.queries.analytics_queries import (
        q_seasonality_strength_decomposition,
    )

    rows = {
        r["component"]: r
        for r in q_seasonality_strength_decomposition(spark, SF).collect()
    }
    assert set(rows) == {"month_of_year", "day_of_week"}
    assert rows["month_of_year"]["n_buckets"] <= 12
    assert rows["day_of_week"]["n_buckets"] <= 7
    for r in rows.values():
        assert 0 <= r["strength_ppm"] <= 1_000_000


def test_newsvendor_quantile_ordering(spark):
    """Service-level quantiles must be monotone and the critical
    fractile must sit between the median and the 90% level."""
    from ecom_churn_lakehouse_spark.queries.retail_metrics_queries import (
        q_newsvendor_stock_levels,
    )

    rows = q_newsvendor_stock_levels(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["q50_units"] <= r["q_critical_units"] <= r["q90_units"]
        assert (
            r["safety_stock_units"] == r["q_critical_units"] - r["mean_units"]
        )


def test_chunk_cohesion_bounds(spark):
    """Jaccard cohesion in [0, 1e6]; docs with one chunk emit no
    boundary rows; weak count bounded by boundary count."""
    from ecom_churn_lakehouse_spark.queries.text_queries import (
        q_chunk_boundary_cohesion,
    )

    rows = q_chunk_boundary_cohesion(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_boundaries"] >= 1
        assert 0 <= r["min_cohesion_ppm"] <= r["mean_cohesion_ppm"] <= 1_000_000
        assert 0 <= r["n_weak_boundaries"] <= r["n_boundaries"]


def test_hill_alpha_positive(spark):
    """Top-k values all exceed the threshold, so the log sum and
    alpha are strictly positive."""
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_spend_tail_hill_estimator,
    )

    r = q_spend_tail_hill_estimator(spark, SF).collect()[0]
    assert r["k"] == 100
    assert r["sum_log_micro"] > 0
    assert r["hill_alpha_milli"] > 0
    assert r["threshold_cents"] > 0


def test_james_stein_contracts_toward_grand(spark):
    """Every shrunk mean lies between the raw brand mean and the
    grand mean (inclusive), and lambda is a proper weight."""
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_james_stein_brand_means,
    )

    rows = q_james_stein_brand_means(spark, SF).collect()
    assert len(rows) == 25
    total_n = sum(r["n_b"] for r in rows)
    grand_milli = sum(r["n_b"] * r["mean_milli"] for r in rows) / total_n
    for r in rows:
        assert 0 <= r["lambda_ppm"] <= 1_000_000
        lo = min(r["mean_milli"], grand_milli) - 2
        hi = max(r["mean_milli"], grand_milli) + 2
        assert lo <= r["shrunk_milli"] <= hi


def test_two_pass_percentile_equals_percentile_disc(spark):
    """The two-pass exact selection must equal percentile_disc at all
    three levels, and pass 2 must scan at most 3 of the coarse bins."""
    import duckdb

    from ecom_churn_lakehouse_spark.queries.dataops_queries import (
        q_two_pass_exact_percentile,
    )

    r = q_two_pass_exact_percentile(spark, SF).collect()[0]
    want = duckdb.connect().execute(f"""
        SELECT quantile_disc(cents, 0.50), quantile_disc(cents, 0.95),
               quantile_disc(cents, 0.99)
        FROM (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS cents FROM '{SF}/orders.parquet')
    """).fetchone()
    assert (r["p50_cents"], r["p95_cents"], r["p99_cents"]) == want
    assert 1 <= r["bins_scanned_pass2"] <= 3


def test_retention_decay_negative_and_halflife(spark):
    """Retention decays: slopes should be <= 0 for real cohorts, and
    any decaying fit implies a positive half-life."""
    from ecom_churn_lakehouse_spark.queries.analytics_queries import (
        q_retention_decay_fit,
    )

    rows = q_retention_decay_fit(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_points"] >= 3
        assert 0 < r["mean_ret_ppm"] <= 1_000_000
        if r["decay_micro_per_month"] < 0:
            assert r["half_life_days"] > 0
        else:
            assert r["half_life_days"] == -1


def test_llr_signature_positive_and_ranked(spark):
    """Top signature terms have positive LLR, k>0, rank 1..10 per
    source."""
    from ecom_churn_lakehouse_spark.queries.text_queries import (
        q_source_signature_terms_llr,
    )

    rows = q_source_signature_terms_llr(spark, SF).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
        assert r["k_in_source"] > 0
    for src, rs in by_src.items():
        ranks = sorted(x["rnk"] for x in rs)
        assert ranks == list(range(1, len(rs) + 1))
        top = min(rs, key=lambda x: x["rnk"])
        assert top["llr_micro"] >= max(x["llr_micro"] for x in rs) - 1


def test_rake_phrases_bounded_and_scored(spark):
    """Phrases contain no stopwords, respect the length cap, and
    scores are positive."""
    from ecom_churn_lakehouse_spark.queries.text_queries import (
        _RAKE_MAX_PHRASE,
        _RAKE_STOPWORDS,
        q_rake_keyphrases,
    )

    rows = q_rake_keyphrases(spark, SF).collect()
    assert rows
    stops = set(_RAKE_STOPWORDS)
    for r in rows:
        words = r["phrase"].split()
        assert 1 <= len(words) <= _RAKE_MAX_PHRASE
        assert not (set(words) & stops)
        assert r["score_milli"] > 0
        assert r["n_occurrences"] >= 1


def test_ipf_margins_converge(spark):
    """After two sweeps the weighted REGION margins (the last sweep)
    match population margins to within integer-floor slack."""
    import duckdb

    from ecom_churn_lakehouse_spark.queries.sampling_queries import (
        q_ipf_raking_weights,
    )

    rows = q_ipf_raking_weights(spark, SF).collect()
    assert rows
    pop = {
        int(k): v
        for k, v in duckdb.connect().execute(f"""
            SELECT n.n_regionkey, COUNT(*)
            FROM '{SF}/customer.parquet' c
            JOIN '{SF}/nation.parquet' n ON n.n_nationkey = c.c_nationkey
            GROUP BY n.n_regionkey
        """).fetchall()
    }
    by_region = {}
    for r in rows:
        by_region[r["region"]] = by_region.get(r["region"], 0) + r["weighted_milli"]
    for region, wsum in by_region.items():
        target = pop[region] * 1000
        # integer floors lose < 1 milli per cell per sweep
        assert abs(wsum - target) <= 1000 * len(rows)


def test_nzv_flags_planted_feature(spark):
    """The planted near-constant indicator must be flagged; the
    5-value segment must not be."""
    from ecom_churn_lakehouse_spark.queries.feature_queries import (
        q_near_zero_variance_screen,
    )

    rows = {r["feature"]: r for r in q_near_zero_variance_screen(spark, SF).collect()}
    assert rows["is_high_balance"]["near_zero_variance"]
    assert not rows["segment"]["near_zero_variance"]
    for r in rows.values():
        assert r["top_freq"] >= r["second_freq"]
        assert r["n_distinct"] <= r["n"]


def test_cochran_armitage_components(spark):
    """Weighted sums bounded by their maxima; z finite."""
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_cochran_armitage_trend_test,
    )

    r = q_cochran_armitage_trend_test(spark, SF).collect()[0]
    assert 0 < r["x_tot"] < r["n_tot"]
    assert r["swx"] <= 5 * r["x_tot"]
    assert r["swn"] <= 5 * r["n_tot"]
    assert r["swwn"] <= 25 * r["n_tot"]


def test_capture_recapture_reasonable(spark):
    """Chapman estimate within a sane band of truth for 15% samples,
    and overlap bounded by both sample sizes."""
    from ecom_churn_lakehouse_spark.queries.dataops_queries import (
        q_capture_recapture_estimate,
    )

    r = q_capture_recapture_estimate(spark, SF).collect()[0]
    assert 0 <= r["m"] <= min(r["n1"], r["n2"])
    assert r["chapman_estimate"] > 0
    # 15% x 15% of a 100-buyer population is noisy; just sanity-band it
    assert r["n_true"] // 5 <= r["chapman_estimate"] <= r["n_true"] * 5


def test_sprt_trajectory_consistency(spark):
    """Cumulative LLR telescopes the daily increments; at most one
    first_decision; state matches the boundary arithmetic."""
    from ecom_churn_lakehouse_spark.queries.event_queries import (
        _SPRT_BOUND,
        q_sprt_conversion_monitor,
    )

    rows = sorted(
        q_sprt_conversion_monitor(spark, SF).collect(), key=lambda r: r["day"]
    )
    assert rows
    run = 0
    firsts = 0
    for r in rows:
        run += r["llr_micro"]
        assert r["cum_llr_micro"] == run
        if r["first_decision"]:
            firsts += 1
        if r["cum_llr_micro"] >= _SPRT_BOUND:
            assert r["state"] == "accept_h1"
        elif r["cum_llr_micro"] <= -_SPRT_BOUND:
            assert r["state"] == "accept_h0"
        else:
            assert r["state"] == "continue"
    assert firsts <= 1


def test_page_hinkley_nonnegative_statistic(spark):
    """PH max is >= 0 by construction (m - running min); alarms only
    with a positive statistic."""
    from ecom_churn_lakehouse_spark.queries.analytics_queries import (
        q_page_hinkley_drift,
    )

    r = q_page_hinkley_drift(spark, SF).collect()[0]
    assert r["ph_max_micro"] >= 0
    assert 0 <= r["n_alarm_days"] <= r["n_days"]
    if r["n_alarm_days"] > 0:
        assert r["first_alarm_day"] is not None


def test_lorenz_curve_convex_and_terminal(spark):
    """Cumulative shares are monotone, end at 100%, and the curve
    lies below the diagonal (inequality)."""
    from ecom_churn_lakehouse_spark.queries.retail_metrics_queries import (
        q_lorenz_curve_deciles,
    )

    rows = sorted(
        q_lorenz_curve_deciles(spark, SF).collect(), key=lambda r: r["decile"]
    )
    assert len(rows) == 10
    assert rows[-1]["cum_share_bp"] in (9999, 10000)
    assert rows[-1]["cum_pop_bp"] == 10000
    prev = 0
    for r in rows:
        assert r["cum_share_bp"] >= prev
        prev = r["cum_share_bp"]
        assert r["cum_share_bp"] <= r["cum_pop_bp"]  # below the diagonal


def test_yule_k_identities(spark):
    """Spectrum identities: hapax <= vocab <= tokens; K positive for
    any corpus with repeats."""
    from ecom_churn_lakehouse_spark.queries.text_queries import q_vocab_yule_k

    rows = q_vocab_yule_k(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["hapax"] <= r["vocab"] <= r["n_tokens"]
        assert 0 <= r["hapax_share_ppm"] <= 1_000_000
        assert r["yule_k_deci"] >= 0


def test_wasserstein_bounded_by_mean_gap(spark):
    """W1 between distributions on a common support is bounded by the
    support range; numerator/denominator consistency holds."""
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_wasserstein_spend_distance,
    )

    r = q_wasserstein_spend_distance(spark, SF).collect()[0]
    assert r["n1"] > 0 and r["n2"] > 0
    assert r["w1_cents"] >= 0
    assert int(r["area_numerator"]) // (r["n1"] * r["n2"]) == r["w1_cents"]


def test_weibull_shape_positive(spark):
    """The probability-plot slope is positive for any real gap
    distribution (survival decreases in g)."""
    from ecom_churn_lakehouse_spark.queries.churn_queries import (
        q_interevent_weibull_shape,
    )

    r = q_interevent_weibull_shape(spark, SF).collect()[0]
    assert r["n_gaps"] > 0
    assert r["n_grid_points"] >= 3
    assert r["weibull_shape_milli"] > 0


def test_boolean_search_clause_semantics(spark):
    """Every returned doc satisfies at least one clause; matched_via
    is consistent with the clause flags."""
    from ecom_churn_lakehouse_spark.queries.search_queries import (
        q_boolean_query_search,
    )

    rows = q_boolean_query_search(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["clause_and"] or r["clause_andnot"]
        if r["clause_and"] and r["clause_andnot"]:
            assert r["matched_via"] == "both"
        elif r["clause_and"]:
            assert r["matched_via"] == "and"
        else:
            assert r["matched_via"] == "andnot"


def test_cramers_v_bounds(spark):
    """V in [0, 1000] milli; dims match the known domains."""
    from ecom_churn_lakehouse_spark.queries.feature_queries import (
        q_cramers_v_matrix,
    )

    rows = {r["pair"]: r for r in q_cramers_v_matrix(spark, SF).collect()}
    assert set(rows) == {
        "segment_x_region", "segment_x_priority", "priority_x_status"
    }
    assert rows["segment_x_region"]["n_rows"] == 5
    assert rows["segment_x_region"]["n_cols"] == 5
    for r in rows.values():
        assert 0 <= r["cramers_v_milli"] <= 1000


def test_kappa_bounds_and_unanimity(spark):
    """Fleiss kappa <= 1000 milli; unanimous docs bounded by total;
    agreement numerator consistent with its per-doc maximum 6."""
    from ecom_churn_lakehouse_spark.queries.curation_queries import (
        q_quality_rater_agreement_kappa,
    )

    r = q_quality_rater_agreement_kappa(spark, SF).collect()[0]
    assert r["fleiss_kappa_milli"] <= 1000
    assert 0 <= r["n_unanimous"] <= r["n_docs"]
    assert r["agree_num"] <= 6 * r["n_docs"]
    assert 0 <= r["votes"] <= 3 * r["n_docs"]


def test_holm_stepdown_prefix_rule(spark):
    """Rejections form a prefix of the |z| ranking; thresholds are
    monotone decreasing in rank; every Holm rejection also passes
    its raw threshold."""
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_holm_stepdown_brand_screen,
    )

    rows = sorted(
        q_holm_stepdown_brand_screen(spark, SF).collect(), key=lambda r: r["rnk"]
    )
    assert len(rows) == 25
    seen_fail = False
    prev_thr = None
    for r in rows:
        if prev_thr is not None:
            assert r["threshold_milli"] <= prev_thr
        prev_thr = r["threshold_milli"]
        if not r["raw_pass"]:
            seen_fail = True
        if seen_fail:
            assert not r["holm_reject"]
        if r["holm_reject"]:
            assert r["raw_pass"]


def test_reconciliation_accounting(spark):
    """Stats ordered p50 <= p95 <= max; exact matches consistent."""
    from ecom_churn_lakehouse_spark.queries.diagnostics_queries import (
        q_order_total_reconciliation,
    )

    r = q_order_total_reconciliation(spark, SF).collect()[0]
    assert r["n_exact"] <= r["n_within_1pct"] <= r["n_orders"]
    assert (
        r["p50_abs_diff_micro"]
        <= r["p95_abs_diff_micro"]
        <= r["max_abs_diff_micro"]
    )


def test_tukey_pairs_complete(spark):
    """All C(5,2)=10 ordered pairs present, thresholds positive, and
    significance is exactly the threshold comparison."""
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_tukey_hsd_priority_pairs,
    )

    rows = q_tukey_hsd_priority_pairs(spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["prio_i"] < r["prio_j"]
        assert r["hsd_threshold_milli"] > 0
        assert r["significant"] == (
            r["mean_diff_milli"] > r["hsd_threshold_milli"]
        )


def test_mus_selection_properties(spark):
    """Fixed-size-by-construction sample: n_selected within 1 of the
    target; every certainty-stratum order is selected; value
    coverage far exceeds the count fraction (PPS)."""
    from ecom_churn_lakehouse_spark.queries.sampling_queries import (
        q_monetary_unit_sample,
    )

    r = q_monetary_unit_sample(spark, SF).collect()[0]
    assert 195 <= r["n_selected"] <= 201
    assert r["selected_cents"] <= r["total_cents"]
    assert r["n_certainty_stratum"] <= r["n_selected"]
    # PPS: 200 of n_pop orders should cover far more than 200/n_pop of value
    assert r["value_coverage_bp"] * r["n_pop"] > 10000 * r["n_selected"]


def test_session_gap_curve_monotone(spark):
    """Larger inactivity gaps can only merge sessions: counts are
    monotone non-increasing in the gap."""
    from ecom_churn_lakehouse_spark.queries.event_queries import (
        q_session_gap_sensitivity_curve,
    )

    rows = sorted(
        q_session_gap_sensitivity_curve(spark, SF).collect(),
        key=lambda r: r["gap_seconds"],
    )
    assert len(rows) == 5
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_sessions"] <= prev["n_sessions"]
        assert cur["n_events"] == prev["n_events"]
    for r in rows:
        assert r["n_sessions"] >= 1


def test_cpk_le_cp(spark):
    """Cpk <= Cp always (centering can only hurt)."""
    from ecom_churn_lakehouse_spark.queries.diagnostics_queries import (
        q_ship_delay_process_capability,
    )

    r = q_ship_delay_process_capability(spark, SF).collect()[0]
    assert r["cpk_milli"] <= r["cp_milli"]
    assert 0 <= r["out_of_spec_ppm"] <= 1_000_000


def test_stream_ph_equals_batch(spark):
    """The scalar-state streaming PH reconstruction must equal the
    one-shot batch statistic exactly."""
    from ecom_churn_lakehouse_spark.queries.analytics_queries import (
        q_page_hinkley_drift,
        q_stream_page_hinkley_maintenance,
    )

    batch = q_page_hinkley_drift(spark, SF).collect()[0].asDict()
    stream = q_stream_page_hinkley_maintenance(spark, SF).collect()[0].asDict()
    assert batch == stream


def test_bh_rejects_superset_of_holm(spark):
    """BH (FDR) always rejects at least what Holm (FWER) rejects, and
    rejections are exactly ranks 1..k_star."""
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_bh_fdr_brand_screen,
        q_holm_stepdown_brand_screen,
    )

    bh = {r["brand"]: r for r in q_bh_fdr_brand_screen(spark, SF).collect()}
    holm = {
        r["brand"]: r["holm_reject"]
        for r in q_holm_stepdown_brand_screen(spark, SF).collect()
    }
    for brand, r in bh.items():
        if holm[brand]:
            assert r["bh_reject"]
        assert r["bh_reject"] == (r["rnk"] <= r["k_star"])


def test_kupiec_counts_consistent(spark):
    """Violations bounded by test days; LR non-negative."""
    from ecom_churn_lakehouse_spark.queries.analytics_queries import (
        q_var_backtest_kupiec,
    )

    r = q_var_backtest_kupiec(spark, SF).collect()[0]
    assert 0 <= r["n_violations"] <= r["n_test"]
    assert r["lr_milli"] >= 0
    assert r["n_cal"] > 0 and r["var_kd"] > 0


def test_dkw_band_contains_ecdf_and_monotone(spark):
    """Bands clamp to [0, 1e6], contain the point estimate, and the
    ECDF is monotone across deciles with F(decile p) >= p."""
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_ecdf_dkw_band,
    )

    rows = sorted(q_ecdf_dkw_band(spark, SF).collect(), key=lambda r: r["p_milli"])
    assert len(rows) == 9
    prev = -1
    for r in rows:
        assert 0 <= r["band_lo_ppm"] <= r["ecdf_ppm"] <= r["band_hi_ppm"] <= 1_000_000
        assert r["ecdf_ppm"] >= r["p_milli"] * 1000  # disc pick includes the mass
        assert r["ecdf_ppm"] >= prev
        prev = r["ecdf_ppm"]


def test_mann_kendall_pair_accounting(spark):
    """Pair count is n(n-1)/2 over days; |S| bounded by pair count."""
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_mann_kendall_trend,
    )

    r = q_mann_kendall_trend(spark, SF).collect()[0]
    assert r["n_pairs"] == r["n_days"] * (r["n_days"] - 1) // 2
    assert abs(r["s_stat"]) <= r["n_pairs"]


def test_friedman_rank_telescope(spark):
    """Rank sums over complete blocks telescope: sum of R_j equals
    b*k*(k+1)/2, so sum_r2 >= that bound's Cauchy-Schwarz minimum."""
    from ecom_churn_lakehouse_spark.queries.inference_queries import (
        q_friedman_test_brand_months,
    )

    r = q_friedman_test_brand_months(spark, SF).collect()[0]
    k, b = r["n_brands"], r["n_blocks"]
    assert k == 25 and b > 0
    total_ranks = b * k * (k + 1) // 2
    # Cauchy-Schwarz: sum R_j^2 >= (sum R_j)^2 / k
    assert r["sum_r2"] >= total_ranks * total_ranks // k
    assert r["friedman_chi2_milli"] >= 0


def test_ljung_box_nonnegative(spark):
    """Q is a sum of squares scaled positively: non-negative, and the
    nano term sum is bounded by max_lag * 1e9 (each r^2/(n-k) < 1)."""
    from ecom_churn_lakehouse_spark.queries.analytics_queries import (
        q_ljung_box_test,
    )

    r = q_ljung_box_test(spark, SF).collect()[0]
    assert r["q_milli"] >= 0
    assert 0 <= r["sum_term_nano"] <= r["max_lag"] * 1_000_000_000
