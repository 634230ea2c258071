"""SQL front door, widened: run existing dialect-portable oracle texts
VERBATIM through ``spark.sql`` over the cataloged views.

``sql_orders_summary`` / ``sql_top_parts_per_brand`` (extended_queries)
proved the mechanism on two shapes; this module routes the whole
dialect-portable TPC-H family through the same front: for each twin,
the Spark side is ``sources/catalog.py::run_sql(<text>)`` and the
DuckDB oracle is the SAME text, so a green row proves the engine's SQL
parser -> analyzer -> Catalyst path end-to-end on multi-join /
correlated-subquery / set-op / scalar-subquery / CASE-aggregation SQL —
not just that two hand-written plans happen to agree.

The reference exposes only the DataFrame API (SURVEY §1: zero SQL
strings); a reusable engine exposes both fronts over one plan space.
Catalyst sees the identical logical plan space either way, so
pushdown / pruning / AQE behave the same — the twins also pin that the
DataFrame entries and the SQL front agree with each other (both match
the same oracle rows).

Twin selection rule: an entry qualifies when its oracle text uses only
portable constructs (ANSI joins, CASE, EXISTS/NOT EXISTS, EXCEPT,
EXTRACT, date_trunc, FILTER(WHERE), scalar subqueries, DECIMAL casts).
DuckDB-specific texts (list_*, unnest-lambda, recursive CTEs) stay
DataFrame-only.
"""

from __future__ import annotations

from ecom_churn_lakehouse_spark.registry import _REGISTRY, register

#: DataFrame-registry entries whose oracle SQL is dialect-portable and
#: is re-run verbatim through the Spark SQL front.
_TWINS = [
    "pricing_summary",           # TPC-H Q1: CASE-free multi-agg scan
    "revenue_by_nation",         # Q5: 4-way join + date range
    "top_revenue_orders",        # Q3: join + group + order/limit
    "returned_revenue_by_customer",  # Q10: 4-way join, top-20
    "large_basket_customers",    # Q18: HAVING subquery join-back
    "sole_blame_suppliers",      # Q21 shape: FILTER(WHERE) aggregates
    "priority_line_counts",      # Q12: CASE-sum pivot
    "promo_revenue_share",       # Q14: conditional revenue share
    "small_lot_part_revenue",    # Q17: per-part threshold CTE
    "customers_without_orders",  # Q22 shape: NOT EXISTS anti-join
    "parts_in_heavy_lineitems",  # semi-join via EXISTS
    "returned_order_priorities", # Q4: EXISTS + group
    "nation_trade_flows",        # Q7: 6-way join + EXTRACT(YEAR)
    "lapsed_customers",          # EXCEPT set-op
    "peak_revenue_months",       # scalar-subquery max filter
    "high_value_share",          # CASE-share aggregation
    "significant_parts",         # Q11: scalar-subquery HAVING
    "forecast_revenue_change",   # Q6: pure scan-local scalar agg
    "national_market_share",     # Q8: market-share CASE ratio, 8 tables
    "product_profit_by_nation",  # Q9: profit regroup by nation x year
    "part_supplier_count",       # Q16: NOT IN + COUNT(DISTINCT)
    "concentrated_suppliers",    # Q20: FILTER(WHERE) conditional agg
    "scd2_priority_history",     # SCD2: named WINDOW, IS DISTINCT FROM, LEAD
    # round-6 qualifying additions
    "user_erasure_audit",        # IN-subquery cascade + scalar subquery
    "expanding_window_folds",    # DATE literals, conditional COUNT(CASE)
    "incremental_agg_maintenance",  # 3-way join + DECIMAL cents agg
    "join_cardinality_estimate",    # scalar subqueries + USING join + FLOOR/GREATEST
    "promo_chisq_independence",     # window marginals + LIKE + ordinal GROUP BY
    "brand_discount_elasticity_components",  # exact BIGINT component sums + shared FLOOR expr
    # round-6 extension batch qualifying additions
    "mannwhitney_u_quantity",       # cumulative-rank windows + DECIMAL(38,0) + shared sqrt expr
    "spearman_price_quantity_by_brand",  # doubled-average-rank windows per brand
    "simpsons_paradox_screen",      # signed DECIMAL numerators + global window sums
    # round-7 qualifying additions
    "kruskal_wallis_priority_spend",   # 5-way pivot agg + rank window + shared IEEE H
    "two_proportion_ztest_returns",    # fused conditional counts + shared pooled-z expr
    "brown_forsythe_priority_spend",   # percentile_disc WITHIN GROUP + fused pivot agg
    "granger_causality_screen",        # layered shared-text float pipeline over LAG window
    "cochran_armitage_trend_test",     # substring scores + fused trend-z agg
    "sprt_conversion_monitor",         # all-integer sequential trajectory windows
    "cramers_v_matrix",                # dense-spine joins + micro-quantized Pearson cells
    # round-8 qualifying additions
    "wilcoxon_signed_rank_spend",      # paired-diff doubled-rank window + shared z
    # round-9 qualifying additions
    "copurchase_degree_assortativity", # self-join graph build + scalar subquery + shared r
    "markov_entropy_rate",             # per-user LAG window + per-term DECIMAL ln sum
]


def _make_twin(base_name: str, text: str) -> None:
    # the twin evaluates the same logical plan, so it inherits the
    # base entry's bounded-global-window declaration (if any)
    base_bounded = _REGISTRY[base_name].bounded_frame

    @register(
        f"sql_{base_name}",
        text,
        doc=f"SQL front door twin of `{base_name}`: the SAME "
        "dialect-portable SQL text evaluated by spark.sql over the "
        "cataloged views (sources/catalog.py::run_sql) and verbatim "
        "by the DuckDB oracle — proves the parser/analyzer path on "
        "this shape and that the SQL front agrees with the DataFrame "
        "entry (both match the same oracle).",
        bounded_frame=base_bounded,
    )
    def _twin(spark, sf_dir, _text=text):
        from ecom_churn_lakehouse_spark.sources.catalog import run_sql

        return run_sql(spark, sf_dir, _text)


def _register_twins() -> None:
    # Runs at import time, after the DataFrame modules (this module is
    # imported last by registry._load_all), so every base entry exists.
    for name in _TWINS:
        entry = _REGISTRY.get(name)
        if entry is None or entry.oracle is None:  # pragma: no cover
            raise RuntimeError(f"SQL twin base missing oracle: {name}")
        _make_twin(name, entry.oracle)


_register_twins()


# Round-8 addition: the Bradley-Terry MM iteration chain through the
# SQL front. The text is shared up to the two spellings ANSI leaves
# dialect-specific — the wide-integer type (DECIMAL(38,0) vs HUGEINT)
# and the integer-division operator (DIV vs //); both sides are
# generated from ONE template (queries/decision_queries.py::_bt_sql),
# so the twin still pins parser -> analyzer -> Catalyst on a 20-CTE
# chained-iteration shape with window normalization.
def _register_bt_twin() -> None:
    from ecom_churn_lakehouse_spark.queries.decision_queries import _bt_sql

    @register(
        "sql_bradley_terry_brand_strengths",
        _bt_sql("duck"),
        doc="SQL front door twin of `bradley_terry_brand_strengths`: "
        "the SAME template-generated SQL (engine-split only in the "
        "wide-int type and integer-division operator) evaluated by "
        "spark.sql over the cataloged views and by the DuckDB "
        "oracle — proves the parser/analyzer path on the unrolled "
        "3-iteration MM CTE chain and that the SQL front agrees "
        "with the DataFrame entry.",
        bounded_frame="25-brand strength frame (3 fixed MM iterations)",
    )
    def _bt_twin(spark, sf_dir):
        from ecom_churn_lakehouse_spark.sources.catalog import run_sql

        return run_sql(spark, sf_dir, _bt_sql("spark"))


_register_bt_twin()


# Round-9 addition: twins for oracle texts that are dialect-portable
# MODULO the integer-division operator — the same one-token
# engine-split the Bradley-Terry twin established (`//` in DuckDB,
# `DIV` in Spark; both are exact integer floor division on the
# non-negative operands these texts use). The Spark side runs the
# oracle text with `//` -> ` DIV ` substituted; everything else is
# verbatim, so the twin still pins the parser/analyzer path on the
# full CTE shape.
_DIV_TWINS = [
    "ucb_arm_allocation",          # scalar-subquery argmax + ln/sqrt
    "ipw_ate_promo",               # signed-floor CASE + % remainder
    # (brier_murphy_decomposition stays DataFrame-only: its features
    # CTE uses DuckDB's date_diff('day', ...) spelling)
]


def _register_div_twins() -> None:
    for name in _DIV_TWINS:
        entry = _REGISTRY.get(name)
        if entry is None or entry.oracle is None:  # pragma: no cover
            raise RuntimeError(f"DIV twin base missing oracle: {name}")
        text = entry.oracle

        @register(
            f"sql_{name}",
            text,
            doc=f"SQL front door twin of `{name}`: the oracle text with "
            "the single dialect-specific token substituted (`//` -> "
            "`DIV`, both exact integer floor division here) evaluated "
            "by spark.sql over the cataloged views; the DuckDB oracle "
            "runs the original verbatim — the Bradley-Terry "
            "template-split discipline.",
            bounded_frame=entry.bounded_frame,
        )
        def _twin(spark, sf_dir, _text=text):
            from ecom_churn_lakehouse_spark.sources.catalog import run_sql

            return run_sql(spark, sf_dir, _text.replace("//", " DIV "))


_register_div_twins()
