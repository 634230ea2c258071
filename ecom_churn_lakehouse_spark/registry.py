"""Query registry — the single source of truth behind ``__spark_entry__``.

Each entry pairs a Spark plan (``fn(spark, sf_dir) -> DataFrame``) with
the ANSI-SQL oracle DuckDB runs over the same parquet tables. Column
names/types are aligned on both sides (the driver hashes values under
name-sorted columns). Entries without an oracle (``oracle=None``) are
the genuinely non-SQL-expressible ops; the driver records rows-only
checks for those.

Every entry cites the reference behavior it reproduces (SURVEY.md §2
row ids) or the extension surface it adds (§7.7).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

#: Fixed snapshot date for the churn workload: inside the fixture's
#: order-date range (1995-01-01..2001-08-01) with a fully observable
#: 60-day label horizon.
AS_OF = "1997-06-30"
HORIZON_DAYS = 60


@dataclass(frozen=True)
class Entry:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    #: REQUIRED for any entry whose physical plan contains a
    #: partition-less Window (single-partition sort): a short statement
    #: of why the windowed frame is bounded independently of corpus
    #: size (e.g. "calendar^2 day pairs", "B=32 replica rows",
    #: "25-brand dimension"). tools/audit_plans.py flags any
    #: undeclared occurrence as a plan smell, and
    #: tests/test_plan_smells.py asserts it for NEW_IN_ROUND — the
    #: boundedness argument is a checked invariant, not prose
    #: (VERDICT r7 directive #3).
    bounded_frame: str | None = None


#: Checked boundedness declarations (VERDICT r7 directive #3): every
#: entry whose physical plan contains a partition-less Window operator
#: must state here (or via the ``register(bounded_frame=...)`` kwarg)
#: why the windowed frame is bounded independently of corpus size, or
#: what the documented approximate scale path is. ``tools/
#: audit_plans.py`` flags any plan-detected global window with no
#: declaration (and any stale declaration with no window);
#: ``tests/test_plan_smells.py`` asserts the invariant over
#: ``NEW_IN_ROUND``.
BOUNDED_FRAMES: dict[str, str] = {
    # calendar-bounded day/tenure grains (~2.4k rows at any SF)
    "churn_hazard_table": "tenure-day grain, calendar-bounded",
    "theil_sen_daily_revenue_trend": "calendar^2 day-pair frame (~2.9M rows at any SF)",
    "granger_causality_screen": "calendar-bounded day frame",
    "sql_granger_causality_screen": "calendar-bounded day frame (SQL front twin)",
    "page_hinkley_drift": "calendar-bounded day frame",
    "revenue_cusum_changepoint": "calendar-bounded day frame",
    "revenue_max_drawdown": "ship-day grain (~2.5k rows at any SF)",
    "piecewise_trend_breakpoint": "calendar-bounded day x month-candidate frame",
    "sprt_conversion_monitor": "calendar-bounded day trajectory",
    "sql_sprt_conversion_monitor": "calendar-bounded day trajectory (SQL front twin)",
    "event_rate_spike_flags": "calendar-bounded hour frame",
    "kmv_distinct_curve": "k-minima sketch frame (mergeable; TakeOrderedAndProject)",
    "stream_kmv_maintenance": "k-minima sketch frame (batch-twin shape)",
    "cms_heavy_hitters": "CMS sketch cells + top-20 probe frame",
    "stream_cms_maintenance": "CMS sketch cells + top-20 probe frame (batch twin)",
    # distinct-value / price-domain grains (saturate at the finite
    # cents/quantity domain; range-partitionable like the deciles path)
    "kruskal_wallis_priority_spend": "distinct-cents rank grain (price-domain-saturating)",
    "sql_kruskal_wallis_priority_spend": "distinct-cents rank grain (SQL front twin)",
    "mannwhitney_u_quantity": "distinct-quantity rank grain (50 values)",
    "sql_mannwhitney_u_quantity": "distinct-quantity rank grain (SQL front twin)",
    "spend_ks_test": "distinct-cents prefix-sum grain (price-domain-saturating)",
    "wasserstein_spend_distance": "distinct-cents cumulative grain (price-domain-saturating)",
    "two_pass_exact_percentile": "~100-bin histogram frame (pass 2 scans <= 3 bins)",
    "equidepth_histogram_stats": "deciles pattern: range-partitionable global sort, then bucket frame",
    "feature_auc_screen": "distinct-feature-value rank grain (feature-cardinality-sized)",
    "model_eval_metrics": "distinct-score rank grain (value-domain-sized)",
    # small-dimension frames (brands=25, nations=25, priorities=5, ...)
    "holm_stepdown_brand_screen": "25-brand family grain",
    "bh_fdr_brand_screen": "25-brand family grain",
    "bradley_terry_brand_strengths": "25-brand strength frame (3 fixed MM iterations)",
    "simpsons_paradox_screen": "|brands| pooled-component frame",
    "sql_simpsons_paradox_screen": "|brands| pooled-component frame (SQL front twin)",
    "promo_chisq_independence": "6-cell contingency frame",
    "sql_promo_chisq_independence": "6-cell contingency frame (SQL front twin)",
    "nation_revenue_share": "|nations| aggregated frame",
    "largest_remainder_allocation": "25-row nation aggregate",
    "neyman_allocation": "25-row stratum frame",
    "tcloseness_audit": "quasi-identifier cells x 5-value sensitive domain",
    "categorical_topn_encoding": "|categories| count frame, top-N cut",
    "near_zero_variance_screen": "per-feature value-domain frame",
    "column_encoding_advisor": "bucket-summary frame (n/8192 rows, boundary-merged)",
    "zone_map_pruning_audit": "|zone| summary rows, 3-row rollup",
    # dimension-table cumsums (part dimension ~fact/7000; scale path =
    # range-partitioned sort, documented in abc_inventory_classes)
    "abc_inventory_classes": "part-dimension revenue cumsum (range-partitioned sort at scale)",
    "campaign_budget_knapsack": "part-dimension ranked cumsum (abc_inventory_classes shape)",
    "pareto_frontier_orders": "aggregated candidate frame; semi-join back, no fact window",
    # B-replica / fixed-battery frames
    "bootstrap_mean_ci": "B=32 bootstrap replica frame",
    "bootstrap_ab_diff_ci": "B=32 bootstrap replica frame",
    "boolean_query_search": "posting lists of a fixed 4-term query battery",
    "rrf_hybrid_retrieval": "per-modality top-k fusion frame (index-bounded at scale)",
    "popularity_recommender_recall": "global top-20 sort-limit (TakeOrderedAndProject)",
    "copurchase_link_prediction": "degree-cut strong-edge wedge frame (scale-invariant selectivity)",
    "session_top_paths": "path-string count grain, top-k sort-limit",
    "token_zipf_constant": "vocabulary-sized count frame",
    "curation_keep_manifest": "corpus-stats scalar window (one row) + span-bucketed signals",
    "monetary_unit_sample": "single global cumsum over the audited population (MUS requires the total order; PPS-systematic selection is row-local after it)",
    # exactness-mandated global NTILE/rank over the customer/order
    # frame; documented approximate scale path = broadcast
    # approx_percentile cut-points (customer_value_deciles_scalable)
    "customer_value_deciles": "exactness-mandated NTILE; approx cut-point scale path documented",
    "churn_gains_table": "decile cut then 10-row windows; approx cut-point scale path",
    "decision_split_gini_screen": "global ntile to 10-row decile grain; range-partitionable",
    "lorenz_curve_deciles": "entity agg then global ntile; 10-row windows",
    "threshold_sweep_pr_curve": "NTILE cut frame, then 10-row windows",
    "order_value_quartile_stats": "exactness-forced global sort; approx cut-point path documented",
    "rfm_segmentation": "three rankings share one global sort; approx cut-point path",
    "spend_quantile_transform": "exactness baseline; broadcast-cutoff serving path documented",
    "temporal_train_val_split": "single time-ordered split boundary (one global rank over the snapshot grain; boundary is a broadcast scalar at scale)",
}

_REGISTRY: dict[str, Entry] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    bounded_frame: str | None = None,
):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        # Refuse silent name collisions: a second module registering
        # an existing name would quietly REPLACE the first entry (and
        # its oracle), so an author adding "a new operator" could
        # instead overwrite a long-green one — caught live in round 9
        # when a second dau_wau_stickiness shadowed the round-5 entry.
        # Same function re-registering (module re-imported under a
        # second path, e.g. by a test) stays legal.
        prev = _REGISTRY.get(name)
        if prev is not None and getattr(
            prev.fn, "__qualname__", None
        ) != getattr(fn, "__qualname__", None):
            raise ValueError(
                f"registry name collision: {name!r} is already "
                f"registered by {prev.fn.__module__}."
                f"{prev.fn.__qualname__}; refusing to replace it with "
                f"{fn.__module__}.{fn.__qualname__}"
            )
        _REGISTRY[name] = Entry(
            fn=fn,
            oracle=oracle,
            doc=doc,
            bounded_frame=bounded_frame or BOUNDED_FRAMES.get(name),
        )
        return fn

    return deco


#: Entries added or materially changed THIS round, listed first by
#: ``queries()``/``oracle_sql()`` so a driver that samples a fixed
#: number of entries front-to-back always exercises the newest work
#: (deliberate sample rotation — stale entries have multi-round green
#: history already).
NEW_IN_ROUND: list[str] = [
    # ---- round-12 front-50 (VERDICT r11 directive #3: drain the
    # never-driver-sampled backlog to <= 63/stretch 60 with >= 45
    # first-time rows; growth held to 1 new operator).
    # (a) entries CHANGED this round (the ONLY allowed resamples; 5
    #     slots): the adaptive band-geometry fix (r11 directive #1)
    #     touches the shared sign-LSH spelling behind these five
    #     previously-sampled entries — their outputs are bit-identical
    #     at driver SFs by construction (floor band_bits = 8), but the
    #     changed code re-verifies through the driver gate:
    "semdedup_keep_manifest",
    "semdedup_savings_by_source",
    "stream_semdedup_maintenance",
    "mutual_knn_graph",
    "mrr_retrieval_eval",
    #     (embedding_density_clusters — star-CC swap — and
    #     image_resize_feature_pipeline — fail-loud guard — also
    #     changed, but both changes are output-identical on healthy
    #     fixtures, locally re-oracled at sf0.01, and covered by
    #     FULLCHECK_r12 at both SFs; resample slots go to the
    #     band-geometry family.)
    # (b) changed AND never-driver-sampled (first-time rows that are
    #     also the band-fix verification — no resample slot cost):
    "ann_hamming_mih_topk",
    "knn_label_consensus",
    # (c) new round-12 operator (directive #5):
    "stream_er_maintenance",
    # (d) never-driver-sampled backlog, standing queue order (59
    #     entries remain queued for r13+):
    "promo_chisq_independence",
    "acctbal_variance_components",
    "rrf_hybrid_retrieval",
    "ann_nprobe_recall_curve",
    "stateful_user_profiles",
    "sql_high_value_share",
    "seasonality_strength_decomposition",
    "newsvendor_stock_levels",
    "two_pass_exact_percentile",
    "source_signature_terms_llr",
    "lorenz_curve_deciles",
    "vocab_yule_k",
    "wasserstein_spend_distance",
    "order_total_reconciliation",
    "monetary_unit_sample",
    "bootstrap_mean_ci",
    "unit_value_index_decomposition",
    "cohort_ltv_curve",
    "largest_remainder_allocation",
    "embedding_pq_codes",
    "installment_split_battery",
    "aqp_sampled_revenue",
    "revenue_gini_by_nation",
    "video_scene_cuts",
    "array_function_battery",
    "weighted_order_sample_wor",
    "table_checksum_by_segment",
    "snapshot_table_diff",
    "revenue_max_drawdown",
    "weighted_median_price",
    "revenue_cusum_changepoint",
    "incremental_agg_maintenance",
    "stream_agg_maintenance",
    "schema_evolution_union",
    "sql_incremental_agg_maintenance",
    "csv_roundtrip_integrity",
    "json_roundtrip_integrity",
    "winsorized_spend_stats",
    "rfm_segmentation",
    "asof_forward_tolerance",
    "orders_table_profile",
    "order_value_mad_outliers",
    # ---- beyond the 50-entry sample window: the r13+ queue ----
    "chunk_boundary_cohesion",
    "ipf_raking_weights",
    "near_zero_variance_screen",
    "capture_recapture_estimate",
    "containment_neardup_pairs",
    "bloom_filter_fp_audit",
    "column_encoding_advisor",
    "tcloseness_audit",
    "rank_function_battery",
    "out_of_order_depth",
    "multi_touch_attribution",
    "partition_layout_advisor",
    "benford_digit_audit",
    "event_sessions_capped",
    "copurchase_pagerank",
    "sprt_conversion_monitor",
    "boolean_query_search",
    "sql_sprt_conversion_monitor",
    "functional_dependency_audit",
    "ldiversity_audit",
    "order_interval_overlap_pairs",
    "token_zipf_constant",
    "cms_heavy_hitters",
    "user_activity_streaks",
    "dup_inflation_curve",
    "user_erasure_audit",
    "skipgram_cooccurrence",
    "expanding_window_folds",
    "sql_user_erasure_audit",
    "sql_expanding_window_folds",
    "ship_delay_percentiles",
    "boilerplate_paragraph_detection",
    "rolling_7d_active_users",
    "next_purchase_after_click",
    "event_props_struct",
    "session_peak_concurrency",
    "status_unpivot_by_year",
    "segment_modal_priority",
    "stream_session_windows",
    "skewsafe_user_enrichment",
    "last_purchase_ffill",
    "scalar_function_battery",
    "regex_function_battery",
    "temporal_train_val_split",
    "user_item_negative_samples",
    "priority_line_counts",
    "customer_order_count_dist",
    "returned_order_priorities",
    "cheapest_part_per_brand",
    "bpe_merge_candidates",
    "part_supplier_count",
    "split_leakage_audit",
    "sql_sole_blame_suppliers",
    "sql_priority_line_counts",
    "sql_customers_without_orders",
    "sql_parts_in_heavy_lineitems",
    "sql_returned_order_priorities",
    "sql_lapsed_customers",
    "sql_part_supplier_count",
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in NEW_IN_ROUND if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return _ordered({k: v.fn for k, v in _REGISTRY.items()})


def oracle_sql() -> dict[str, str]:
    _load_all()
    return _ordered(
        {k: v.oracle for k, v in _REGISTRY.items() if v.oracle is not None}
    )


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from ecom_churn_lakehouse_spark.queries import (  # noqa: F401
        advanced_queries,
        analytics_queries,
        apportion_queries,
        churn_queries,
        curation_queries,
        dataops_queries,
        decision_queries,
        dedup_queries,
        diagnostics_queries,
        event_queries,
        extended_queries,
        feature_queries,
        format_queries,
        governance_queries,
        inference_queries,
        graph_queries,
        hashing_queries,
        lifecycle_queries,
        multimodal_queries,
        relational_queries,
        retail_metrics_queries,
        sampling_queries,
        search_queries,
        shape_queries,
        similarity_queries,
        subquery_queries,
        text_queries,
        tpch_tail_queries,
        training_audit_queries,
        warehouse_queries,
    )

    # Imported LAST: the SQL-front-door twins re-register existing
    # entries' oracle texts through spark.sql, so every base entry
    # must already be in the registry.
    from ecom_churn_lakehouse_spark.queries import (  # noqa: F401
        sql_frontend_queries,
    )

    _LOADED = True
