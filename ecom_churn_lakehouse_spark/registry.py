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


_REGISTRY: dict[str, Entry] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = Entry(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


#: Entries added or materially changed THIS round, listed first by
#: ``queries()``/``oracle_sql()`` so a driver that samples a fixed
#: number of entries front-to-back always exercises the newest work
#: (deliberate sample rotation — stale entries have multi-round green
#: history already).
NEW_IN_ROUND: list[str] = [
    # ---- round 7: directive-fix / previously-flagged entries FIRST ----
    # (VERDICT r6 rule: entries named in the previous round's "What's
    # wrong"/watch list go at the very front so the driver's 50-entry
    # front sample re-verifies them before any new work.)
    "churn_hazard_table",        # red r4+r5; fix landed r6, needs a driver row
    "simpsons_paradox_screen",   # r6 watch: K=10 probe 14.83 — BIGINT-partials fix this round
    "kmv_set_overlap_estimate",  # r6 watch: loaded-host 1x probe — re-probed idle this round
    # ---- round 7: new entries ----
    "repeated_span_exact_dedup",
    "image_perceptual_hashes",
    "image_phash_neardup_pairs",
    "mcnemar_paired_test",
    "chunk_stitch_overlap_pairs",
    "bpe_merge_learning",
    "file_compaction_plan",
    "incremental_span_dedup",
    "curation_keep_manifest",
    "stream_phash_dedup_maintenance",
    "kanon_generalization_ladder",
    "basket_rules_support_confidence",
    "span_dedup_savings_curve",
    "bpe_compression_curve",
    "order_count_overdispersion",
    "mutual_knn_graph",
    "array_setop_battery",
    "theil_sen_daily_revenue_trend",
    "horvitz_thompson_total",
    "kruskal_wallis_priority_spend",
    "abc_inventory_classes",
    "randomized_response_privacy",
    "pass_at_k_estimator",
    "kendall_tau_quantity_discount",
    "campaign_budget_knapsack",
    "ranking_ndcg_eval",
    "stream_cms_maintenance",
    "brown_forsythe_priority_spend",
    "decision_split_gini_screen",
    "two_proportion_ztest_returns",
    "markov_stationary_event_mix",
    "piecewise_trend_breakpoint",
    "granger_causality_screen",
    "apriori_triple_itemsets",
    "median_ci_order_statistic",
    "stream_transition_maintenance",
    "popularity_recommender_recall",
    "sort_key_advisor",
    "quality_filter_threshold_curve",
    "split_srm_check",
    "exact_matching_att",
    "ratio_metric_delta_ci",
    "market_hhi_by_segment",
    "shard_source_balance_audit",
    "experiment_power_mde",
    "discount_quantity_mediation",
    "conformal_spend_intervals",
    "seasonality_strength_decomposition",
    "newsvendor_stock_levels",
    "chunk_boundary_cohesion",
    "spend_tail_hill_estimator",
    "james_stein_brand_means",
    "two_pass_exact_percentile",
    "retention_decay_fit",
    "source_signature_terms_llr",
    "rake_keyphrases",
    "ipf_raking_weights",
    "near_zero_variance_screen",
    "cochran_armitage_trend_test",
    "capture_recapture_estimate",
    "sprt_conversion_monitor",
    "page_hinkley_drift",
    "lorenz_curve_deciles",
    "vocab_yule_k",
    "wasserstein_spend_distance",
    "interevent_weibull_shape",
    "boolean_query_search",
    "cramers_v_matrix",
    "quality_rater_agreement_kappa",
    "holm_stepdown_brand_screen",
    "order_total_reconciliation",
    "tukey_hsd_priority_pairs",
    "monetary_unit_sample",
    "session_gap_sensitivity_curve",
    "ship_delay_process_capability",
    "stream_page_hinkley_maintenance",
    "sql_cochran_armitage_trend_test",
    "sql_sprt_conversion_monitor",
    "sql_cramers_v_matrix",
    "bh_fdr_brand_screen",
    "var_backtest_kupiec",
    "ecdf_dkw_band",
    "mann_kendall_trend",
    "friedman_test_brand_months",
    "ljung_box_test",
    "sql_kruskal_wallis_priority_spend",
    "sql_two_proportion_ztest_returns",
    "sql_brown_forsythe_priority_spend",
    "sql_granger_causality_screen",
    # ---- round 6 ----
    "mannwhitney_u_quantity",
    "token_spell_variants",
    "zone_map_pruning_audit",
    "kmv_distinct_curve",
    "copurchase_link_prediction",
    "revenue_autocorr_components",
    "equidepth_histogram_stats",
    "churn_gains_table",
    "kcore_peeling_rounds",
    "rolling_median_daily_revenue",
    "promo_did_uplift",
    "stream_kmv_maintenance",
    "sql_mannwhitney_u_quantity",
    "sql_spearman_price_quantity_by_brand",
    "sql_simpsons_paradox_screen",
    "event_value_ohlc_hourly",
    "shapley_channel_attribution",
    "session_top_paths",
    "incremental_join_maintenance",
    "spell_blocking_quality_eval",
    "threshold_sweep_pr_curve",
    "bootstrap_ab_diff_ci",
    "embedding_density_clusters",
    "spearman_price_quantity_by_brand",
    "copurchase_community_modularity",
    "spend_ks_test",
    "categorical_topn_encoding",
    "shuffle_partition_advisor",
    "fim_span_stats",
    "ann_topk_diversity_filter",
    "prefix_cache_savings",
    "event_cooldown_dedup",
    "event_rate_spike_flags",
    "embedding_drift_by_dim",
    "orc_roundtrip_integrity",
    "neyman_allocation",
    "sql_brand_discount_elasticity_components",
    "golden_record_consolidation",
    "ann_filtered_topk",
    "scd2_asof_fact_join",
    "zorder_layout_audit",
    "brand_discount_elasticity_components",
    "sql_join_cardinality_estimate",
    "sql_promo_chisq_independence",
    "stream_checksum_maintenance",
    "chunk_dedup_savings",
    "neardup_split_leakage",
    "pareto_frontier_orders",
    "containment_neardup_pairs",
    "bloom_filter_fp_audit",
    "column_encoding_advisor",
    "join_cardinality_estimate",
    "table_checksum_by_segment",
    "snapshot_table_diff",
    "tcloseness_audit",
    "promo_chisq_independence",
    "bootstrap_mean_ci",
    "acctbal_variance_components",
    "functional_dependency_audit",
    "ldiversity_audit",
    "unit_value_index_decomposition",
    "cohort_ltv_curve",
    "order_interval_overlap_pairs",
    "ann_hamming_mih_topk",
    "knn_label_consensus",
    "token_zipf_constant",
    "cms_heavy_hitters",
    "largest_remainder_allocation",
    "user_activity_streaks",
    "revenue_max_drawdown",
    "weighted_median_price",
    "lsh_capped_neardup_pairs",
    "rank_function_battery",
    "revenue_cusum_changepoint",
    "dedup_savings_by_source",
    "rrf_hybrid_retrieval",
    "incremental_agg_maintenance",
    "embedding_dim_variance_screen",
    "dup_inflation_curve",
    "out_of_order_depth",
    "multi_touch_attribution",
    "user_erasure_audit",
    "skipgram_cooccurrence",
    "stream_agg_maintenance",
    "embedding_pq_codes",
    "ann_ivfpq_topk",
    "partition_layout_advisor",
    "expanding_window_folds",
    "benford_digit_audit",
    "installment_split_battery",
    "schema_evolution_union",
    "sql_user_erasure_audit",
    "sql_expanding_window_folds",
    "sql_incremental_agg_maintenance",
    "csv_roundtrip_integrity",
    "json_roundtrip_integrity",
    "aqp_sampled_revenue",
    "ann_nprobe_recall_curve",
    "winsorized_spend_stats",
    "rfm_segmentation",
    "neardup_cluster_chain_audit",
    "ship_delay_percentiles",
    "revenue_gini_by_nation",
    "event_value_twap",
    "stream_scd2_dimension",
    "doc_min_bigram_prob",
    "bucketed_colocated_join",
    # ---- round 5 (kept until CORRECTNESS_r06 confirms) ----
    "scd2_priority_history",
    "boolean_agg_battery",
    "percentile_disc_battery",
    "tokenizer_truncation_audit",
    "embedding_power_iteration",
    "image_channel_histogram",
    "sql_scd2_priority_history",
    "source_mixture_token_allocation",
    "curriculum_shard_ordering",
    "dataset_datasheet_by_source",
    "isotonic_calibration",
    "spend_quantile_transform",
    "lang_id_confusion",
    "null_ordering_battery",
    "neardup_threshold_curve",
    "packing_efficiency_report",
    "lsh_bucket_occupancy",
    "dau_wau_stickiness",
    "hourly_value_interpolated",
    # changed in round 5 (float-free oracle surfaces / exact-int fixes)
    "cross_source_neardup_matrix",
    "vocab_growth_checkpoints",
    "per_nation_order_sample",
    "audio_activity_windows",
    "corpus_curation",
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
