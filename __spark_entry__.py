"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in :mod:`paraslice_spark`; importing the operators
package populates the registry, and this module just re-exports it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import paraslice_spark.operators  # noqa: F401  (registers all queries)
from paraslice_spark.registry import ORACLES, QUERIES

# The driver grades the FIRST ~50 queries of this dict per round, so order
# encodes grading priority.  Round-7 re-tier (VERDICT r6 item #1, the LAST
# refresh of the cumulative sweep): after r4+r5+r6's 150 no-overlap driver
# verdicts, exactly 22 oracled names still lack any post-regeneration
# driver row (12 r1/r2-vintage tail + 10 r6-late additions) and 10
# rows-only names are owed their refresh.  Tier 0 (no tuple): queries ADDED
# in r7 — a first hash verdict beats any refresh.  Tier 1: the 22 oracled
# names owed their first post-regeneration hash verdict.  Tier 2: the 10
# rows-only-by-design names (a rows-only driver row carries no hash
# information, so they sit after every oracled first-verdict; the local
# rows-run gate covers them every session).  Tier 3: everything already
# graded r4/r5/r6 — standing fresh, tail position.  22 + 10 = 32 slots,
# leaving ~18 for r7 additions: CORRECTNESS_r07 completes the cumulative
# sweep — every declared query will then hold a post-regeneration verdict.
_T1_ORACLED_UNGRADED: tuple[str, ...] = (
    # the 10 r6-late oracled pack (no driver row yet) …
    "events_markov_transitions", "customer_rfm_segments",
    "part_abc_analysis", "graph_degree_distribution",
    "events_anomaly_mad", "events_seasonality_profile", "text_vocab_growth",
    "text_boilerplate_grams", "text_collocations_pmi",
    "events_interarrival_profile",
    # … then the 12 r1/r2-vintage tail (newest driver rows pre-date the r4
    # testdata regeneration; judge-verified green at 3 SFs every round).
    "agg_string_concat", "multimodal_decode_meta", "project_arithmetic",
    "reshape_unpivot", "filter_between_in_like", "filter_compound",
    "filter_null_semantics", "filter_regexp", "udf_grouped_map",
    "udf_pandas_vectorized", "udf_scalar_py", "udf_udtf_tokenize",
)
_T2_ROWSONLY_REFRESH: tuple[str, ...] = (
    "agg_approx_distinct", "agg_approx_quantile", "dedup_embedding_cosine",
    "parafac_cp_als", "parafac_cp_als_dist",
    "parafac_factors_a", "sample_bernoulli", "similarity_ivf_ann",
    "similarity_lsh_ann", "tucker_hosvd_core",
)
_T3_FRESH: tuple[str, ...] = (
    # r6-graded …
    "tensor_slices", "dedup_minhash_pairs",
    "q3_shipping_priority", "q10_returned_revenue", "q14_promo_share",
    "scan_parquet", "scan_projection", "join_star_5way",
    "join_broadcast_inner", "join_sortmerge_inner", "join_left_outer",
    "join_full_outer", "join_semi", "join_anti", "join_cross",
    "join_range_theta", "agg_rollup", "agg_stats",
    "q2_min_cost_supplier", "q8_market_share", "q9_product_type_profit",
    "q11_important_parts", "q12_late_lines_priority",
    "q13_customer_distribution", "q15_top_supplier",
    "q16_supplier_part_counts", "q17_small_quantity_revenue",
    "q19_discounted_revenue", "q20_bulk_shippers", "q21_waiting_suppliers",
    "q22_dormant_balances", "join_salted_skew", "multimodal_phash_pairs",
    "audit_constraints", "events_sessionized_funnel", "events_anomaly_zscore",
    "sample_split_train_val_test", "text_decontaminate",
    "pipeline_dataset_build", "graph_pagerank_knn", "graph_triangle_count",
    "similarity_signlsh_ann", "events_ab_test", "events_ab_cuped",
    "events_scd2_status", "agg_incremental_merge",
    "events_chi2_independence", "events_forecast_backtest",
    "text_zipf_fit", "window_cumulative_distinct",
    # … r5-graded …
    "agg_mode_deterministic", "q6_forecast_revenue", "q18_large_orders",
    "q4_priority_late_ship", "q7_volume_shipping",
    "multimodal_feature_extract", "events_funnel", "events_retention",
    "events_funnel_users", "events_topk_paths", "events_streaks",
    "dedup_edit_distance", "dedup_groups_star", "embedding_gram_matrix",
    "similarity_knn_graph", "dedup_incremental_fp", "dedup_simhash_bands",
    "sort_limit_offset", "sort_multikey_nulls", "stream_asof_join",
    "subquery_correlated_scalar", "subquery_in", "subquery_scalar",
    "tensor_build_coords", "text_langid", "text_ngrams", "text_profile",
    "text_quality", "text_tfidf", "text_wordcount", "topk_revenue",
    "scan_events_ts", "join_time_interval", "join_asof",
    "join_self_sequences", "stream_tumbling_counts", "stream_sliding_avg",
    "stream_session_windows", "stream_dedup_exact", "agg_count_distinct",
    "agg_multi_distinct", "agg_conditional", "agg_cube", "agg_global",
    "agg_grouping_sets", "agg_histogram", "agg_max_by", "agg_percentile",
    "agg_pivot", "agg_pricing_summary",
    # … r4-graded.
    "agg_money_split_sum", "agg_salted_skew", "agg_hll_sketch_merge",
    "agg_stats_bivariate", "q5_local_supplier_volume",
    "multimodal_resize_meta", "multimodal_frame_sample", "events_sessionize",
    "sample_temperature", "scalar_variant_pack", "similarity_ivfpq_ann",
    "dedup_groups", "pipeline_curriculum", "text_token_stats",
    "text_unigram_logprob", "window_ranking", "window_topn_per_group",
    "window_lag_lead", "window_running_sum", "window_moving_avg",
    "window_range_frame", "window_distribution",
    "window_distribution_partitioned", "window_first_last",
    "text_fingerprint", "scalar_array_pack", "scalar_json_pack",
    "agg_collect_list_ordered", "agg_collect_set", "agg_decimal_money",
    "dedup_exact", "dedup_ngram_jaccard", "embedding_label_stats",
    "events_hourly_gapfill", "join_right_outer", "multimodal_join",
    "sample_stratified_hash", "scalar_bitwise_pack", "scalar_cast_pack",
    "scalar_conditional_pack", "scalar_datetime_pack", "scalar_math_pack",
    "scalar_string_pack", "set_except", "set_except_all", "set_intersect",
    "set_intersect_all", "set_union_all", "set_union_distinct",
    "similarity_topk_cosine",
)


def _rotated(d: dict) -> dict:
    """Order queries by grading priority (tier comment above)."""
    tier = {}
    for t, names in enumerate(
        (
            _T1_ORACLED_UNGRADED,
            _T2_ROWSONLY_REFRESH,
            _T3_FRESH,
        ),
        start=1,
    ):
        for i, n in enumerate(names):
            tier[n] = (t, i)
    keys = sorted(d, key=lambda k: tier.get(k, (0, 0)))
    return {k: d[k] for k in keys}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.4) on /root/testdata/sf0.001."""
    return QUERIES["q3_shipping_priority"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _rotated(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each hash-checkable query; non-SQL-expressible
    ops are intentionally absent (driver records rows-only)."""
    return _rotated(ORACLES)
