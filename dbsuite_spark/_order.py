"""Round-2 driver-facing registration order (VERDICT r01 ask #4).

The round driver verifies keys in registration order under a per-round
budget — round 1 reached only 50 of 156 keys (CORRECTNESS_r01.json stops
mid-`operators/aggregates.py`), leaving categories B, C, E, F, G, I, J, L
entirely unverified. This module pins an explicit order:

- ``VERIFY_FIRST``: the 5 round-1 red keys (fixed this round — their green
  rows are the proof), then one representative per still-unverified
  category (so even a tight budget leaves no category without a real
  driver row), then every remaining unverified key grouped by category
  with cheap row-local categories (B) before heavier ones (streaming I).
- ``VERIFY_LAST``: the 45 keys the round-1 driver already hash-verified
  green — re-checking them is the lowest-value use of the budget.
- Keys added in later rounds and listed in neither land in the middle:
  after the backlog, before the already-proven tail.

Rotate per round: once CORRECTNESS_r02.json lands, move newly-green keys
into ``VERIFY_LAST`` and promote whatever is still unverified.
"""

from __future__ import annotations

VERIFY_FIRST: list[str] = [
    # round-1 driver-red keys, fixed this round — must re-verify first
    "fn_decimal_arith",
    "fn_array_core",
    "fn_array_higher_order",
    "fn_map_ops",
    "fn_string_regex_split",
    # one representative per unverified category (B C D E F G J K L I)
    "project_columns",
    "join_inner_equi",
    "agg_count_if",
    "win_row_number",
    "topk_global",
    "set_except_all",
    "udf_pandas_vectorized",
    "etl_analyze_stats",
    "dedup_near_minhash",
    "stream_tumbling_count",
    # category B — projection/filter/predicates
    "cte_recursive",
    "project_computed",
    "filter_comparison",
    "filter_boolean_logic",
    "filter_between",
    "filter_in_list",
    "filter_like",
    "filter_regexp",
    "filter_null_semantics",
    "distinct_rows",
    "case_when",
    "cast_expr",
    "filter_exists_subquery",
    "filter_not_exists",
    "scalar_subquery",
    "filter_in_subquery",
    # category C — joins
    "join_lateral",
    "join_left_outer",
    "join_right_outer",
    "join_full_outer",
    "join_left_semi",
    "join_left_anti",
    "join_cross",
    "join_theta_range",
    "join_broadcast_hint",
    "join_multiway_star",
    "join_self",
    "join_asof",
    "join_interval_overlap",
    "join_bucketed_colocate",
    "join_salted_skew",
    "join_dpp_partitioned",
    # category E — windows
    "win_nth_value",
    "win_ignore_nulls",
    "win_ratio_to_report",
    "win_rank_dense",
    "win_ntile",
    "win_lag_lead",
    "win_first_last",
    "win_running_total",
    "win_moving_avg",
    "win_range_frame",
    "win_percent_cume",
    "win_topk_per_group",
    # category F — sort/limit/top-k
    "sort_multi_key",
    "limit_fetch_first",
    "sample_fraction",
    # category G — set operations
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_intersect_all",
    "set_except",
    # category D — aggregates the round-1 budget never reached
    "agg_collect_sorted",
    "agg_string_concat",
    "pivot_values",
    "agg_min_max_by",
    "agg_bool_and_or",
    "agg_hll_sketch_merge",
    "unpivot_melt",
    "agg_mode_deterministic",
    "agg_regr",
    # category L — LLM-data-pipeline
    "dedup_exact",
    "dedup_exact_jaccard",
    "dedup_simhash",
    "dedup_near_embcos",
    "media_attach_binary",
    "media_decode_features",
    "media_frame_sample",
    "multimodal_join",
    "multimodal_quality_filter",
    "sim_search_cosine_topk",
    "knn_classify_majority",
    "sim_search_ann_lsh",
    "sim_search_ann_ivf",
    "sim_search_range",
    "text_tokenize_counts",
    "text_tfidf_topterms",
    "text_ngrams",
    "text_lang_profile",
    "text_langid_ngram",
    "text_quality_score",
    "text_token_count_bpe",
    "text_fingerprint",
    # category J — UDF/UDAF/UDTF
    "udf_python_scalar",
    "udf_sql_registered",
    "udaf_pandas_grouped",
    "udtf_python",
    # category I — streaming (slowest per key → end of the backlog)
    "stream_sliding_agg",
    "stream_session_window",
    "stream_watermark_append",
    "stream_dedup_watermark",
    "stream_stateful_custom",
    "stream_foreachbatch_sink",
    "stream_file_source",
    "stream_join_static",
    "stream_stream_join",
]

VERIFY_LAST: list[str] = [
    # hash-verified green by the round-1 driver (CORRECTNESS_r01.json)
    "etl_bulk_load",
    "etl_export",
    "etl_merge_upsert",
    "etl_scd2_dimension",
    "etl_schema_evolution",
    "etl_compaction",
    "sort_within_partitions",
    "etl_zorder_cluster",
    "etl_data_quality",
    "etl_script_runner",
    "etl_script_dag",
    "scan_parquet",
    "scan_csv_typed",
    "scan_json",
    "sink_parquet",
    "sink_csv",
    "catalog_introspect",
    "scan_jdbc",
    "etl_sql_format",
    "fn_string_similarity",
    "fn_bitwise",
    "fn_datetime_tz",
    "fn_url_parse",
    "fn_math",
    "fn_null_handling",
    "fn_conditional",
    "fn_hash_funcs",
    "fn_explode_unnest",
    "fn_json_extract",
    "fn_json_construct",
    "fn_string_core",
    "fn_date_extract",
    "fn_date_arith",
    "agg_groupby_basic",
    "agg_global",
    "agg_having",
    "agg_count_distinct",
    "agg_approx_count_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_filtered",
    "agg_stats",
    "agg_percentile_exact",
    "agg_percentile_approx",
]
