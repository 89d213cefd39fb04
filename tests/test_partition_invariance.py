"""Partitioning-invariance property tests — the 100 TB claim, executed.

Nearly every key's docstring argues its aggregation is partition- and
order-invariant (decimal/integer-unit sums commute, XOR folds commute,
ordered folds pin their own order). This suite RUNS that claim: the same
key is planned under two very different shuffle widths (which changes the
physical partitioning, the partial-aggregate groupings, and row arrival
order) and the collected results must be IDENTICAL to the last bit —
exact float equality, no tolerance.

A failure here means an operator's result depends on how the cluster
splits the data: correct on the laptop, drifting on 1000 executors."""

from __future__ import annotations

import pytest

import dbsuite_spark

# Keys whose aggregation styles span every exactness discipline used in
# the package: decimal sums (flagship), integer units (pagerank, classify,
# PCA), XOR folds (fingerprint), ordered folds (ewma), hash-bucketed joins
# (substring dedup), and plain counting (welch moments).
KEYS = [
    "agg_groupby_basic",
    "etl_table_fingerprint",
    "graph_pagerank_fixed",
    "ml_centroid_classify",
    "ml_pca_power_iter",
    "ts_ewma",
    "dedup_substring_ngram",
    "events_ab_welch",
    "sim_search_pq_adc",
    "docs_semantic_dedup",
    "events_rfm_segmentation",
    "media_resize_pool",
    "ts_holt_linear",
    "graph_link_prediction_ra",
    "graph_label_propagation",
    "docs_length_curriculum",
    "ml_feature_standardize",
    "rec_copurchase_topk",
    "dedup_incremental_batch",
    "dedup_near_minhash",
    "ssb_q3_1",
    "ssb_q4_2",
    "agg_skew_kurtosis",
    "ml_linreg_normal_eq",
    "graph_kcore_fixed",
    "agg_skyline_pareto",
    "win_rolling_ols_slope",
    "win_budget_waterfall",
    "udf_pandas_window_agg",
    "text_stem_light",
    "ts_downsample_bucket_rep",
    "catalog_column_profile",
    "ts_ohlc_bars",
    "agg_corr_matrix",
    "set_symmetric_difference",
    "docs_oov_rate",
    "text_hash_features",
    "agg_weighted_median",
    "join_asof_forward",
    "text_bm25_score",
    "events_cumulative_adoption",
    "ml_auc_rank_eval",
    "ml_calibration_bins",
    "sim_hard_negatives",
    "events_kpi_scorecard",
    "ts_trend_mann_kendall",
    "events_chi_square_independence",
    "ml_split_gini_scores",
    "events_decay_score",
    "ts_max_drawdown",
    "ts_var_historic",
    "agg_percentile_grid_exact",
    "agg_geometric_mean_log",
    "docs_vocab_drift",
    "sim_search_rrf_fusion",
    "sim_search_ann_recall",
    "events_ks_test",
    "events_mannwhitney_u",
    "etl_row_level_delete",
    "events_cohort_ltv",
    "ts_autocorrelation",
    "ml_pit_feature_join",
    "events_markov_stationary",
    "ts_anomaly_mad",
    "agg_benford_profile",
    "events_bot_score",
    "etl_join_skew_report",
    "docs_zipf_fit",
    "ts_theil_sen_trend",
    "events_survival_km",
    "ts_rollup_multi_grain",
]

# Every §N TPC-H composite (VERDICT r03 ask #8): these are the queries a
# real user runs at 200 vs 2000 shuffle partitions, and they compose the
# most operators per key (multiway joins, decimal rollups, semi/anti
# subqueries) — bit-exact across widths or the 100 TB claim fails where
# users look first.
KEYS += sorted(k for k in dbsuite_spark.all_specs() if k.startswith("tpch_"))

# The round-4 driver front block (rotation order): the LLM-pipeline
# composites, cleaning trio, packing, media plumbing, and text extras —
# invariance proof lands alongside their first driver verification.
KEYS += [
    "pipeline_dedup_corpus",
    "pipeline_clean_corpus",
    "pipeline_quality_corpus",
    "text_html_strip",
    "text_remove_boilerplate",
    "text_repetition_score",
    "docs_pack_sequences",
    "docs_pack_stats",
    "docs_chunk_overlap",
    "sim_search_ann_ivf",
    "docs_contamination_check",
    "docs_split_leakage_check",
    "docs_train_test_split",
    "dedup_connected_components",
    "media_attach_binary",
    "media_decode_features",
    "media_frame_sample",
    "text_langid_ngram",
    "text_quality_score",
    "text_token_count_bpe",
    "text_fingerprint",
    "dedup_url_canonical",
    "docs_perplexity_buckets",
    "dedup_minhash_recall",
    "dedup_minhash_recall_sampled",
    "sim_knn_graph",
    "docs_knn_density_prune",
    "docs_knn_density_prune_sampled",
    "vocab_bpe_merges_fixed",
    "docs_bpe_encode_stats",
    "ml_farthest_point_init",
    "graph_bfs_layers_fixed",
    "docs_bigram_logprob_interp",
    "etl_t_closeness",
    "events_wilson_ctr_rank",
    "sim_ivf_probe_sweep",
    "win_session_dynamic_gap",
    "limit_keyset_pagination",
    "rec_item_jaccard_topk",
    "etl_time_travel_read",
    "graph_closeness_landmarks",
    "dedup_minhash_band_sweep",
    "scan_csv_delimiter_quote",
    "sim_dim_truncation_recall",
    "sim_pq_recall",
    "ml_kfold_assign",
    "unpivot_stack",
    "sim_search_two_stage",
    "sim_knn_graph_recall",
    "sql_transpose_frame",
    "agg_bootstrap_ci_poisson",
    "events_sprt_sequential",
    "graph_hits_fixed",
    "sim_ivf_build_stats",
    "docs_lang_temperature_mix",
    "text_token_entropy",
    "dedup_cluster_stats",
]

# Round-5 continuation batches: the experimentation/eval tier (filtered
# counts + mirrored divisions), compressed-ranking bins, geo trig
# rounding, ER blocking + survivorship, NB's rounded-log decimal sums,
# and the window/diff families — each a distinct exactness discipline
# whose invariance claim should be executed, not just argued.
KEYS += [
    "events_proportion_ztest",
    "ts_cross_correlation",
    "win_conditional_running",
    "events_attribution_linear",
    "ml_feature_quantile_bin",
    "ml_target_encode_smooth",
    "ml_confusion_matrix",
    "graph_assortativity",
    "etl_k_anonymity",
    "ml_lift_curve",
    "ml_psi_drift",
    "ml_roc_points",
    "events_time_to_convert",
    "text_keyword_rake",
    "fn_geo_haversine",
    "join_geo_radius_grid",
    "events_apdex_score",
    "graph_community_modularity",
    "etl_l_diversity",
    "er_fuzzy_match_blocked",
    "er_golden_record",
    "rec_assoc_rules",
    "ts_wape_eval",
    "ts_sma_crossover",
    "ts_gap_report",
    "ml_naive_bayes_langid",
    "agg_rollup_share_of_parent",
    "limit_fetch_with_ties",
    "text_inverted_index",
    "agg_variance_bridge",
    "events_ucb_allocation",
    "ml_cohens_kappa",
    "ts_diff_second_order",
    "ml_quantile_normalize",
    "events_contingency_residuals",
    "events_user_entropy",
    "docs_hapax_ratio",
    "events_heatmap_dow_hour",
    "events_power_analysis",
    "etl_mask_pii_display",
]

# Round-6 additions: cluster-scoped SemDeDup (per-cell GEMM pair stage),
# the MinHash estimator dashboard (min-of-hash folds), the exact-k hash
# reservoir (TakeOrdered cutoff), the SRM gate (distinct + filtered
# counts), and the JSONL round trip (line-split read-back).
KEYS += [
    "docs_semantic_dedup_ivf",
    "dedup_minhash_estimate_error",
    "sample_reservoir_hash",
    "events_srm_check",
    "sink_jsonl",
    "ml_ndcg_eval",
    "docs_semdedup_cell_recall",
    "events_ab_cuped",
    "events_diff_in_diff",
    "ts_bollinger_bands",
    "fn_struct_ops",
]

# Round-9 additions: the manifest retention key mixes driver-side
# metadata rows with re-read parquet counts — invariance proves the
# report is partitioning-independent on both paths.
KEYS += [
    "etl_time_travel_expire",
    "etl_occ_write_conflict",
    "etl_manifest_file_skipping",
    "rec_user_cf_topk",
    "ts_stl_decompose",
    "events_funnel_any_match",
    "docs_span_corruption",
    "agg_salted_two_stage",
    "ts_holt_winters",
    "pipeline_attrition_report",
    "etl_dp_noisy_counts",
    "graph_weighted_sssp",
    "docs_shard_assign_prefix_sum",
    "ts_holt_winters_backtest",
    "etl_partition_evolution",
    "media_dedup_binary_hash",
    "multimodal_contrastive_pairs",
]

# Round-10 additions (canonical list in dbsuite_spark._rounds; ADVICE
# r10 #5): COW merge mixes a manifest-pruned rewrite with by-reference
# carries; CDC row-diffs only changed file groups; the MM fold
# (Bradley-Terry) and the beam cuts order their own inputs (array_sort
# folds, (cos, id) windows); the CDC chunker is row-local; the isotonic
# minimax is bin-bounded — all must be bit-identical however the corpus
# shuffles.
from dbsuite_spark._rounds import (  # noqa: E402
    ROUND10_KEYS,
    ROUND11_KEYS,
    ROUND12_KEYS,
    ROUND13_KEYS,
)

KEYS += ROUND10_KEYS

# Round-11 additions: the schema-evolution read name-aligns groups by
# field id and the manifest sink folds commit-ordered groups — both
# reports must be identical however the scans and summaries partition.
KEYS += ROUND11_KEYS

# Round-12 additions: the checkpointed fold and the DV merge-on-read
# anti-join must be identical however the group scans partition.
KEYS += ROUND12_KEYS

# Round-13 additions: multi-column pruning, the change-feed tail's
# per-version re-publication, OPTIMIZE's rewrite fold, and the
# post-vacuum reads all fold multi-path scans whose results must be
# identical however the scans partition.
KEYS += ROUND13_KEYS


def _rows(spark, sf_dir, key, width):
    # Drop the session memo cache so BOTH widths recompute the full
    # plan — memo keys don't vary with partitioning, so without this
    # the second width would reuse the first width's cached substrate
    # and the invariance assertion would be vacuous for that sub-plan
    # (ADVICE r09 #5).
    from dbsuite_spark.tables import clear_session_cache

    clear_session_cache(spark)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(width))
    try:
        df = dbsuite_spark.all_specs()[key].fn(spark, sf_dir)
        # None-safe sort key: rollup/outer-join keys carry NULLs, which
        # Python's default tuple ordering refuses to compare.
        return sorted(
            (tuple(r) for r in df.collect()),
            key=lambda r: tuple((v is None, v) for v in r),
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("key", KEYS)
def test_result_identical_across_shuffle_widths(key, spark, sf_dir):
    narrow = _rows(spark, sf_dir, key, 2)
    wide = _rows(spark, sf_dir, key, 37)
    assert narrow == wide, (
        f"{key}: result depends on partitioning — "
        f"{sum(a != b for a, b in zip(narrow, wide))} rows differ"
    )
