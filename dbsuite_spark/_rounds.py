"""Canonical per-round key-addition lists — ONE copy, imported by
every consumer (tools/rotate_order.py PRIORITY, the partition-invariance
suite's KEYS) so the lists cannot silently drift when a round lands
(ADVICE r10 #5: the round-10 list was hand-duplicated in three files).

Hand-maintained: append a list when a round adds keys; never edit past
rounds (they are certification history)."""

from __future__ import annotations

# Round-10 lakehouse-commit tier (VERDICT r09 ask)
ROUND10_LAKEHOUSE: list[str] = [
    "etl_merge_cow_manifest",
    "etl_manifest_cdc",
    "etl_multi_table_txn",
]

# Round-10 continuation additions
ROUND10_CONTINUATION: list[str] = [
    "ml_isotonic_calibration",
    "ml_bradley_terry_fixed",
    "docs_cdc_chunk_dedup",
    "sim_search_graph_beam",
    "ts_dtw_distance",
    "agg_xi_correlation",
    "ml_decision_tree_depth2",
    "graph_random_walk_fixed",
    "sim_search_filtered_ann",
    "ml_embedding_whitening",
    "etl_vacuum_orphan_files",
    "sample_weighted_reservoir",
    "ml_learning_curve_points",
]

ROUND10_KEYS: list[str] = ROUND10_LAKEHOUSE + ROUND10_CONTINUATION

# Round-13 additions (this round)
ROUND13_KEYS: list[str] = [
    "etl_manifest_ckpt_stats_multi",
    "stream_log_tail",
    "etl_manifest_compact_optimize",
    "etl_manifest_vacuum",
]

# Round-12 additions
ROUND12_KEYS: list[str] = [
    "etl_manifest_checkpoint",
    "stream_dv_delete",
    "etl_manifest_asof_read",
    "etl_manifest_ckpt_stats_skip",
]

# Round-11 additions
ROUND11_KEYS: list[str] = [
    "etl_manifest_schema_evolution",
    "stream_manifest_sink",
    "sim_search_ivf_append",
    "etl_manifest_deletion_vectors",
    "etl_manifest_wap_branch",
    "sim_search_ivf_delete",
    "stream_foreachbatch_merge",
    "etl_manifest_incremental_read",
    "rec_next_event_markov",
]
