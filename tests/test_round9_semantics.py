"""Semantic invariants of the round-9 operators (SURVEY §5.3.3 style):
laws that must hold beyond the fixture hash — funnel-mode dominance,
decomposition re-additivity, salted/direct equality under a different
salt width, weighted-vs-hop distance ordering, shard budget bounds, and
DP noise-scale structure."""

from __future__ import annotations

import pytest

import dbsuite_spark

SPECS = dbsuite_spark.all_specs()


def _rows(spark, sf_dir, key):
    return SPECS[key].fn(spark, sf_dir).collect()


def test_any_match_funnel_dominates_greedy(spark, sf_dir):
    """Existence semantics can only ADD qualifying users at every step:
    any-match counts >= greedy counts, and step counts are monotone
    non-increasing down each funnel."""
    greedy = {r["step"]: r["users"] for r in _rows(spark, sf_dir, "events_funnel_conversion")}
    anym = {r["step"]: r["users"] for r in _rows(spark, sf_dir, "events_funnel_any_match")}
    assert set(greedy) == set(anym)
    for step in greedy:
        assert anym[step] >= greedy[step], step
    for d in (greedy, anym):
        assert d["step1_view"] >= d["step2_click"] >= d["step3_purchase"]


def test_stl_components_readd_to_series(spark, sf_dir):
    """v = trend + seasonal + residual up to the single 6-dp rounding
    applied to the detrended value (|error| <= 5e-7)."""
    for r in _rows(spark, sf_dir, "ts_stl_decompose"):
        err = abs(r["v"] - (r["trend"] + r["seasonal"] + r["residual"]))
        assert err <= 5e-7, (r["event_type"], r["hour_ts"], err)


def test_salted_agg_equals_direct_under_any_salt_width(spark, sf_dir, monkeypatch):
    """The two-stage rewrite must be value-identical for ANY salt
    fan-out (mergeable order-free state): 1 salt (degenerate) == 16
    salts == direct groupBy."""
    import dbsuite_spark.operators.aggregates as agg

    def run():
        return {
            r["l_returnflag"]: (r["n_rows"], r["sum_qty"], r["sum_price"])
            for r in agg.agg_salted_two_stage(spark, sf_dir).collect()
        }

    base = run()
    monkeypatch.setattr(agg, "SALT_BUCKETS", 1)
    assert run() == base, "salt width must never change the result"
    monkeypatch.setattr(agg, "SALT_BUCKETS", 7)
    assert run() == base


def test_weighted_sssp_dominates_hop_count(spark, sf_dir):
    """Edge weights are >= 1 (interaction counts), so the weighted
    distance of any reached node is >= its BFS hop distance; both
    searches run from the same seed."""
    hops = {r["node"]: r["hop"] for r in _rows(spark, sf_dir, "graph_sssp_hops")}
    wdist = {r["node"]: r["dist"] for r in _rows(spark, sf_dir, "graph_weighted_sssp")}
    common = set(hops) & set(wdist)
    assert common, "both searches must reach a shared node set"
    for n in common:
        assert wdist[n] >= hops[n], n


def test_weighted_sssp_converged_at_bf_rounds(spark, sf_dir, monkeypatch):
    """A fifth relaxation round changes NOTHING: the BF_ROUNDS=4
    Bellman-Ford has converged on this graph, so reported distances
    are true shortest distances — not merely min cost over <=4-edge
    paths, which weighted search could otherwise under-serve even on a
    diameter-3 graph (longer-hop cheaper routes, ADVICE r09 #3). The
    hash oracle unrolls the same rounds and cannot see this."""
    from dbsuite_spark.pipeline import graph_paths

    base = sorted(map(tuple, _rows(spark, sf_dir, "graph_weighted_sssp")))
    monkeypatch.setattr(
        graph_paths, "BF_ROUNDS", graph_paths.BF_ROUNDS + 1
    )
    extra = sorted(map(tuple, _rows(spark, sf_dir, "graph_weighted_sssp")))
    assert extra == base, "extra round changed distances — not converged"


def test_shard_assignment_respects_budget_and_contiguity(spark, sf_dir):
    """Every shard except possibly the last stays within budget + one
    document (a doc never splits); doc ranges are contiguous and
    non-overlapping in shard order; totals conserve the corpus."""
    from dbsuite_spark.pipeline.packing import SHARD_BYTES
    from dbsuite_spark.tables import t

    rows = sorted(
        _rows(spark, sf_dir, "docs_shard_assign_prefix_sum"),
        key=lambda r: r["shard_id"],
    )
    docs = t(spark, sf_dir, "documents")
    n_docs, total_bytes, max_doc = docs.selectExpr(
        "count(*)", "sum(n_chars)", "max(n_chars)"
    ).first()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["n_bytes"] for r in rows) == total_bytes
    for r in rows:
        assert r["n_bytes"] <= SHARD_BYTES + max_doc, r["shard_id"]
    for prev, cur in zip(rows, rows[1:]):
        assert prev["last_doc"] < cur["first_doc"], "shards must not interleave"


def test_dp_noise_scale_and_determinism(spark, sf_dir):
    """The Laplace draw is a pure function of the group key: re-running
    yields identical noise; noisy = true + noise exactly; epsilon rides
    along as declared."""
    from dbsuite_spark.etl.quality import DP_EPSILON

    a = {(r["c_nationkey"], r["c_mktsegment"]): r for r in _rows(spark, sf_dir, "etl_dp_noisy_counts")}
    b = {(r["c_nationkey"], r["c_mktsegment"]): r for r in _rows(spark, sf_dir, "etl_dp_noisy_counts")}
    assert set(a) == set(b)
    for k in a:
        assert a[k]["noise"] == b[k]["noise"], "noise must be deterministic"
        assert a[k]["noisy_count"] == a[k]["true_count"] + a[k]["noise"]
        assert a[k]["epsilon"] == DP_EPSILON


def test_hw_backtest_wape_is_ratio_of_reported_sums(spark, sf_dir):
    """WAPE must equal the reported error/actual sums' ratio exactly
    (one mirrored division), and n_eval equals the holdout width."""
    from dbsuite_spark.operators.analytics import HW_HOLDOUT

    for r in _rows(spark, sf_dir, "ts_holt_winters_backtest"):
        assert r["n_eval"] == HW_HOLDOUT
        assert r["wape"] == r["sum_abs_err"] / r["sum_abs_actual"]


def test_partition_evolution_conserves_rows(spark, sf_dir):
    """A layout migration must move zero rows: both versions count the
    full orders table; the finer scheme has at least as many
    partitions."""
    rows = {r["version"]: r for r in _rows(spark, sf_dir, "etl_partition_evolution")}
    assert rows[0]["n_rows"] == rows[1]["n_rows"]
    assert rows[1]["n_partitions"] >= rows[0]["n_partitions"]


def test_time_travel_expire_report_consistent(spark, sf_dir):
    """The expired version's manifest-stats count must equal what a
    pre-expiry read would have seen (the full base snapshot), and
    retained counts must be subsets in the delete chain."""
    rows = {r["version"]: r for r in _rows(spark, sf_dir, "etl_time_travel_expire")}
    assert rows[0]["status"] == "expired"
    assert rows[1]["status"] == rows[2]["status"] == "retained"
    assert rows[0]["n_rows"] >= rows[1]["n_rows"] >= rows[2]["n_rows"]


@pytest.mark.parametrize("key", ["etl_occ_write_conflict"])
def test_occ_conflict_report_shape(spark, sf_dir, key):
    """Exactly one conflict row, committed rows carry counts, the
    loser's retry lands on the next version number."""
    rows = _rows(spark, sf_dir, key)
    conflicts = [r for r in rows if r["outcome"] == "conflict"]
    committed = [r for r in rows if r["outcome"] == "committed"]
    assert len(conflicts) == 1 and conflicts[0]["n_rows"] is None
    assert {r["version"] for r in committed} == {2, 3}
    assert all(r["n_rows"] is not None for r in committed)
    retry = next(r for r in committed if r["writer"] == "B")
    assert retry["base_version"] == 2 and retry["attempt"] == 2


def test_time_travel_read_and_expire_agree_on_shared_version(spark, sf_dir):
    """Cross-key law: version 1 (orders minus open 'F' status) is
    computed independently by the read key and the expire key — the
    counts must agree exactly."""
    read_rows = {r["version"]: r for r in _rows(spark, sf_dir, "etl_time_travel_read")}
    exp_rows = {r["version"]: r for r in _rows(spark, sf_dir, "etl_time_travel_expire")}
    assert read_rows[1]["n_rows"] == exp_rows[1]["n_rows"]
    # and version 0 (the full snapshot) matches expire's audit stats
    assert read_rows[0]["n_rows"] == exp_rows[0]["n_rows"]


def test_occ_winner_matches_time_travel_version1(spark, sf_dir):
    """The OCC winner commits the same transform (retire 'F' orders)
    as time-travel version 1 — row counts must agree."""
    occ = {(r["writer"], r["attempt"]): r for r in _rows(spark, sf_dir, "etl_occ_write_conflict")}
    tt = {r["version"]: r for r in _rows(spark, sf_dir, "etl_time_travel_read")}
    assert occ[("A", 1)]["n_rows"] == tt[1]["n_rows"]


def test_file_skipping_agrees_with_full_scan_filter(spark, sf_dir):
    """Manifest pruning must be invisible to results: the pruned
    aggregate equals a plain filtered aggregate over the raw table."""
    from dbsuite_spark.etl.loaders import _SKIP_HI, _SKIP_LO
    from dbsuite_spark.tables import t
    from pyspark.sql import functions as F

    pruned = _rows(spark, sf_dir, "etl_manifest_file_skipping")[0]
    direct = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").between(_SKIP_LO, _SKIP_HI))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("s"),
        )
        .first()
    )
    assert pruned["n_rows"] == direct["n"]
    assert pruned["sum_total"] == direct["s"]
    assert pruned["files_read"] + pruned["files_skipped"] == pruned["files_total"]


def test_contrastive_pairs_structure(spark, sf_dir):
    """Every anchored doc gets exactly one positive (itself, cosine
    within fold-noise of 1) and NEG_K negatives that are never the
    anchor."""
    from dbsuite_spark.pipeline.multimodal import NEG_K

    rows = _rows(spark, sf_dir, "multimodal_contrastive_pairs")
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, prs in by_doc.items():
        pos = [r for r in prs if r["label"] == 1]
        neg = [r for r in prs if r["label"] == 0]
        assert len(pos) == 1 and pos[0]["vec_id"] == doc
        assert abs(pos[0]["cos_sim"] - 1.0) < 1e-9
        assert len(neg) == NEG_K
        assert all(r["vec_id"] != doc for r in neg)
        assert {r["neg_slot"] for r in neg} == set(range(1, NEG_K + 1))


def test_media_dedup_clusters_partition_the_corpus(spark, sf_dir):
    """Cluster copy counts sum to the document count and keepers are
    cluster members (keeper <= any doc hashing there, by min)."""
    from dbsuite_spark.tables import t

    rows = _rows(spark, sf_dir, "media_dedup_binary_hash")
    n_docs = t(spark, sf_dir, "documents").count()
    assert sum(r["n_copies"] for r in rows) == n_docs
    assert all((r["n_copies"] > 1) == r["is_duplicate_cluster"] for r in rows)
