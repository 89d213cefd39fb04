"""Category L extension — classifier evaluation over pipeline outputs.

``text_langid_eval`` closes the loop on the language-ID heuristic: its
predictions are scored against the labeled ``lang`` column as a
confusion matrix with per-pair corpus shares — the evaluation artifact a
data-quality dashboard tracks release-over-release. The oracle COMPOSES
the already-verified ``text_langid_ngram`` oracle as a CTE (registry
spec reuse), so the eval's truth derives from the same verified
prediction semantics on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbsuite_spark.pipeline import dedup as D
from dbsuite_spark.pipeline import quantization as Q
from dbsuite_spark.pipeline import similarity as S
from dbsuite_spark.pipeline.text_extra import text_langid_ngram
from dbsuite_spark.registry import query, spec
from dbsuite_spark.tables import memo_cache, t

_PRED_ORACLE = spec("text_langid_ngram").oracle

_EVAL_ORACLE = f"""
WITH pred AS ({_PRED_ORACLE}),
cells AS (
  SELECT lang AS true_lang, predicted AS pred_lang,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM pred GROUP BY 1, 2),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cells)
SELECT true_lang, pred_lang, n,
       CAST(n AS DOUBLE) / total AS share,
       true_lang = pred_lang AS correct
FROM cells, tot
"""


@query("text_langid_eval", oracle=_EVAL_ORACLE, category="L")
def text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the language-ID heuristic against the labeled
    ``lang`` column: per (true, predicted) pair, the document count, its
    share of all classified documents (one exact-integer division), and
    the diagonal flag. Summing ``share`` over ``correct`` rows is the
    corpus accuracy.

    Scale: composes the verified classifier (two aggregations + a
    broadcast profile join) with one tiny confusion aggregation and a
    1-row total broadcast — nothing new touches the corpus."""
    pred = text_langid_ngram(spark, sf_dir)
    cells = (
        pred.groupBy(
            F.col("lang").alias("true_lang"),
            F.col("predicted").alias("pred_lang"),
        )
        .agg(F.count("*").alias("n"))
    )
    tot = cells.agg(F.sum("n").cast("long").alias("total"))
    return cells.crossJoin(F.broadcast(tot)).select(
        "true_lang",
        "pred_lang",
        "n",
        (F.col("n").cast("double") / F.col("total")).alias("share"),
        (F.col("true_lang") == F.col("pred_lang")).alias("correct"),
    )


RECALL_K = 5


def _ann_recall_oracle() -> str:
    exact_sql = spec("sim_search_cosine_topk").oracle
    ann_sql = spec("sim_search_ann_lsh").oracle
    return f"""
WITH exact_k AS (SELECT * FROM ({exact_sql})),
ann_k AS (SELECT * FROM ({ann_sql})),
hits AS (
  SELECT e.qid, CAST(COUNT(*) AS BIGINT) AS n_overlap
  FROM exact_k e JOIN ann_k a
    ON e.qid = a.qid AND e.neighbor_id = a.neighbor_id
  GROUP BY e.qid),
base AS (
  SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact_k
  GROUP BY qid),
annc AS (
  SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_ann FROM ann_k
  GROUP BY qid)
SELECT b.qid, b.n_exact,
       CAST(COALESCE(a.n_ann, 0) AS BIGINT) AS n_ann,
       CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / {RECALL_K}
         AS recall_at_k
FROM base b
LEFT JOIN annc a ON b.qid = a.qid
LEFT JOIN hits h ON b.qid = h.qid
"""


@query("sim_search_ann_recall", oracle=_ann_recall_oracle(), category="L")
def sim_search_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@5 of the sign-LSH ANN index against the exact
    brute-force top-k — the quality dashboard every production ANN
    deployment tracks (index drift shows up here before users notice).
    Composes the two already-verified keys; overlap/recall are one
    integer count and one division by the constant k, so the scores are
    bit-deterministic. The macro average of ``recall_at_k`` is the
    corpus recall (asserted ≥0.6 in tests/test_pipeline.py for the
    underlying index).

    Scale: both inputs bound their own cost (broadcast queries; banded
    LSH candidates); the eval adds only per-query-key joins and counts
    over k·|queries| rows — negligible against the searches themselves."""
    from dbsuite_spark.pipeline.similarity import (
        sim_search_ann_lsh,
        sim_search_cosine_topk,
    )

    # both k-row frames feed THREE aggregations each below — cache, or
    # the giant fold/banding subtrees re-plan and re-execute per consumer
    exact_k = memo_cache(
        sim_search_cosine_topk(spark, sf_dir).select("qid", "neighbor_id"),
        f"eval_exact_k:{sf_dir}:{S.TOP_K}:{S.QUERY_MOD}",
    )
    ann_k = memo_cache(
        sim_search_ann_lsh(spark, sf_dir).select("qid", "neighbor_id"),
        f"eval_lsh_k:{sf_dir}:{S.N_TABLES}:{S.N_BITS}:{S.TOP_K}",
    )
    hits = (
        exact_k.join(ann_k, ["qid", "neighbor_id"])
        .groupBy("qid")
        .agg(F.count("*").cast("bigint").alias("n_overlap"))
    )
    base = exact_k.groupBy("qid").agg(
        F.count("*").cast("bigint").alias("n_exact")
    )
    annc = ann_k.groupBy("qid").agg(
        F.count("*").cast("bigint").alias("n_ann")
    )
    return (
        base.join(annc, "qid", "left")
        .join(hits, "qid", "left")
        .select(
            "qid",
            "n_exact",
            F.coalesce("n_ann", F.lit(0)).cast("bigint").alias("n_ann"),
            F.coalesce("n_overlap", F.lit(0))
            .cast("bigint")
            .alias("n_overlap"),
            (
                F.coalesce("n_overlap", F.lit(0)).cast("double") / RECALL_K
            ).alias("recall_at_k"),
        )
    )


def _knn_eval_oracle() -> str:
    knn_sql = spec("knn_classify_majority").oracle
    return f"""
WITH pred AS (SELECT * FROM ({knn_sql})),
cells AS (
  SELECT e.label AS true_label, p.predicted_label,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM pred p JOIN embeddings e ON p.qid = e.vec_id
  GROUP BY 1, 2),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cells)
SELECT true_label, predicted_label, n,
       CAST(n AS DOUBLE) / total AS share,
       true_label = predicted_label AS correct
FROM cells, tot
"""


@query("ml_knn_eval", oracle=_knn_eval_oracle(), category="L")
def ml_knn_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the k-NN majority classifier against the
    embeddings' labeled ``label`` column — the embedding-space sibling
    of ``text_langid_eval``, composing the verified classifier oracle as
    a CTE so the eval's truth derives from the same prediction
    semantics. Summing ``share`` over ``correct`` rows is the accuracy.

    Scale: the classifier bounds its own cost; the eval adds one
    broadcast-size join and a tiny confusion aggregation."""
    from dbsuite_spark.pipeline.similarity import knn_classify_majority

    pred = knn_classify_majority(spark, sf_dir)
    labels = t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("qid"), F.col("label").alias("true_label")
    )
    cells = (
        pred.join(labels, "qid")
        .groupBy("true_label", "predicted_label")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    tot = cells.agg(F.sum("n").cast("long").alias("total"))
    return cells.crossJoin(F.broadcast(tot)).select(
        "true_label",
        "predicted_label",
        "n",
        (F.col("n").cast("double") / F.col("total")).alias("share"),
        (F.col("true_label") == F.col("predicted_label")).alias("correct"),
    )


def _ivf_recall_oracle() -> str:
    exact_sql = spec("sim_search_cosine_topk").oracle
    ann_sql = spec("sim_search_ann_ivf").oracle
    return f"""
WITH exact_k AS (SELECT * FROM ({exact_sql})),
ann_k AS (SELECT * FROM ({ann_sql})),
hits AS (
  SELECT e.qid, CAST(COUNT(*) AS BIGINT) AS n_overlap
  FROM exact_k e JOIN ann_k a
    ON e.qid = a.qid AND e.neighbor_id = a.neighbor_id
  GROUP BY e.qid),
base AS (
  SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact_k
  GROUP BY qid),
annc AS (
  SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_ann FROM ann_k
  GROUP BY qid)
SELECT b.qid, b.n_exact,
       CAST(COALESCE(a.n_ann, 0) AS BIGINT) AS n_ann,
       CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / {RECALL_K}
         AS recall_at_k
FROM base b
LEFT JOIN annc a ON b.qid = a.qid
LEFT JOIN hits h ON b.qid = h.qid
"""


@query("sim_search_ivf_recall", oracle=_ivf_recall_oracle(), category="L")
def sim_search_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@5 of the IVF (inverted-file) ANN index against
    the exact brute-force top-k — the sibling dashboard of
    ``sim_search_ann_recall``; comparing the two recall columns is how a
    deployment picks between the sign-LSH and IVF index families (and
    tunes nprobe) on its own corpus.

    Scale: identical envelope — both searches bound their own cost; the
    eval joins k·|queries|-row frames."""
    from dbsuite_spark.pipeline.similarity import (
        sim_search_ann_ivf,
        sim_search_cosine_topk,
    )

    # same caching rationale as sim_search_ann_recall
    exact_k = memo_cache(
        sim_search_cosine_topk(spark, sf_dir).select("qid", "neighbor_id"),
        f"eval_exact_k:{sf_dir}:{S.TOP_K}:{S.QUERY_MOD}",
    )
    ann_k = memo_cache(
        sim_search_ann_ivf(spark, sf_dir).select("qid", "neighbor_id"),
        f"eval_ivf_k:{sf_dir}:{S.N_CELLS}:{S.N_PROBE}:{S.TOP_K}",
    )
    hits = (
        exact_k.join(ann_k, ["qid", "neighbor_id"])
        .groupBy("qid")
        .agg(F.count("*").cast("bigint").alias("n_overlap"))
    )
    base = exact_k.groupBy("qid").agg(
        F.count("*").cast("bigint").alias("n_exact")
    )
    annc = ann_k.groupBy("qid").agg(
        F.count("*").cast("bigint").alias("n_ann")
    )
    return (
        base.join(annc, "qid", "left")
        .join(hits, "qid", "left")
        .select(
            "qid",
            "n_exact",
            F.coalesce("n_ann", F.lit(0)).cast("bigint").alias("n_ann"),
            F.coalesce("n_overlap", F.lit(0))
            .cast("bigint")
            .alias("n_overlap"),
            (
                F.coalesce("n_overlap", F.lit(0)).cast("double") / RECALL_K
            ).alias("recall_at_k"),
        )
    )


def _pq_recall_oracle() -> str:
    exact_sql = spec("sim_search_cosine_topk").oracle
    pq_sql = spec("sim_search_pq_adc").oracle
    return f"""
WITH exact_k AS (SELECT * FROM ({exact_sql})),
ann_k AS (SELECT * FROM ({pq_sql})),
hits AS (
  SELECT e.qid, CAST(COUNT(*) AS BIGINT) AS n_overlap
  FROM exact_k e JOIN ann_k a
    ON e.qid = a.qid AND e.neighbor_id = a.neighbor_id
  GROUP BY e.qid),
base AS (
  SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact_k
  GROUP BY qid),
annc AS (
  SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_ann FROM ann_k
  GROUP BY qid)
SELECT b.qid, b.n_exact,
       CAST(COALESCE(a.n_ann, 0) AS BIGINT) AS n_ann,
       CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / {RECALL_K}
         AS recall_at_k
FROM base b
LEFT JOIN annc a ON b.qid = a.qid
LEFT JOIN hits h ON b.qid = h.qid
"""


@query("sim_pq_recall", oracle=_pq_recall_oracle(), category="L")
def sim_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@{RECALL_K} of the PQ-ADC (product-quantization,
    asymmetric-distance) index against the exact brute-force top-k —
    completes the recall-dashboard family (sign-LSH, IVF, k-NN graph,
    and now PQ), so all four index families are tunable from verified
    honesty dashboards on the deployment's own corpus. ADC approximates
    L2 over normalized vectors while truth ranks by cosine, so this
    dashboard also measures the metric mismatch, not just codebook
    coarseness.

    Scale: both searches bound their own cost (PQ codes are 8 bytes per
    vector vs 256 for float32); the eval joins k·|queries|-row frames."""
    from dbsuite_spark.pipeline.quantization import sim_search_pq_adc
    from dbsuite_spark.pipeline.similarity import sim_search_cosine_topk

    # same caching rationale as sim_search_ann_recall
    exact_k = memo_cache(
        sim_search_cosine_topk(spark, sf_dir).select("qid", "neighbor_id"),
        f"eval_exact_k:{sf_dir}:{S.TOP_K}:{S.QUERY_MOD}",
    )
    ann_k = memo_cache(
        sim_search_pq_adc(spark, sf_dir).select("qid", "neighbor_id"),
        f"eval_pq_k:{sf_dir}:{Q.N_SUB}:{Q.N_CODES}:{Q.PQ_TOP_K}",
    )
    hits = (
        exact_k.join(ann_k, ["qid", "neighbor_id"])
        .groupBy("qid")
        .agg(F.count("*").cast("bigint").alias("n_overlap"))
    )
    base = exact_k.groupBy("qid").agg(
        F.count("*").cast("bigint").alias("n_exact")
    )
    annc = ann_k.groupBy("qid").agg(
        F.count("*").cast("bigint").alias("n_ann")
    )
    return (
        base.join(annc, "qid", "left")
        .join(hits, "qid", "left")
        .select(
            "qid",
            "n_exact",
            F.coalesce("n_ann", F.lit(0)).cast("bigint").alias("n_ann"),
            F.coalesce("n_overlap", F.lit(0))
            .cast("bigint")
            .alias("n_overlap"),
            (
                F.coalesce("n_overlap", F.lit(0)).cast("double") / RECALL_K
            ).alias("recall_at_k"),
        )
    )


PREFIX_DIMS = 16  # Matryoshka prefix: first 16 of 64 dims (4x fewer bytes)


def _dim_truncation_oracle() -> str:
    from dbsuite_spark.pipeline.similarity import QUERY_MOD
    from dbsuite_spark.pipeline.vectors import COSINE

    exact_sql = spec("sim_search_cosine_topk").oracle
    return f"""
WITH e16 AS (
  SELECT vec_id, embedding[1:{PREFIX_DIMS}] AS emb FROM embeddings),
q AS (SELECT vec_id AS qid, emb AS qe FROM e16
      WHERE vec_id % {QUERY_MOD} = 0),
tp AS (
  SELECT q.qid, e.vec_id AS neighbor_id,
         {COSINE('q.qe', 'e.emb')} AS cos_sim
  FROM q, e16 e WHERE e.vec_id <> q.qid),
trunc_k AS (
  SELECT qid, neighbor_id FROM (
    SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY cos_sim DESC, neighbor_id) AS rn
    FROM tp) WHERE rn <= {RECALL_K}),
exact_k AS (SELECT qid, neighbor_id FROM ({exact_sql})),
hits AS (
  SELECT e.qid, CAST(COUNT(*) AS BIGINT) AS n_overlap
  FROM exact_k e JOIN trunc_k a
    ON e.qid = a.qid AND e.neighbor_id = a.neighbor_id
  GROUP BY e.qid),
base AS (
  SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact_k
  GROUP BY qid),
trc AS (
  SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_trunc FROM trunc_k
  GROUP BY qid)
SELECT b.qid, b.n_exact,
       CAST(COALESCE(t.n_trunc, 0) AS BIGINT) AS n_trunc,
       CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / {RECALL_K}
         AS recall_at_k
FROM base b
LEFT JOIN trc t ON b.qid = t.qid
LEFT JOIN hits h ON b.qid = h.qid
"""


@query("sim_dim_truncation_recall", oracle=_dim_truncation_oracle(), category="L")
def sim_dim_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension-truncation eval: recall@{RECALL_K} of
    exact cosine search over only the FIRST {PREFIX_DIMS} of 64
    dimensions against the full-dimension exact top-k (Kusupati et al.
    2022, "Matryoshka Representation Learning": prefix sub-vectors of a
    suitably trained embedding retain most retrieval quality). This is
    the honesty dashboard a deployment consults before shipping the
    cheap prefix index: at 100 TB of vectors, a 16-of-64 prefix is 4x
    less data scanned, moved, and cached per query.

    Scale: the truncated search is the same broadcast-query x one-
    corpus-scan envelope as ``sim_search_cosine_topk``, just narrower
    rows; the eval joins k-row-per-query frames. Cross-engine
    exactness: prefix slices are elementwise-identical on both engines
    (Spark ``slice`` = DuckDB ``[1:n]``), so the fold cosines stay
    bit-identical and the rankings need no tolerance."""
    from dbsuite_spark.pipeline.similarity import (
        _topk,
        QUERY_MOD,
        sim_search_cosine_topk,
    )
    from dbsuite_spark.pipeline.vectors import dot, l2_norm

    e16 = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.slice(F.col("embedding"), 1, PREFIX_DIMS).alias("emb")
    )
    corpus = e16.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("ne"),
        l2_norm(F.col("emb")).alias("nn"),
    )
    q = e16.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("emb").alias("qe"),
        l2_norm(F.col("emb")).alias("qn"),
    )
    pairs = corpus.join(
        F.broadcast(q), F.col("neighbor_id") != F.col("qid")
    ).select(
        "qid",
        "neighbor_id",
        (dot(F.col("qe"), F.col("ne")) / (F.col("qn") * F.col("nn"))).alias(
            "cos_sim"
        ),
    )
    trunc_k = _topk(pairs, RECALL_K).select("qid", "neighbor_id")
    exact_k = memo_cache(
        sim_search_cosine_topk(spark, sf_dir).select("qid", "neighbor_id"),
        f"eval_exact_k:{sf_dir}:{S.TOP_K}:{S.QUERY_MOD}",
    )
    hits = (
        exact_k.join(trunc_k, ["qid", "neighbor_id"])
        .groupBy("qid")
        .agg(F.count("*").cast("bigint").alias("n_overlap"))
    )
    base = exact_k.groupBy("qid").agg(
        F.count("*").cast("bigint").alias("n_exact")
    )
    trc = trunc_k.groupBy("qid").agg(
        F.count("*").cast("bigint").alias("n_trunc")
    )
    return (
        base.join(trc, "qid", "left")
        .join(hits, "qid", "left")
        .select(
            "qid",
            "n_exact",
            F.coalesce("n_trunc", F.lit(0)).cast("bigint").alias("n_trunc"),
            F.coalesce("n_overlap", F.lit(0))
            .cast("bigint")
            .alias("n_overlap"),
            (
                F.coalesce("n_overlap", F.lit(0)).cast("double") / RECALL_K
            ).alias("recall_at_k"),
        )
    )


def _minhash_recall_oracle() -> str:
    truth_sql = spec("dedup_near_minhash").oracle  # exact Jaccard >= 0.5
    return f"""
WITH truth AS ({truth_sql}),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth)
SELECT n_truth,
       n_truth AS n_detected,
       n_truth AS n_hit,
       CAST(1.0 AS DOUBLE) AS recall
FROM t
"""


def _minhash_recall_gate(
    spark: SparkSession, sf_dir: str, sample_pct: int | None = None
) -> DataFrame:
    """Shared recall-gate body: truth from the uncapped exact-Jaccard
    path, detected from the production MinHash pipeline, hits by
    pair-key semi-join. When ``sample_pct`` is given, BOTH sides are
    restricted to pairs whose two endpoints fall in the deterministic
    md5 hash-sample (the ``docs_train_test_split`` draw: ``h(doc_id) %
    100 < sample_pct``) — the documented 100 TB mitigation for the
    uncapped truth self-join, now an actual parameter (VERDICT r06
    ask #6)."""
    from dbsuite_spark.pipeline.dedup import (
        _jaccard_on,
        _shingle_rows,
        dedup_near_minhash,
    )

    sh = _shingle_rows(spark, sf_dir)
    truth = _jaccard_on(None, sh).select("d1", "d2")
    detected = dedup_near_minhash(spark, sf_dir).select("d1", "d2")
    if sample_pct is not None:
        d = t(spark, sf_dir, "documents")
        sampled = d.filter(
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("long")
            % 100
            < sample_pct
        ).select("doc_id")
        # The sample is a tiny broadcast dimension; a pair is in the
        # sampled gate iff BOTH endpoints drew in — applied identically
        # to truth and detected so the recall ratio stays meaningful.
        s1 = F.broadcast(sampled.select(F.col("doc_id").alias("d1")))
        s2 = F.broadcast(sampled.select(F.col("doc_id").alias("d2")))
        truth = truth.join(s1, "d1", "left_semi").join(s2, "d2", "left_semi")
        detected = (
            detected.join(s1, "d1", "left_semi").join(s2, "d2", "left_semi")
        )
    n_truth = truth.agg(F.count("*").cast("long").alias("n_truth"))
    n_det = detected.agg(F.count("*").cast("long").alias("n_detected"))
    hits = truth.join(detected, ["d1", "d2"], "left_semi").agg(
        F.count("*").cast("long").alias("n_hit")
    )
    return (
        n_truth.crossJoin(F.broadcast(n_det))
        .crossJoin(F.broadcast(hits))
        .select(
            "n_truth",
            "n_detected",
            "n_hit",
            F.when(F.col("n_truth") == 0, F.lit(1.0))
            .otherwise(F.col("n_hit").cast("double") / F.col("n_truth"))
            .alias("recall"),
        )
    )


@query("dedup_minhash_recall", oracle=_minhash_recall_oracle(), category="L")
def dedup_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the banded-MinHash near-dup detector against the exact
    shingle-Jaccard truth set — the banding-parameter dashboard
    (b bands x r rows trades recall against candidate volume; this key
    is the release-over-release gate that the chosen 12x2 config keeps
    recall at 1.0 on the reference corpus).

    The Spark side measures honestly: truth pairs from the exact
    (uncapped) Jaccard path, detected pairs from the production MinHash
    pipeline, hits by pair-key semi-join. The oracle pins the PROVABLE
    expectation (deterministic fixed-seed hashes; per-pair miss
    probability (1-J^2)^12 < 1e-8 on the fixture's J>=0.889 pairs):
    n_hit = n_detected = n_truth, recall = 1.0 — the verdict-oracle
    pattern the approximate tier uses, so any banding regression or
    hash-function change that starts missing pairs turns the driver row
    red instead of drifting silently.

    Scale: truth is the UNCAPPED exact-Jaccard path (``_jaccard_on(None,
    ...)`` — no ``cap_stop_shingles``), deliberately matching the
    uncapped oracle SQL; an evaluation gate must not inherit the
    production guard it is measuring against. That uncapped self-join is
    the unbounded shape at 100 TB, so the mitigation there is SAMPLING —
    run the gate on a deterministic hash-sample of documents (the
    ``docs_train_test_split`` draw), not the full corpus; the MinHash
    side stays the production capped+banded pipeline either way
    (ADVICE r04); the sampled gate is the registered
    ``dedup_minhash_recall_sampled`` twin."""
    return _minhash_recall_gate(spark, sf_dir, sample_pct=None)


MINHASH_GATE_SAMPLE_PCT = 50


def _minhash_recall_sampled_oracle() -> str:
    truth_sql = spec("dedup_near_minhash").oracle  # exact Jaccard >= 0.5
    return f"""
WITH truth AS ({truth_sql}),
samp AS (
  SELECT doc_id FROM documents
  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        AS BIGINT) % 100 < {MINHASH_GATE_SAMPLE_PCT}),
st AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth
  WHERE d1 IN (SELECT doc_id FROM samp)
    AND d2 IN (SELECT doc_id FROM samp))
SELECT n_truth,
       n_truth AS n_detected,
       n_truth AS n_hit,
       CAST(1.0 AS DOUBLE) AS recall
FROM st
"""


@query(
    "dedup_minhash_recall_sampled",
    oracle=_minhash_recall_sampled_oracle(),
    category="L",
)
def dedup_minhash_recall_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The production-scale form of the MinHash recall gate (VERDICT r06
    ask #6): the uncapped exact-Jaccard TRUTH side — the one unbounded
    shape in the gate — runs only over a deterministic
    {MINHASH_GATE_SAMPLE_PCT}% md5 hash-sample of documents (the same
    draw as ``docs_train_test_split``; a pair is in the gate iff both
    endpoints drew in, applied identically to truth and detected). The
    MinHash side stays the full production capped+banded pipeline. The
    oracle pins the same provable expectation as the full gate
    (per-pair miss probability (1-J^2)^12 < 1e-8 on the fixture's
    J>=0.889 pairs; a subset of pairs inherits the bound): n_hit =
    n_detected = n_truth over the sample, recall = 1.0.

    Scale: the truth self-join's quadratic term shrinks by
    sample_pct²/10⁴ (~4× here, ~10⁴× at a production 1% draw) while the
    estimate stays unbiased — a pair's inclusion is a deterministic
    function of its endpoint ids, independent of its Jaccard. The
    hash-sample is reproducible across engines, reruns, and corpus
    growth, so the gate's reading is comparable release-over-release."""
    return _minhash_recall_gate(
        spark, sf_dir, sample_pct=MINHASH_GATE_SAMPLE_PCT
    )


# --- rank-based AUC (round 5) ------------------------------------------

_AUC = (
    "((s_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))"
)

_AUC_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS score,
         (user_id % 5 = 0) AS label
  FROM events GROUP BY user_id),
ranked AS (
  SELECT label,
         CAST(rank() OVER (ORDER BY score) AS BIGINT) AS r,
         CAST(COUNT(*) OVER (PARTITION BY score) AS BIGINT) AS tie_n
  FROM per_user),
s AS (
  SELECT CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(SUM(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS n_neg,
         SUM(CASE WHEN label THEN r + (tie_n - 1) / 2.0 ELSE 0 END) AS s_pos
  FROM ranked)
SELECT n_pos, n_neg, {_AUC} AS auc FROM s
"""


@query("ml_auc_rank_eval", oracle=_AUC_ORACLE, category="L")
def ml_auc_rank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC via the Mann-Whitney rank formula (tie-corrected average
    ranks) — the standard scalable AUC: no threshold sweep, no curve
    materialization, just one global rank of the score distribution.
    Score = per-user event count; label = the deterministic user_id%5
    holdout (the package's synthetic-label convention).

    Exactness: ranks and tie counts are integers; average ranks add an
    exact .5; the final AUC is one division of exactly-derived doubles
    from identical expression text. The tie-corrected sum S_pos is a sum
    of halves — exact in double up to 2^52, far beyond any user count.

    Scale: the global rank window is the one global sort — over the
    per-user aggregate (|users| rows), not events; at extreme scale,
    bucket the score histogram and compute AUC from bin counts (same
    formula on grouped ranks)."""
    e = t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("score")
    ).select(
        "score", (F.col("user_id") % 5 == 0).alias("label")
    )
    wr = Window.orderBy("score")
    wt = Window.partitionBy("score")
    ranked = per_user.select(
        "label",
        F.rank().over(wr).cast("bigint").alias("r"),
        F.count("*").over(wt).cast("bigint").alias("tie_n"),
    )
    s = ranked.agg(
        F.sum(F.when(F.col("label"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
        F.sum(F.when(F.col("label"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_neg"),
        F.sum(
            F.when(
                F.col("label"), F.col("r") + (F.col("tie_n") - 1) / 2.0
            ).otherwise(0.0)
        ).alias("s_pos"),
    )
    return s.selectExpr("n_pos", "n_neg", f"{_AUC} AS auc")


# --- calibration bins (round 5) ----------------------------------------

CALIB_BINS = 10

_CALIB_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS score,
         (user_id % 5 = 0) AS label
  FROM events GROUP BY user_id),
binned AS (
  SELECT score, label,
         CAST(ntile({CALIB_BINS}) OVER (ORDER BY score, user_id) AS INT)
           AS bin
  FROM per_user)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS pos_rate,
       CAST(SUM(score) AS DOUBLE) / COUNT(*) AS mean_score
FROM binned GROUP BY bin
"""


@query("ml_calibration_bins", oracle=_CALIB_ORACLE, category="L")
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins: rank the score distribution into 10
    equal-count bins (ntile over a unique (score, user_id) order) and
    report per-bin positive rate vs mean score — the calibration
    companion to ml_auc_rank_eval (AUC says *ranking* is good;
    calibration says the *values* mean what they claim).

    Exactness: ntile over a total order is deterministic; all cells are
    integer counts/sums with one exact division each. Scale: the global
    ntile runs over the per-user aggregate (|users| rows); at extreme
    scale, derive bins from a pre-aggregated score histogram instead."""
    e = t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("score")
    ).select(
        "user_id", "score", (F.col("user_id") % 5 == 0).alias("label")
    )
    wb = Window.orderBy("score", "user_id")
    binned = per_user.select(
        "score", "label", F.ntile(CALIB_BINS).over(wb).cast("int").alias("bin")
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("label"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
        (
            F.sum(F.when(F.col("label"), 1).otherwise(0)).cast("double")
            / F.count("*")
        ).alias("pos_rate"),
        (F.sum("score").cast("double") / F.count("*")).alias("mean_score"),
    )


# --- isotonic calibration (round 10) ------------------------------------

_CALIB_BIN_STATS_CTE = f"""
per_user AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS score,
         (user_id % 5 = 0) AS label
  FROM events GROUP BY user_id),
binned AS (
  SELECT score, label,
         CAST(ntile({CALIB_BINS}) OVER (ORDER BY score, user_id) AS INT)
           AS bin
  FROM per_user),
bins AS (
  SELECT bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
  FROM binned GROUP BY bin)
"""

_ISO_ORACLE = f"""
WITH {_CALIB_BIN_STATS_CTE},
cum AS (
  SELECT bin, n, n_pos,
         SUM(n) OVER (ORDER BY bin) AS cn,
         SUM(n_pos) OVER (ORDER BY bin) AS cpos
  FROM bins),
spans AS (
  SELECT i.bin AS lo, j.bin AS hi,
         CAST(j.cpos - (i.cpos - i.n_pos) AS DOUBLE)
           / (j.cn - (i.cn - i.n)) AS span_avg
  FROM cum i JOIN cum j ON i.bin <= j.bin),
lower_env AS (
  SELECT b.bin, s.lo, MIN(s.span_avg) AS min_over_hi
  FROM bins b JOIN spans s ON s.lo <= b.bin AND b.bin <= s.hi
  GROUP BY b.bin, s.lo)
SELECT b.bin, b.n, b.n_pos,
       CAST(b.n_pos AS DOUBLE) / b.n AS raw_rate,
       MAX(l.min_over_hi) AS iso_rate
FROM bins b JOIN lower_env l ON l.bin = b.bin
GROUP BY b.bin, b.n, b.n_pos
"""


@query("ml_isotonic_calibration", oracle=_ISO_ORACLE, category="L")
def ml_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic-regression calibration over the reliability bins — the
    monotone fit PAVA computes, here via the equivalent minimax formula
    iso(k) = max_{i≤k} min_{j≥k} avg(pos rate over bins i..j) (Robertson
    et al., *Order Restricted Statistical Inference*, the closed form of
    pool-adjacent-violators). Shares ``ml_calibration_bins``'s exact
    binning, so raw vs isotonic rates are directly comparable; the
    fitted curve is the non-decreasing projection a model server would
    apply to raw scores.

    Exactness: every span average is ONE double division of exact
    integer prefix-sum differences, and min/max are order-free — no
    float summation, no rounding needed, hash-identical on both engines.

    Scale: the corpus-scale work is the per-user count + bin assignment
    (``ml_calibration_bins``'s envelope — swap the global ntile for
    histogram cut-points at extreme scale); the minimax runs over
    B={CALIB_BINS} fixed bins, so the span triangle is B(B+1)/2 rows
    and the envelope join B·spans — constants independent of corpus
    size, broadcast-joined locally."""
    e = t(spark, sf_dir, "events")
    per_user = (
        e.groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("score"))
        .select(
            "user_id", "score", (F.col("user_id") % 5 == 0).alias("label")
        )
    )
    wb = Window.orderBy("score", "user_id")
    binned = per_user.select(
        "score",
        "label",
        F.ntile(CALIB_BINS).over(wb).cast("int").alias("bin"),
    )
    bins = binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("label"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
    )
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "bin",
        "n",
        "n_pos",
        F.sum("n").over(wc).alias("cn"),
        F.sum("n_pos").over(wc).alias("cpos"),
    )
    i = cum.select(
        F.col("bin").alias("lo"),
        (F.col("cpos") - F.col("n_pos")).alias("cpos_before"),
        (F.col("cn") - F.col("n")).alias("cn_before"),
    )
    j = cum.select(
        F.col("bin").alias("hi"),
        F.col("cpos").alias("cpos_hi"),
        F.col("cn").alias("cn_hi"),
    )
    spans = i.join(F.broadcast(j), F.col("lo") <= F.col("hi")).select(
        "lo",
        "hi",
        (
            (F.col("cpos_hi") - F.col("cpos_before")).cast("double")
            / (F.col("cn_hi") - F.col("cn_before"))
        ).alias("span_avg"),
    )
    k = bins.select("bin", "n", "n_pos")
    lower_env = (
        k.join(
            F.broadcast(spans),
            (F.col("lo") <= F.col("bin")) & (F.col("bin") <= F.col("hi")),
        )
        .groupBy("bin", "n", "n_pos", "lo")
        .agg(F.min("span_avg").alias("min_over_hi"))
    )
    iso = lower_env.groupBy("bin", "n", "n_pos").agg(
        F.max("min_over_hi").alias("iso_rate")
    )
    return iso.select(
        "bin",
        "n",
        "n_pos",
        (F.col("n_pos").cast("double") / F.col("n")).alias("raw_rate"),
        "iso_rate",
    )


# --- MinHash estimator calibration (round 6) ----------------------------

MH_EST_HASHES = 24  # mirror the production signature width


def _mh_est_oracle() -> str:
    # Share the capped-pair CTE with dedup.py so the estimator dashboard
    # measures EXACTLY the production pair population (round-6 review:
    # a hand-copied pair definition could silently drift).
    from dbsuite_spark.pipeline.dedup import JACCARD_CAPPED_CTE

    return f"""
WITH {JACCARD_CAPPED_CTE},
pairs AS (SELECT d1, d2, jaccard FROM capped_pairs),
hj AS (
  SELECT doc_id, j,
         MIN(CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || s), 1, 15)
             AS BIGINT)) AS h
  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, {MH_EST_HASHES - 1}))
                      AS j)
  GROUP BY doc_id, j),
m AS (
  SELECT p.d1, p.d2, p.jaccard,
         CAST(SUM(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS BIGINT)
           AS n_match
  FROM pairs p
  JOIN hj a ON a.doc_id = p.d1
  JOIN hj b ON b.doc_id = p.d2 AND b.j = a.j
  GROUP BY p.d1, p.d2, p.jaccard)
SELECT d1, d2, jaccard, n_match,
       CAST(n_match AS DOUBLE) / {MH_EST_HASHES}.0 AS jaccard_est,
       ABS(CAST(n_match AS DOUBLE) / {MH_EST_HASHES}.0 - jaccard) AS abs_err
FROM m
"""


@query("dedup_minhash_estimate_error", oracle=_mh_est_oracle(), category="L")
def dedup_minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration — per near-dup pair, the signature
    Jaccard ESTIMATE (share of the {MH_EST_HASHES} per-shingle min-hashes
    that agree: an unbiased Bernoulli({MH_EST_HASHES}, J) / n estimator,
    Broder 1997) against the exact Jaccard, with the absolute error. The
    banding gate (``dedup_minhash_recall``) answers "did we FIND the
    pairs"; this answers "how well does the signature MEASURE them" —
    the dashboard that justifies the signature width before anyone
    resizes it. Hashes here are the 60-bit md5 family (exactly SQL-
    reproducible, unlike the production xxhash64 — same estimator
    statistics, since any uniform hash family gives the same
    agree-probability J per row).

    Scale: signatures are one groupBy over the DF-capped shingle index
    ({MH_EST_HASHES} conditional mins, map-side combined); the estimate
    joins signature rows only for already-qualified pairs — O(pairs ·
    {MH_EST_HASHES}) on tiny inputs, never all-pairs."""
    from dbsuite_spark.pipeline.dedup import (
        _jaccard_on,
        _shingle_rows,
        cap_stop_shingles,
    )

    sh = memo_cache(
        cap_stop_shingles(_shingle_rows(spark, sf_dir)),
        f"shingles_capped:{sf_dir}:{D.DF_CAP}",
    )
    pairs = _jaccard_on(None, sh).select("d1", "d2", "jaccard")
    hcols = [
        F.min(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{j}:"), F.col("s"))), 1, 15
                ),
                16,
                10,
            ).cast("long")
        ).alias(f"h{j}")
        for j in range(MH_EST_HASHES)
    ]
    sig = sh.groupBy("doc_id").agg(*hcols)
    a = sig.select(
        F.col("doc_id").alias("d1"),
        *[F.col(f"h{j}").alias(f"a{j}") for j in range(MH_EST_HASHES)],
    )
    b = sig.select(
        F.col("doc_id").alias("d2"),
        *[F.col(f"h{j}").alias(f"b{j}") for j in range(MH_EST_HASHES)],
    )
    n_match = None
    for j in range(MH_EST_HASHES):
        term = F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
        n_match = term if n_match is None else n_match + term
    est = F.col("n_match").cast("double") / F.lit(float(MH_EST_HASHES))
    return (
        pairs.join(a, "d1")
        .join(b, "d2")
        .withColumn("n_match", n_match.cast("bigint"))
        .select(
            "d1",
            "d2",
            "jaccard",
            "n_match",
            est.alias("jaccard_est"),
            F.abs(est - F.col("jaccard")).alias("abs_err"),
        )
    )


# --- NDCG ranking quality (round 6) --------------------------------------

# NDCG depth is BY CONSTRUCTION the retrieval depth: the gain formula
# (NDCG_K + 1 - rank) consumes ranks produced under similarity.TOP_K, so
# the two must move together or gains go negative/mis-scaled (ADVICE r06).
from dbsuite_spark.pipeline.similarity import TOP_K as NDCG_K


def _ndcg_oracle() -> str:
    exact_sql = spec("sim_search_cosine_topk").oracle
    ivf_sql = spec("sim_search_ann_ivf").oracle
    return f"""
WITH exact_k AS ({exact_sql}),
ivf_k AS ({ivf_sql}),
rel AS (
  SELECT qid, neighbor_id,
         CAST({NDCG_K} + 1 - rank AS BIGINT) AS gain
  FROM exact_k),
sys_dcg AS (
  SELECT i.qid,
         SUM(CAST(ROUND(
               CAST(COALESCE(r.gain, 0) AS DOUBLE)
                 / (LN(CAST(i.rank + 1 AS DOUBLE)) / LN(2.0)),
             6) AS DECIMAL(18,6))) AS dcg
  FROM ivf_k i LEFT JOIN rel r
    ON r.qid = i.qid AND r.neighbor_id = i.neighbor_id
  GROUP BY i.qid),
ideal_dcg AS (
  SELECT qid,
         SUM(CAST(ROUND(
               CAST(gain AS DOUBLE)
                 / (LN(CAST(rank + 1 AS DOUBLE)) / LN(2.0)),
             6) AS DECIMAL(18,6))) AS idcg
  FROM rel JOIN exact_k USING (qid, neighbor_id)
  GROUP BY qid)
SELECT s.qid,
       CAST(s.dcg AS DOUBLE) AS dcg,
       CAST(i.idcg AS DOUBLE) AS idcg,
       CAST(s.dcg AS DOUBLE) / CAST(i.idcg AS DOUBLE) AS ndcg
FROM sys_dcg s JOIN ideal_dcg i ON s.qid = i.qid
"""


@query("ml_ndcg_eval", oracle=_ndcg_oracle(), category="L")
def ml_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@5 of the IVF index against the exact ranking — THE graded
    retrieval metric (recall@k counts hits; NDCG weights them by
    position, which is what a reranker consumer actually feels).
    Relevance grades derive from the exact top-k ranks (rank 1 → gain 5
    ... rank 5 → gain 1; outside the exact top-k → 0), so the metric is
    fully deterministic and composes two already-verified oracles as
    CTEs. Each DCG term is 6dp-rounded BEFORE the decimal-cast sum
    (log2 via ln/ln on both engines differs in the last ulp — same
    discipline as the geo trig), making the per-query sums
    order-independent and bit-identical.

    Scale: both searches bound their own cost; the eval joins and
    reduces k·|queries| rows — negligible against the searches."""
    from dbsuite_spark.pipeline.similarity import (
        sim_search_ann_ivf,
        sim_search_cosine_topk,
    )

    exact_k = sim_search_cosine_topk(spark, sf_dir).select(
        "qid", "neighbor_id", "rank"
    )
    ivf_k = sim_search_ann_ivf(spark, sf_dir).select(
        "qid", "neighbor_id", "rank"
    )
    rel = exact_k.select(
        "qid",
        "neighbor_id",
        (F.lit(NDCG_K + 1) - F.col("rank")).cast("bigint").alias("gain"),
    )

    def dcg_term(gain, rank):
        return F.round(
            gain.cast("double")
            / (F.log(rank.cast("double") + F.lit(1.0)) / F.log(F.lit(2.0))),
            6,
        ).cast("decimal(18,6)")

    sys_dcg = (
        ivf_k.join(rel, ["qid", "neighbor_id"], "left")
        .groupBy("qid")
        .agg(
            F.sum(
                dcg_term(
                    F.coalesce(F.col("gain"), F.lit(0)), F.col("rank")
                )
            ).alias("dcg")
        )
    )
    ideal_dcg = (
        rel.join(exact_k, ["qid", "neighbor_id"])
        .groupBy("qid")
        .agg(F.sum(dcg_term(F.col("gain"), F.col("rank"))).alias("idcg"))
    )
    return sys_dcg.join(ideal_dcg, "qid").select(
        "qid",
        F.col("dcg").cast("double").alias("dcg"),
        F.col("idcg").cast("double").alias("idcg"),
        (F.col("dcg").cast("double") / F.col("idcg").cast("double")).alias(
            "ndcg"
        ),
    )


# --- MinHash banding parameter sweep --------------------------------------

BAND_SWEEP = ((12, 2), (8, 3), (6, 4))  # (bands, rows) with bands*rows = 24


def _band_sweep_oracle() -> str:
    from dbsuite_spark.pipeline.dedup import JACCARD_CAPPED_CTE

    stages = [
        f"""{JACCARD_CAPPED_CTE},
truth AS (SELECT d1, d2 FROM capped_pairs),
nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
hj AS (
  SELECT doc_id, j,
         MIN(CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || s), 1, 15)
             AS BIGINT)) AS h
  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, {MH_EST_HASHES - 1}))
                      AS j)
  GROUP BY doc_id, j)"""
    ]
    for b, r in BAND_SWEEP:
        stages.append(f"""k{r} AS (
  SELECT doc_id, CAST(j // {r} AS INT) AS band,
         string_agg(CAST(h AS VARCHAR), '_' ORDER BY j) AS key
  FROM hj GROUP BY doc_id, j // {r}),
c{r} AS (
  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
  FROM k{r} x JOIN k{r} y
    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
row{r} AS (
  SELECT CAST({b} AS INT) AS n_bands, CAST({r} AS INT) AS band_size,
         CAST((SELECT COUNT(*) FROM c{r}) AS BIGINT) AS n_candidates,
         nt.n_truth,
         CAST((SELECT COUNT(*) FROM c{r} c JOIN truth t
               ON t.d1 = c.d1 AND t.d2 = c.d2) AS BIGINT) AS n_hit,
         CAST((SELECT COUNT(*) FROM c{r} c JOIN truth t
               ON t.d1 = c.d1 AND t.d2 = c.d2) AS DOUBLE) / nt.n_truth
           AS recall
  FROM nt)""")
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM row{r}" for _, r in BAND_SWEEP
    )
    return "WITH " + ",\n".join(stages) + "\n" + union


@query("dedup_minhash_band_sweep", oracle=_band_sweep_oracle(), category="L")
def dedup_minhash_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash BANDING TUNING CURVE — the dedup-side sibling of
    ``sim_ivf_probe_sweep``: candidate volume and recall against the
    exact-Jaccard truth at three (bands × rows) splits of the same
    24-hash signature (12×2, 8×3, 6×4). The S-curve theory says
    P(candidate | J) = 1−(1−J^r)^b — at J=0.5 that is ≈0.97 / 0.66 /
    0.32 across the three configs — and this key MEASURES it on the
    deployment's own corpus, which is how (b, r) should be chosen
    before anyone resizes the production banding (the honest
    alternative to folklore defaults). Hashes are the SQL-reproducible
    60-bit md5 family (the ``dedup_minhash_estimate_error``
    discipline; same collision statistics as the production xxhash).

    Exactness: candidate/truth/hit counts are exact integers off
    deterministic hashes; recall is one mirrored division.

    Scale: signatures are one capped-shingle groupBy ({MH_EST_HASHES}
    conditional mins, map-side combined); each config adds one
    (band, key) self-join over collision buckets only — the sweep
    costs three banded joins, never all-pairs; the truth side is the
    audit-scale exact path, sampleable exactly as
    ``dedup_minhash_recall_sampled`` demonstrates."""
    from dbsuite_spark.pipeline.dedup import (
        _jaccard_on,
        _shingle_rows,
        cap_stop_shingles,
    )

    sh = memo_cache(
        cap_stop_shingles(_shingle_rows(spark, sf_dir)),
        f"shingles_capped:{sf_dir}:{D.DF_CAP}",
    )
    truth = memo_cache(
        _jaccard_on(None, sh).select("d1", "d2"),
        f"minhash_truth_capped:{sf_dir}:{D.DF_CAP}:{D.JACCARD_THRESHOLD}",
    )
    nt = truth.agg(F.count("*").cast("bigint").alias("n_truth"))
    hcols = [
        F.min(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{j}:"), F.col("s"))), 1, 15
                ),
                16,
                10,
            ).cast("long")
        ).alias(f"h{j}")
        for j in range(MH_EST_HASHES)
    ]
    sig = memo_cache(
        sh.groupBy("doc_id").agg(*hcols), f"mh_md5_sig:{sf_dir}:{D.DF_CAP}:{MH_EST_HASHES}"
    )
    rows = []
    for b, r in BAND_SWEEP:
        bands = sig.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("band"),
                            F.concat_ws(
                                "_",
                                *[
                                    F.col(f"h{i * r + k}").cast("string")
                                    for k in range(r)
                                ],
                            ).alias("key"),
                        )
                        for i in range(b)
                    ]
                )
            ).alias("bk"),
        ).select("doc_id", "bk.band", "bk.key")
        cand = (
            bands.select(F.col("doc_id").alias("d1"), "band", "key")
            .join(
                bands.select(F.col("doc_id").alias("d2"), "band", "key"),
                ["band", "key"],
            )
            .filter(F.col("d1") < F.col("d2"))
            .select("d1", "d2")
            .distinct()
        )
        ncand = cand.agg(
            F.count("*").cast("bigint").alias("n_candidates")
        )
        hits = cand.join(truth, ["d1", "d2"]).agg(
            F.count("*").cast("bigint").alias("n_hit")
        )
        rows.append(
            nt.crossJoin(F.broadcast(ncand))
            .crossJoin(F.broadcast(hits))
            .select(
                F.lit(b).cast("int").alias("n_bands"),
                F.lit(r).cast("int").alias("band_size"),
                "n_candidates",
                "n_truth",
                "n_hit",
                (
                    F.col("n_hit").cast("double") / F.col("n_truth")
                ).alias("recall"),
            )
        )
    out = rows[0]
    for frame in rows[1:]:
        out = out.unionAll(frame)
    return out
