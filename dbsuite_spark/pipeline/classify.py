"""Nearest-centroid (Rocchio) classification over the labeled embedding
corpus — the supervised counterpart of ``ml_kmeans_*``: fit one centroid
per label, assign every vector to its most-cosine-similar class centroid,
and emit the confusion matrix. This is the classifier used for
fastText-style corpus routing (domain/quality bucketing of training data)
when a full model is overkill.

Plan shape (100 TB): the "fit" is ONE hash aggregation — per label, 64
integer-unit component sums plus a count (65 agg columns, partial+final,
no explode of the corpus); the "predict" is a broadcast of the 10-row
centroid table and a row-local argmax fold per vector (no shuffle); the
confusion matrix is one tiny aggregation on (true, pred).

Determinism (full SQL hash oracle):
- centroid sums use the integer-quantization discipline
  (``floor(x · 2^20)`` BIGINT sums — associative, partition-invariant;
  see pipeline/clustering.py on why double→DECIMAL is NOT safe);
- the centroid component is ``(units / 2^20) / n`` evaluated in exactly
  that order on both engines;
- cosines are the shared sequential fold (pipeline/vectors.py),
  argmax ties break on the lowest label: Spark ``array_position`` finds
  the FIRST index of the max over the label-ordered candidate list ≡ the
  oracle's ``ORDER BY cs DESC, cand``.

Fixture contract: labels are dense 0..9 (pinned in tests) — the
label-ordered centroid list is indexed positionally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbsuite_spark.pipeline.clustering import DIM
from dbsuite_spark.pipeline.vectors import COSINE, cosine
from dbsuite_spark.registry import query
from dbsuite_spark.tables import t

UNIT = 1048576.0  # 2^20 integer units per 1.0 of a component

_CLASSIFY_ORACLE = f"""
WITH u AS (
  SELECT label, ii.i AS i,
         CAST(SUM(CAST(floor(CAST(embedding[ii.i] AS DOUBLE) * {UNIT})
                       AS BIGINT)) AS BIGINT) AS units,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM embeddings, (SELECT unnest(generate_series(1, {DIM})) AS i) ii
  GROUP BY label, ii.i),
cents AS (
  SELECT label, list(CAST(units AS DOUBLE) / {UNIT} / n ORDER BY i) AS c
  FROM u GROUP BY label),
cos AS (
  SELECT e.vec_id, e.label AS true_label, ct.label AS cand,
         {COSINE('e.embedding', 'ct.c')} AS cs
  FROM embeddings e, cents ct),
pred AS (
  SELECT true_label, cand AS pred_label FROM (
    SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY cs DESC, cand) AS rn
    FROM cos) WHERE rn = 1)
SELECT true_label, pred_label, CAST(COUNT(*) AS BIGINT) AS n
FROM pred GROUP BY true_label, pred_label
"""


def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(label, c array<double>): per-label mean embedding via one 65-agg
    hash aggregation in integer units — no corpus explode, no lists."""
    e = t(spark, sf_dir, "embeddings")
    agg = e.groupBy("label").agg(
        *[
            F.sum(
                F.floor(
                    F.element_at("embedding", i).cast("double") * F.lit(UNIT)
                ).cast("long")
            )
            .cast("long")
            .alias(f"u{i}")
            for i in range(1, DIM + 1)
        ],
        F.count("*").alias("n"),
    )
    return agg.select(
        "label",
        F.array(
            *[
                (F.col(f"u{i}").cast("double") / F.lit(UNIT) / F.col("n"))
                for i in range(1, DIM + 1)
            ]
        ).alias("c"),
    )


@query("ml_centroid_classify", oracle=_CLASSIFY_ORACLE, category="L")
def ml_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit per-label centroids, classify every vector by best-cosine
    centroid (ties to the lowest label), return the confusion matrix
    (true_label, pred_label, n). The diagonal mass is the resubstitution
    accuracy of the corpus-routing classifier."""
    cents_row = (
        label_centroids(spark, sf_dir)
        .groupBy()
        .agg(
            F.array_sort(F.collect_list(F.struct("label", "c"))).alias(
                "pairs"
            )
        )
        .select(F.transform("pairs", lambda p: p["c"]).alias("clist"))
    )
    e = t(spark, sf_dir, "embeddings").crossJoin(F.broadcast(cents_row))
    coss = F.transform(
        F.sequence(F.lit(0), F.size("clist") - 1),
        lambda l: cosine(F.col("embedding"), F.element_at("clist", l + 1)),
    )
    pred = (F.array_position(coss, F.array_max(coss)) - 1).cast("int")
    return (
        e.select(
            F.col("label").alias("true_label"), pred.alias("pred_label")
        )
        .groupBy("true_label", "pred_label")
        .agg(F.count("*").alias("n"))
    )


# --- multinomial naive Bayes language ID (round 5 cont.) ----------------

_NB_ORACLE = """
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tk
  FROM documents),
vocab AS (SELECT DISTINCT tk FROM tok),
vstat AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
cls AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_l FROM tok GROUP BY lang),
cnt AS (SELECT lang, tk, CAST(COUNT(*) AS BIGINT) AS n_tl
        FROM tok GROUP BY lang, tk),
lik AS (
  SELECT c.lang, vb.tk,
         ROUND(LN(CAST(COALESCE(ct.n_tl, 0) + 1 AS DOUBLE)
                  / CAST(c.n_l + v.v AS DOUBLE)), 6) AS lp
  FROM cls c CROSS JOIN vocab vb CROSS JOIN vstat v
  LEFT JOIN cnt ct ON ct.lang = c.lang AND ct.tk = vb.tk),
prior AS (
  SELECT lang,
         ROUND(LN(CAST(COUNT(*) AS DOUBLE)
                  / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)), 6)
             AS lprior
  FROM documents GROUP BY lang),
scores AS (
  SELECT t.doc_id, l.lang,
         CAST(SUM(CAST(l.lp AS DECIMAL(18,6))) AS DOUBLE) + p.lprior
             AS score
  FROM (SELECT doc_id, tk FROM tok) t
  JOIN lik l ON t.tk = l.tk
  JOIN prior p ON p.lang = l.lang
  GROUP BY t.doc_id, l.lang, p.lprior),
pred AS (
  SELECT doc_id, lang AS pred_lang, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang) AS rn
  FROM scores)
SELECT p.doc_id, p.pred_lang, d.lang AS true_lang,
       p.pred_lang = d.lang AS correct
FROM pred p JOIN documents d ON p.doc_id = d.doc_id
WHERE rn = 1
"""


@query("ml_naive_bayes_langid", oracle=_NB_ORACLE, category="L")
def ml_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes language ID with add-one smoothing,
    trained and evaluated on the corpus (resubstitution accuracy — the
    honest framing; ``docs_split_leakage_check`` is where held-out
    hygiene lives). The probabilistic counterpart of the n-gram
    heuristic ``text_langid_ngram``.

    Cross-engine exactness: every count is BIGINT; each token
    log-likelihood is ROUND(LN(count ratio), 6) — a 6dp decimal, so the
    per-(doc, class) score is an order-free DECIMAL sum (the
    ``agg_geometric_mean_log`` discipline: an unrounded float log-sum
    would be summation-order-dependent); the argmax breaks ties on the
    class label.

    Scale: training is two grouped counts; the smoothed likelihood
    table is |vocab × classes| → broadcast into the scoring join; the
    score pass is one (doc, class) aggregation after a |classes|-way
    token fan-out. No iteration."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tk")
    )
    vocab = tok.select("tk").distinct()
    vstat = vocab.agg(F.count("*").alias("v"))
    cls = tok.groupBy("lang").agg(F.count("*").alias("n_l"))
    cnt = tok.groupBy("lang", "tk").agg(F.count("*").alias("n_tl"))
    lik = (
        cls.crossJoin(vocab)
        .crossJoin(F.broadcast(vstat))
        .join(cnt, ["lang", "tk"], "left")
        .select(
            "lang",
            "tk",
            F.round(
                F.log(
                    (F.coalesce(F.col("n_tl"), F.lit(0)) + 1).cast("double")
                    / (F.col("n_l") + F.col("v")).cast("double")
                ),
                6,
            ).alias("lp"),
        )
    )
    total = d.agg(F.count("*").alias("n_docs"))
    prior = (
        d.groupBy("lang")
        .agg(F.count("*").alias("n_d"))
        .crossJoin(F.broadcast(total))
        .select(
            "lang",
            F.round(
                F.log(
                    F.col("n_d").cast("double")
                    / F.col("n_docs").cast("double")
                ),
                6,
            ).alias("lprior"),
        )
    )
    scores = (
        tok.select("doc_id", "tk")
        .join(F.broadcast(lik), "tk")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(F.col("lp").cast("decimal(18,6)"))
            .cast("double")
            .alias("s"),
        )
        .join(F.broadcast(prior), "lang")
        .select(
            "doc_id",
            "lang",
            (F.col("s") + F.col("lprior")).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("lang")
    )
    pred = (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"))
    )
    return pred.join(
        d.select("doc_id", F.col("lang").alias("true_lang")), "doc_id"
    ).select(
        "doc_id",
        "pred_lang",
        "true_lang",
        (F.col("pred_lang") == F.col("true_lang")).alias("correct"),
    )
