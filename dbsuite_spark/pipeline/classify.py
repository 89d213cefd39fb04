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
