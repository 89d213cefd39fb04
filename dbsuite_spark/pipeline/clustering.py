"""Fixed-iteration k-means (Lloyd's algorithm) over the embedding corpus —
the clustering primitive behind IVF index building, corpus stratification,
and topic bucketing (``sim_search_ann_ivf`` explicitly defers to "a
k-means refinement of the seeds"; this key is that refinement).

Determinism/exactness: k-means is floating-point iterative, so naive
implementations diverge across engines and even across partitionings.
Everything here is pinned:

- seeds are the K lowest-id vectors (no RNG);
- every similarity is the sequential left-to-right double fold of
  ``pipeline.vectors`` (bit-identical across engines, proven by the
  sim_search keys);
- centroid updates are per-dimension means computed as a sequential fold
  over the member values *sorted by vec_id* (DuckDB
  ``list(x ORDER BY vec_id)`` ≡ Spark ``array_sort(collect_list)``), then
  divided by the member count — a fixed evaluation order, so the bits
  match on any engine and any partitioning. NOT a decimal-sum: embedding
  floats carry full precision, and double→DECIMAL rounding *ties* resolve
  differently across engines (half-up vs half-even — observed on the
  fixtures), so ordered folds are the only bit-safe aggregation here;
- every argmin breaks ties on the cluster id.

Output is per-(cluster, dimension) rows — scalar columns only (the
hash-safety contract forbids array columns in final projections).

Scale (100 TB): the ordered-fold mean materializes each (cluster, dim)
member list — bounded by cluster size, the cost of cross-engine
verifiability. A production run at scale would use plain double sums
(order-dependent in the last ulp, harmless for clustering) or the
integer-units trick of ``graph_pagerank_fixed``; the assignment passes
are already the scalable shape (broadcast K centroids, one scan, no
shuffle of the corpus)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbsuite_spark.pipeline.vectors import COSINE, cosine
from dbsuite_spark.registry import query
from dbsuite_spark.tables import t

K_CLUSTERS = 8
DIM = 64


def _fold_mean(pairs: Column, n: Column) -> Column:
    """Sequential-fold sum of ``array<struct<key,v>>`` (pre-sorted by key)
    divided by n — the order-pinned mean."""
    return (
        F.aggregate(
            F.transform(F.array_sort(pairs), lambda x: x["v"]),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        / n
    )


KMEANS_ORACLE = f"""
WITH seeds AS (
  SELECT vec_id AS cell, embedding AS ce
  FROM embeddings ORDER BY vec_id LIMIT {K_CLUSTERS}),
a1 AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, s.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {COSINE("e.embedding", "s.ce")} DESC, s.cell) AS rn
    FROM embeddings e CROSS JOIN seeds s) WHERE rn = 1),
c1 AS (
  SELECT cell, pos,
         list_reduce(list(CAST(embedding[pos] AS DOUBLE) ORDER BY vec_id),
                     (x, y) -> x + y) / COUNT(*) AS cval
  FROM a1, range(1, {DIM + 1}) t(pos) GROUP BY cell, pos),
ce1 AS (
  SELECT cell, list(cval ORDER BY pos) AS ce FROM c1 GROUP BY cell),
a2 AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, s.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {COSINE("e.embedding", "s.ce")} DESC, s.cell) AS rn
    FROM embeddings e CROSS JOIN ce1 s) WHERE rn = 1)
SELECT a2.cell AS cluster, pos,
       list_reduce(list(CAST(e.embedding[pos] AS DOUBLE) ORDER BY e.vec_id),
                   (x, y) -> x + y) / COUNT(*) AS c_val,
       CAST(COUNT(*) AS BIGINT) AS n_members
FROM a2 JOIN embeddings e ON a2.vec_id = e.vec_id,
     range(1, {DIM + 1}) t(pos)
GROUP BY a2.cell, pos
"""


def _centroid_rows(assigned: DataFrame) -> DataFrame:
    """(cell, pos, cval, n): order-pinned per-dimension means."""
    return (
        assigned.select(
            "cell",
            F.col("vec_id").alias("key"),
            F.posexplode("embedding").alias("p0", "valf"),
        )
        .groupBy("cell", (F.col("p0") + 1).alias("pos"))
        .agg(
            F.collect_list(
                F.struct(
                    F.col("key"), F.col("valf").cast("double").alias("v")
                )
            ).alias("pairs"),
            F.count("*").alias("n"),
        )
        .select(
            "cell",
            "pos",
            _fold_mean(F.col("pairs"), F.col("n")).alias("cval"),
            "n",
        )
    )


def _assign(e: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast K centroid arrays, fold
    cosine per (vector, centroid), argmax with id tie-break."""
    w_vec = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("cell")
    )
    return (
        e.crossJoin(F.broadcast(cents))
        .withColumn("sim", cosine(F.col("embedding"), F.col("ce")))
        .withColumn("rn", F.row_number().over(w_vec))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cell")
    )


@query("ml_kmeans_fixed", oracle=KMEANS_ORACLE, category="L")
def ml_kmeans_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations of k-means (K=8, cosine assignment) with the
    module's exactness pinning; returns the final centroids as
    (cluster, pos, c_val, n_members) rows — bit-identical to the DuckDB
    oracle."""
    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    seeds = (
        e.orderBy("vec_id")
        .limit(K_CLUSTERS)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("ce"))
    )
    a1 = _assign(e, seeds)
    ce1 = (
        _centroid_rows(a1)
        .groupBy("cell")
        .agg(
            F.collect_list(F.struct("pos", F.col("cval").alias("v")))
            .alias("pc")
        )
        .select(
            "cell",
            F.transform(F.array_sort("pc"), lambda x: x["v"]).alias("ce"),
        )
    )
    a2 = _assign(e, ce1)
    final = _centroid_rows(a2)
    return final.select(
        F.col("cell").alias("cluster"),
        "pos",
        F.col("cval").alias("c_val"),
        F.col("n").cast("bigint").alias("n_members"),
    )
