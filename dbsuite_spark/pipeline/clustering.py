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
verifiability; ``ml_kmeans_fixed`` keeps that path as the exactness
reference. ``ml_kmeans_scalable`` is the production shape (VERDICT r02
ask #4): centroid updates are plain partial+final SUMs of
**integer-quantized units** (``floor(v · 2^20)`` as BIGINT — the
``graph_pagerank_fixed`` trick). Integer addition is associative, so the
sum is partition- and order-invariant, map-side combinable, and still
bit-exactly reproducible in the DuckDB oracle — no per-member
``collect_list`` anywhere in its plan (pinned in tests/test_plans.py).
The assignment passes are already the scalable shape in both variants
(broadcast K centroids, one scan, no shuffle of the corpus)."""

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


def _to_centroid_arrays(cent_rows: DataFrame) -> DataFrame:
    """(cell, pos, cval) rows → (cell, ce: array<double>) sorted by pos.

    The collect_list here gathers the K·DIM *centroid* coordinates (8×64
    fixed), never corpus members — bounded at any data scale."""
    return (
        cent_rows.groupBy("cell")
        .agg(
            F.collect_list(F.struct("pos", F.col("cval").alias("v")))
            .alias("pc")
        )
        .select(
            "cell",
            F.transform(F.array_sort("pc"), lambda x: x["v"]).alias("ce"),
        )
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
    ce1 = _to_centroid_arrays(_centroid_rows(a1))
    a2 = _assign(e, ce1)
    final = _centroid_rows(a2)
    return final.select(
        F.col("cell").alias("cluster"),
        "pos",
        F.col("cval").alias("c_val"),
        F.col("n").cast("bigint").alias("n_members"),
    )


# 2^20 — a power of two, so v * KMEANS_UNIT is an EXACT double product
# (only the exponent changes); floor() of it is then a deterministic
# integer on every engine. int64 headroom: |unit| ≤ 2^20 per member, so
# sums stay exact up to 2^43 ≈ 8.8e12 members per (cluster, dim) —
# comfortably past a 100 TB corpus.
KMEANS_UNIT = float(1 << 20)

_UNITS_SQL = (
    "CAST(SUM(CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1048576.0) "
    "AS BIGINT)) AS BIGINT)"
)

KMEANS_SCALABLE_ORACLE = f"""
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
  SELECT cell, pos, {_UNITS_SQL} AS units, COUNT(*) AS n
  FROM a1, range(1, {DIM + 1}) t(pos) GROUP BY cell, pos),
ce1 AS (
  SELECT cell,
         list(CAST(units AS DOUBLE) / n / 1048576.0 ORDER BY pos) AS ce
  FROM c1 GROUP BY cell),
a2 AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, s.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {COSINE("e.embedding", "s.ce")} DESC, s.cell) AS rn
    FROM embeddings e CROSS JOIN ce1 s) WHERE rn = 1),
f AS (
  SELECT a2.cell AS cluster, pos, {_UNITS_SQL} AS c_units,
         CAST(COUNT(*) AS BIGINT) AS n_members
  FROM a2 JOIN embeddings e ON a2.vec_id = e.vec_id,
       range(1, {DIM + 1}) t(pos)
  GROUP BY a2.cell, pos)
SELECT cluster, pos, c_units,
       CAST(c_units AS DOUBLE) / n_members / 1048576.0 AS c_val,
       n_members
FROM f
"""


def _centroid_units_rows(assigned: DataFrame) -> DataFrame:
    """(cell, pos, units, n): partial+final SUM of integer-quantized
    member coordinates — associative, partition-invariant, no member
    lists. This is the 100 TB centroid update."""
    return (
        assigned.select(
            "cell", F.posexplode("embedding").alias("p0", "valf")
        )
        .groupBy("cell", (F.col("p0") + 1).alias("pos"))
        .agg(
            F.sum(
                F.floor(
                    F.col("valf").cast("double") * F.lit(KMEANS_UNIT)
                ).cast("bigint")
            ).alias("units"),
            F.count("*").alias("n"),
        )
    )


def _units_cval(units: Column, n: Column) -> Column:
    """units/n/2^20 with the exact division order of the oracle."""
    return units.cast("double") / n / F.lit(KMEANS_UNIT)


def kmeans_assignments(
    spark: SparkSession, sf_dir: str, scalable: bool
) -> DataFrame:
    """Final (vec_id, cell) assignments after two Lloyd iterations, for
    either centroid-update path — shared by both keys' tests to assert
    the quantized update does not flip any membership on the fixtures."""
    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    seeds = (
        e.orderBy("vec_id")
        .limit(K_CLUSTERS)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("ce"))
    )
    a1 = _assign(e, seeds)
    if scalable:
        c1 = _centroid_units_rows(a1).select(
            "cell",
            "pos",
            _units_cval(F.col("units"), F.col("n")).alias("cval"),
        )
    else:
        c1 = _centroid_rows(a1)
    return _assign(e, _to_centroid_arrays(c1)).select("vec_id", "cell")


@query("ml_kmeans_scalable", oracle=KMEANS_SCALABLE_ORACLE, category="L")
def ml_kmeans_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations (K=8, cosine assignment) with the
    PRODUCTION centroid update: per-(cluster, dim) SUM of
    ``floor(v · 2^20)`` BIGINT units (map-side combinable, order- and
    partition-invariant because integer addition is associative) instead
    of ``ml_kmeans_fixed``'s ordered fold over per-member lists. Still a
    full hash oracle: exact integer sums reproduce bit-identically in
    DuckDB, and the derived double centroid (units/n/2^20) uses one
    pinned division order.

    Scale: no per-member ``collect_list`` in the plan (pinned in
    tests/test_plans.py); each update is one partial+final hash
    aggregation over (K·DIM) keys; assignments broadcast the K centroid
    arrays and scan the corpus once per iteration. Quantization error is
    ≤ 2^-20 per coordinate — negligible against k-means' own iteration
    noise (and empirically flips no fixture membership; see
    tests/test_pipeline.py)."""
    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    seeds = (
        e.orderBy("vec_id")
        .limit(K_CLUSTERS)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("ce"))
    )
    a1 = _assign(e, seeds)
    ce1 = _to_centroid_arrays(
        _centroid_units_rows(a1).select(
            "cell",
            "pos",
            _units_cval(F.col("units"), F.col("n")).alias("cval"),
        )
    )
    a2 = _assign(e, ce1)
    final = _centroid_units_rows(a2)
    return final.select(
        F.col("cell").alias("cluster"),
        "pos",
        F.col("units").alias("c_units"),
        _units_cval(F.col("units"), F.col("n")).alias("c_val"),
        F.col("n").cast("bigint").alias("n_members"),
    )


# --- farthest-point (k-center) seeding -----------------------------------

FPS_K = 4  # chosen centers (fixed rounds, like graph_*_fixed)


def _fps_oracle() -> str:
    from dbsuite_spark.pipeline.vectors import SQDIST

    stages = [
        """ch1 AS (
  SELECT CAST(1 AS INT) AS round, vec_id, CAST(NULL AS DOUBLE) AS dist2
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 1)),
pick1 AS (SELECT vec_id FROM ch1)"""
    ]
    for r in range(2, FPS_K + 1):
        prev_picks = " UNION ALL ".join(
            f"SELECT vec_id FROM pick{i}" for i in range(1, r)
        )
        stages.append(f"""all{r - 1} AS ({prev_picks}),
m{r} AS (
  SELECT e.vec_id, MIN({SQDIST('e.embedding', 'c.embedding')}) AS md
  FROM embeddings e
  JOIN (SELECT emb.vec_id, emb.embedding FROM embeddings emb
        JOIN all{r - 1} a ON emb.vec_id = a.vec_id) c ON TRUE
  WHERE e.vec_id NOT IN (SELECT vec_id FROM all{r - 1})
  GROUP BY e.vec_id),
ch{r} AS (
  SELECT CAST({r} AS INT) AS round, vec_id, md AS dist2 FROM m{r}
  ORDER BY md DESC, vec_id LIMIT 1),
pick{r} AS (SELECT vec_id FROM ch{r})""")
    union = "\nUNION ALL\n".join(
        f"SELECT round, vec_id, dist2 FROM ch{r}"
        for r in range(1, FPS_K + 1)
    )
    return "WITH " + ",\n".join(stages) + "\n" + union


@query("ml_farthest_point_init", oracle=_fps_oracle(), category="L")
def ml_farthest_point_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Farthest-point (k-center / Gonzalez 1985) seeding, {FPS_K} fixed
    rounds — the deterministic alternative to k-means++ sampling for
    initializing ``ml_kmeans_fixed`` / IVF codebooks: start from the
    lowest-id vector, then repeatedly pick the vector maximizing its
    minimum squared L2 distance to the chosen set (distance DESC,
    vec_id ASC tie-break — no RNG anywhere, the k-means module's
    determinism contract).

    Exactness: squared distances are the sequential double fold of
    ``pipeline.vectors.sqdist`` (bit-identical to the oracle's
    ``SQDIST``); MIN over the chosen set and the argmax comparison
    operate on those identical bits.

    Scale: each round is one corpus scan against a broadcast ≤{FPS_K}-row
    center set, a per-vector MIN, and a 1-row TakeOrdered argmax —
    O(K·corpus) work, no corpus shuffle at all; rounds lineage-truncate
    with lazy localCheckpoints (the BPE/CC discipline). Returns
    (round, vec_id, dist2) with dist2 NULL for the seed."""
    from dbsuite_spark.pipeline.vectors import sqdist

    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    seed = (
        e.orderBy("vec_id")
        .limit(1)
        .select(
            F.lit(1).cast("int").alias("round"),
            "vec_id",
            F.lit(None).cast("double").alias("dist2"),
        )
        .localCheckpoint(eager=False)
    )
    rounds = [seed]
    chosen = seed.select("vec_id")
    for r in range(2, FPS_K + 1):
        cents = e.join(F.broadcast(chosen), "vec_id").select(
            F.col("vec_id").alias("c_id"), F.col("embedding").alias("ce")
        )
        nxt = (
            e.join(F.broadcast(chosen), "vec_id", "left_anti")
            .crossJoin(F.broadcast(cents))
            .groupBy("vec_id")
            .agg(F.min(sqdist(F.col("embedding"), F.col("ce"))).alias("md"))
            .orderBy(F.col("md").desc(), "vec_id")
            .limit(1)
            .select(
                F.lit(r).cast("int").alias("round"),
                "vec_id",
                F.col("md").alias("dist2"),
            )
            .localCheckpoint(eager=False)
        )
        rounds.append(nxt)
        chosen = chosen.unionAll(nxt.select("vec_id"))
    out = rounds[0]
    for frame in rounds[1:]:
        out = out.unionAll(frame)
    return out
