"""Product-quantization (PQ) approximate nearest-neighbor search —
the third ANN family alongside sign-LSH (``sim_search_ann_lsh``) and IVF
(``sim_search_ann_ivf``): Jégou, Douze & Schmid, "Product Quantization
for Nearest Neighbor Search" (TPAMI 2011).

The corpus is compressed to one code per subspace (here 8 subspaces × 8
dims, 16 centroids each → 8 small ints per vector instead of 64 floats);
queries score candidates by Asymmetric Distance Computation (ADC): the
sum over subspaces of the exact distance from the query's subvector to
the centroid the candidate's code names. At 100 TB the scan side touches
only the code table (≈8 bytes/vector), centroids ride along as a
broadcast, and scoring is row-local expression math — no shuffle of the
corpus, same plan family as the other ANN keys.

Determinism (full SQL hash oracle, unusual for PQ):
- the codebook is data-deterministic — the 16 lowest-id vectors, the
  seed convention of ``ml_kmeans_fixed``/``sim_search_ann_ivf`` (a Lloyd
  refinement would slot in from ``pipeline/clustering.py``);
- every distance is a sequential left-to-right double fold
  (pipeline/vectors.py discipline), ties in code assignment break on the
  centroid id and in the top-k on the neighbor id;
- the Spark side assigns codes with a ROW-LOCAL argmin fold (no shuffle);
  the oracle assigns them relationally (explode × rank). Both select by
  the same bit-identical distances, so the chosen codes — and therefore
  every ADC value — agree exactly. Intermediate shape is free; only the
  final projection is compared.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbsuite_spark.registry import query
from dbsuite_spark.tables import t

N_SUB = 8  # subspaces
SUB_DIM = 8  # dims per subspace (N_SUB * SUB_DIM = DIM = 64)
N_CODES = 16  # centroids per subspace (codebook = vec_id < 16)
PQ_TOP_K = 5
QUERY_MOD = 100  # vec_id % 100 == 0 → the query subset (similarity.py)

# (x - y)^2 written as an explicit product so both engines run the same
# IEEE ops (DuckDB's ^ routes through pow()).
_SQ = (
    "(CAST({x}[{s}*{sd} + i] AS DOUBLE) - CAST({c}[{s}*{sd} + i] AS DOUBLE))"
    " * "
    "(CAST({x}[{s}*{sd} + i] AS DOUBLE) - CAST({c}[{s}*{sd} + i] AS DOUBLE))"
)


def _subdist(x: str, c: str, s: str) -> str:
    """DuckDB: exact fold of the squared L2 distance on subspace ``s``."""
    sq = _SQ.format(x=x, c=c, s=s, sd=SUB_DIM)
    return (
        f"list_reduce(list_transform(generate_series(1, {SUB_DIM}), "
        f"i -> {sq}), (a, b) -> a + b)"
    )


_PQ_ORACLE = f"""
WITH cb AS (
  SELECT list(embedding ORDER BY vec_id) AS cbook
  FROM embeddings WHERE vec_id < {N_CODES}),
dists AS (
  SELECT e.vec_id, ss.s, cc.c,
         {_subdist('e.embedding', 'cbook[cc.c + 1]', 'ss.s')} AS d
  FROM embeddings e, cb,
       (SELECT unnest(generate_series(0, {N_SUB - 1})) AS s) ss,
       (SELECT unnest(generate_series(0, {N_CODES - 1})) AS c) cc),
codes AS (
  SELECT vec_id, list(c ORDER BY s) AS codes FROM (
    SELECT vec_id, s, c,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn
    FROM dists) WHERE rn = 1
  GROUP BY vec_id),
adc AS (
  SELECT q.vec_id AS qid, x.vec_id AS neighbor_id,
         list_reduce(list_transform(generate_series(0, {N_SUB - 1}),
             s -> {_subdist('q.embedding', 'cbook[x.codes[s + 1] + 1]', 's')}),
             (a, b) -> a + b) AS adc_dist
  FROM (SELECT vec_id, embedding FROM embeddings
        WHERE vec_id % {QUERY_MOD} = 0) q,
       codes x, cb
  WHERE x.vec_id <> q.vec_id)
SELECT qid, neighbor_id, adc_dist, CAST(rn AS INT) AS rank FROM (
  SELECT *, row_number() OVER (
      PARTITION BY qid ORDER BY adc_dist, neighbor_id) AS rn
  FROM adc) WHERE rn <= {PQ_TOP_K}
"""


def _spark_subdist(x: Column, cbook: Column, code: Column, s) -> Column:
    """Squared L2 distance between ``x``'s subspace ``s`` slice and
    centroid ``code``'s same slice — sequential fold, oracle-identical."""
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(SUB_DIM)),
        F.lit(0.0),
        lambda acc, i: acc
        + (
            F.element_at(x, s * SUB_DIM + i).cast("double")
            - F.element_at(
                F.element_at(cbook, code + 1), s * SUB_DIM + i
            ).cast("double")
        )
        * (
            F.element_at(x, s * SUB_DIM + i).cast("double")
            - F.element_at(
                F.element_at(cbook, code + 1), s * SUB_DIM + i
            ).cast("double")
        ),
    )


def _codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: ``cbook`` = the {N_CODES} lowest-id embeddings, id order."""
    e = t(spark, sf_dir, "embeddings")
    return (
        e.filter(F.col("vec_id") < N_CODES)
        .groupBy()
        .agg(
            F.array_sort(
                F.collect_list(F.struct("vec_id", "embedding"))
            ).alias("pairs")
        )
        .select(F.transform("pairs", lambda p: p["embedding"]).alias("cbook"))
    )


def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, codes array<int>): row-local argmin over the broadcast
    codebook — one corpus scan, no shuffle (the PQ *encode* step)."""
    e = t(spark, sf_dir, "embeddings")
    enc = e.crossJoin(F.broadcast(_codebook(spark, sf_dir)))

    def best_code(s):
        # argmin with lowest-code tie-break: array_position returns the
        # FIRST index holding the min, and the candidate list is in code
        # order — identical selection to the oracle's ORDER BY d, c.
        dists = F.transform(
            F.sequence(F.lit(0), F.lit(N_CODES - 1)),
            lambda c: _spark_subdist(
                F.col("embedding"), F.col("cbook"), c, s
            ),
        )
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    return enc.select(
        "vec_id",
        F.array(*[best_code(F.lit(s)) for s in range(N_SUB)]).alias("codes"),
    )


@query("sim_search_pq_adc", oracle=_PQ_ORACLE, category="L")
def sim_search_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC top-{PQ_TOP_K}: encode the corpus to 8 four-bit codes per
    vector (row-local argmin over a broadcast 16-entry-per-subspace
    codebook), then score query × corpus by the asymmetric distance sum
    and keep the k closest per query (ties on neighbor id). The final
    top-k shuffles only (qid, neighbor_id, adc_dist) candidate rows."""
    codes = pq_codes(spark, sf_dir)
    e = t(spark, sf_dir, "embeddings")
    q = (
        e.filter(F.col("vec_id") % QUERY_MOD == 0)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
        .crossJoin(F.broadcast(_codebook(spark, sf_dir)))
    )
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(N_SUB - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + _spark_subdist(
            F.col("qe"),
            F.col("cbook"),
            F.element_at("codes", s + 1),
            s,
        ),
    )
    pairs = codes.join(
        F.broadcast(q), F.col("vec_id") != F.col("qid")
    ).select(
        "qid",
        F.col("vec_id").alias("neighbor_id"),
        adc.alias("adc_dist"),
    )
    w = Window.partitionBy("qid").orderBy("adc_dist", "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= PQ_TOP_K)
        .select("qid", "neighbor_id", "adc_dist", "rank")
    )
