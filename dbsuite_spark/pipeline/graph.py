"""Graph analytics over fixture-derived graphs: fixed-iteration PageRank.

Companion to ``dedup_connected_components`` (pipeline/dedup.py) — together
they cover the two iterative-graph primitives a large-scale corpus
pipeline needs (duplicate clustering and influence/centrality scoring).
The graph here is the bipartite user ↔ event-type interaction graph from
the ``events`` table, symmetrized so every node has out-edges.

Cross-engine exactness (the interesting part): floating-point PageRank is
summation-order-dependent — the per-node neighbor sum would differ between
Spark's shuffle order and DuckDB's, breaking the driver's value hash. This
implementation therefore runs **entirely in scaled integer arithmetic**:
ranks are BIGINT "units" summing to ~10^15, every division is floor
division (Spark ``DIV`` ≡ DuckDB ``//``), and BIGINT sums are exact and
commutative — so a 3-iteration PageRank is *bit-identical* on both
engines, with no rounding tolerance anywhere. The same trick is how
deterministic distributed PageRank is done at cluster scale (integer
fixed-point propagation commutes across any partitioning).

Scale design (100 TB): edges/deg materialize from one distinct-pass over
events (map-side partial distinct); each iteration is one shuffle join
(edges ⋈ ranks on src, both hash-partitioned on the join key) plus one
grouped integer sum on dst. Iteration count is fixed (3) so the plan is a
static 3-stage DAG — no driver-side convergence loop, no collect. The
node-count scalar is a 1-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsuite_spark.registry import query
from dbsuite_spark.tables import t

_S = 1_000_000_000_000_000  # total rank mass in integer units (~10^15)


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric bipartite edge list: u:<user_id> ↔ e:<event_type>."""
    e = t(spark, sf_dir, "events").select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("u"),
        F.concat(F.lit("e"), F.col("event_type")).alias("v"),
    ).distinct()
    return e.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        e.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )


_PR_ORACLE_PRELUDE = f"""
WITH base AS (
  SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS u,
                  'e' || event_type AS v
  FROM events),
edges AS (
  SELECT u AS src, v AS dst FROM base
  UNION ALL
  SELECT v AS src, u AS dst FROM base),
deg AS (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
  FROM edges GROUP BY src),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
r0 AS (
  SELECT src AS node, CAST({_S} AS BIGINT) // n AS ru FROM deg, nn)
"""


def _PR_STEP(i: int) -> str:
    prev = f"r{i - 1}"
    return f"""
s{i} AS (
  SELECT e.dst AS node, SUM(r.ru // d.outdeg) AS s
  FROM edges e
  JOIN {prev} r ON e.src = r.node
  JOIN deg d    ON e.src = d.src
  GROUP BY e.dst),
r{i} AS (
  SELECT node,
         CAST((15 * (CAST({_S} AS BIGINT) // n)) // 100
              + (85 * s) // 100 AS BIGINT) AS ru
  FROM s{i}, nn)
"""


@query(
    "graph_pagerank_fixed",
    oracle=(
        _PR_ORACLE_PRELUDE
        + ","
        + ",".join(_PR_STEP(i) for i in (1, 2, 3))
        + "\nSELECT node, ru AS rank_units FROM r3"
    ),
    category="L",
)
def graph_pagerank_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank (damping 0.85) over the user↔event-type graph,
    in exact integer units — bit-identical across engines and partition
    orders (module docstring). Output: every node with its final rank in
    BIGINT units (sum ≈ 10^15)."""
    edges = _edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    n_df = deg.agg(F.count("*").alias("n"))
    ranks = deg.crossJoin(F.broadcast(n_df)).select(
        F.col("src").alias("node"),
        F.expr(f"CAST({_S} AS BIGINT) div n").alias("ru"),
    )
    for _ in range(3):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("ru div outdeg")).alias("s"))
        )
        ranks = contrib.crossJoin(F.broadcast(n_df)).select(
            F.col("dst").alias("node"),
            F.expr(
                f"CAST((15 * (CAST({_S} AS BIGINT) div n)) div 100"
                " + (85 * s) div 100 AS BIGINT)"
            ).alias("ru"),
        )
    return ranks.select("node", F.col("ru").alias("rank_units"))
