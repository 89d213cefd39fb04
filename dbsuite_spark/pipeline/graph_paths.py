"""Seeded graph traversals (round 5): BFS hop distance and personalized
PageRank over the user ↔ event-type interaction graph of ``graph.py``.

``graph_sssp_hops`` is breadth-first single-source shortest path (the
unweighted SSSP special case) with a fixed 4-hop radius — the primitive
behind "blast radius" / reachability queries. ``graph_ppr_seeded`` is
personalized PageRank: all restart mass returns to ONE seed node, giving
a similarity-to-seed ranking (the classic seed-expansion recommender) —
contrast with ``graph_pagerank_fixed``'s uniform restart.

Cross-engine exactness: hops are pure integers; PPR uses the same scaled
BIGINT fixed-point arithmetic as ``graph.py`` (floor division, exact
commutative integer sums) so both keys are bit-identical across engines
and partitionings with no rounding tolerance.

Scale design (100 TB): BFS keeps an explicit frontier — each round joins
only the newly-reached nodes against the edge list (hash join on src)
and anti-joins the known set, so per-round cost is O(frontier edges),
not O(all reached); 4 rounds = a static 4-stage DAG, no driver loop
state beyond the DataFrame lineage. PPR is per-round edge⋈rank joins
exactly like PageRank; mass stays concentrated near the seed so the
rank table is small and broadcastable in early rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsuite_spark.pipeline.graph import _S, _edges
from dbsuite_spark.registry import query
from dbsuite_spark.tables import t

MAX_HOPS = 4
PPR_ITERS = 3

_GRAPH_PRELUDE = """
base AS (
  SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS u,
                  'e' || event_type AS v
  FROM events),
edges AS (
  SELECT u AS src, v AS dst FROM base
  UNION ALL
  SELECT v AS src, u AS dst FROM base),
seed AS (SELECT MIN('e' || event_type) AS node FROM events)
"""


def _seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row seed: lexicographic min event node (engine-independent)."""
    return t(spark, sf_dir, "events").agg(
        F.min(F.concat(F.lit("e"), F.col("event_type"))).alias("node")
    )


@query(
    "graph_sssp_hops",
    oracle=f"""
WITH RECURSIVE
{_GRAPH_PRELUDE},
walk (node, hop) AS (
  SELECT node, 0 FROM seed
  UNION
  SELECT e.dst, w.hop + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.hop < {MAX_HOPS})
SELECT node, CAST(MIN(hop) AS BIGINT) AS hop
FROM walk GROUP BY node
""",
    category="L",
)
def graph_sssp_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distance from the min event node, radius 4. Frontier
    BFS: round k joins only hop-(k-1) nodes to edges, anti-joins
    already-reached nodes — each edge is expanded at most once per
    endpoint discovery, the scale-correct unweighted SSSP. Oracle is
    the equivalent bounded recursive CTE (UNION-dedup on (node, hop)).

    Round-13 optimization (guide §2.4; the ``graph_weighted_sssp`` /
    CC lineage rule): ``dist`` is referenced TWICE per round (the
    anti-join probe and the union), so pure lineage COMPOUNDS — round
    k recomputes every earlier frontier expansion ~2^k times, and the
    unrolled plan carried 437 exchanges. Lazy ``localCheckpoint`` on
    each round's frontier and dist truncates that: each round builds
    on the previous round's materialized blocks. Results are
    bit-identical (checkpointing is semantics-neutral; equality-gated
    row-for-row at sf0.1 before adoption). Interleaved same-session at
    sf0.1, both orderings: old 6.59/5.82/5.40/5.62/5.46 s vs new
    3.21/3.88/2.67/2.59/2.64 s — new won 8 of 9 post-warmup adjacent
    pairs (~2×). Contrast with ``graph_pagerank_fixed``, where the
    loop state is referenced ONCE per round (linear lineage) and the
    measured barrier variant LOST — compounding is the criterion."""
    edges = _edges(spark, sf_dir)
    dist = _seed(spark, sf_dir).select(
        "node", F.lit(0).cast("bigint").alias("hop")
    )
    frontier = dist
    for k in range(1, MAX_HOPS + 1):
        reached = (
            edges.join(frontier, edges.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        frontier = (
            reached.join(dist, "node", "left_anti")
            .select("node", F.lit(k).cast("bigint").alias("hop"))
            .localCheckpoint(eager=False)
        )
        dist = dist.unionAll(frontier).localCheckpoint(eager=False)
    return dist


def _ppr_step(i: int) -> str:
    prev = f"r{i - 1}"
    return f"""
s{i} AS (
  SELECT e.dst AS node, SUM(r.ru // d.outdeg) AS s
  FROM edges e
  JOIN {prev} r ON e.src = r.node
  JOIN deg d    ON e.src = d.src
  GROUP BY e.dst),
r{i} AS (
  SELECT node, CAST(SUM(x) AS BIGINT) AS ru
  FROM (
    SELECT node, (15 * CAST({_S} AS BIGINT)) // 100 AS x FROM seed
    UNION ALL
    SELECT node, (85 * s) // 100 AS x FROM s{i})
  GROUP BY node)
"""


@query(
    "graph_ppr_seeded",
    oracle=(
        "WITH\n"
        + _GRAPH_PRELUDE
        + """,
deg AS (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
  FROM edges GROUP BY src),
r0 AS (SELECT node, CAST({S} AS BIGINT) AS ru FROM seed),
""".format(S=_S)
        + ",".join(_ppr_step(i) for i in range(1, PPR_ITERS + 1))
        + f"\nSELECT node, ru AS rank_units FROM r{PPR_ITERS}"
    ),
    category="L",
)
def graph_ppr_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration personalized PageRank (damping 0.85, ALL restart mass
    to the seed node) in exact BIGINT units — similarity-to-seed scores
    for seed-expansion recommendation. Per round: one edge⋈rank shuffle
    join + grouped integer sum + the 1-row seed restart unioned in."""
    edges = _edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    seed = _seed(spark, sf_dir)
    ranks = seed.select(
        "node", F.lit(_S).cast("bigint").alias("ru")
    )
    restart = seed.select(
        "node",
        F.lit((15 * _S) // 100).cast("bigint").alias("x"),
    )
    for _ in range(PPR_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("ru div outdeg")).alias("s"))
            .select(
                F.col("dst").alias("node"),
                F.expr("(85 * s) div 100").alias("x"),
            )
        )
        ranks = (
            restart.unionAll(contrib)
            .groupBy("node")
            .agg(F.sum("x").cast("bigint").alias("ru"))
        )
    return ranks.select("node", F.col("ru").alias("rank_units"))


BF_ROUNDS = 4  # Bellman-Ford relaxation rounds (graph diameter ~3)

_WSSSP_PRELUDE = """
base AS (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS u,
         'e' || event_type AS v,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM events GROUP BY 1, 2),
edges AS (
  SELECT u AS src, v AS dst, w FROM base
  UNION ALL
  SELECT v AS src, u AS dst, w FROM base),
seed AS (SELECT MIN('e' || event_type) AS node FROM events),
d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM seed)
"""


def _bf_stage(k: int) -> str:
    return f"""
d{k} AS (
  SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
    SELECT node, dist FROM d{k - 1}
    UNION ALL
    SELECT e.dst AS node, d.dist + e.w AS dist
    FROM d{k - 1} d JOIN edges e ON e.src = d.node)
  GROUP BY node)"""


@query(
    "graph_weighted_sssp",
    oracle="WITH "
    + _WSSSP_PRELUDE
    + ","
    + ",".join(_bf_stage(k) for k in range(1, BF_ROUNDS + 1))
    + f"""
SELECT node, dist FROM d{BF_ROUNDS}
""",
    category="L",
)
def graph_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED single-source shortest path — Bellman-Ford with
    {BF_ROUNDS} relaxation rounds over the interaction graph, edge
    weight = interaction count (so min-cost routes prefer RARE
    user↔type links; ``graph_sssp_hops`` is the unweighted special
    case and can disagree with this key whenever a longer-hop,
    lower-weight route exists). Distances are exact integer sums and
    MIN is order-free, so every round's table is bit-identical on both
    engines; the oracle unrolls the identical {BF_ROUNDS}-stage
    relaxation as CTEs. The oracle cannot detect non-convergence (it
    unrolls the SAME round count), so convergence is pinned separately:
    ``tests/test_round9_semantics.py`` runs one EXTRA round and asserts
    no distance changes — the result is a true shortest distance, not
    merely min cost over ≤{BF_ROUNDS}-edge paths (ADVICE r09 #3).

    Scale: each round is one hash join of the current distance table
    against the edge list (both partitioned on the join key) + one
    min-combine — the textbook distributed Bellman-Ford whose round
    count bounds path length; per-round ``localCheckpoint`` truncates
    the growing lineage exactly like the BFS/PageRank family. Frontier
    filtering (relax only improved nodes) is the production
    optimization when diameters are large; at diameter ~3 the full
    relaxation is already minimal."""
    e = t(spark, sf_dir, "events")
    base = e.groupBy(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("u"),
        F.concat(F.lit("e"), F.col("event_type")).alias("v"),
    ).agg(F.count("*").cast("bigint").alias("w"))
    edges = base.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "w"
    ).unionAll(
        base.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w")
    )
    dist = _seed(spark, sf_dir).select(
        "node", F.lit(0).cast("bigint").alias("dist")
    ).localCheckpoint(eager=False)
    for _ in range(BF_ROUNDS):
        relaxed = (
            edges.join(dist, edges.src == dist.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
        )
        dist = (
            dist.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("dist").cast("bigint").alias("dist"))
            .localCheckpoint(eager=False)
        )
    return dist
