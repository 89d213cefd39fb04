"""Two-stage hybrid retrieval: idf-weighted lexical candidate generation
followed by embedding-cosine reranking — the canonical production RAG /
nearest-document shape (cheap sparse recall, expensive dense precision),
composed entirely from verified substrates: the 3-shingle inverted index
of ``pipeline/dedup.py`` and the fold-cosine of ``pipeline/vectors.py``.

Scale (100 TB): stage 1 is an inverted-index join — the query side's
shingles hash-join the corpus index on the shingle key, and fan-out is
bounded by dropping boilerplate shingles with document frequency >
``RETRIEVAL_DF_CAP`` *before* the join (the ``cap_stop_shingles``
discipline; such shingles carry near-zero idf anyway, so the ranking
loss is negligible while the worst-case join blow-up goes from df_max²
to CAP²). Stage 2 touches only queries × LEX_K candidate pairs — the
whole point of the two-stage design: the expensive O(dim) cosine runs on
a candidate set that is constant per query, not on the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbsuite_spark.exact import DSUM, dsum
from dbsuite_spark.pipeline.dedup import shingles
from dbsuite_spark.pipeline.vectors import COSINE, cosine
from dbsuite_spark.registry import query
from dbsuite_spark.tables import memo_cache, t

RETRIEVAL_QMOD = 25  # doc_id % 25 == 0 → the query subset
RETRIEVAL_DF_CAP = 50  # shingles in more docs than this are dropped
LEX_K = 20  # lexical candidates per query
RERANK_K = 5  # final reranked neighbors per query

_SHINGLE_SQL = """
toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
sh AS (SELECT DISTINCT doc_id,
              unnest(list_transform(generate_series(1, len(tk) - 2),
                     i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
       FROM toks)
"""


@query(
    "sim_search_hybrid_rerank",
    oracle=f"""
WITH {_SHINGLE_SQL},
idx AS (
  SELECT s, round(ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                    / COUNT(*)), 6) AS w
  FROM sh GROUP BY s HAVING COUNT(*) <= {RETRIEVAL_DF_CAP}),
lex AS (
  SELECT q.doc_id AS qid, c.doc_id AS cand_id, {DSUM('i.w')} AS lex_score
  FROM sh q
  JOIN idx i ON q.s = i.s
  JOIN sh c ON c.s = i.s AND c.doc_id <> q.doc_id
  WHERE q.doc_id % {RETRIEVAL_QMOD} = 0
  GROUP BY q.doc_id, c.doc_id),
cands AS (
  SELECT qid, cand_id, lex_score FROM (
    SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY lex_score DESC, cand_id) AS rn
    FROM lex) WHERE rn <= {LEX_K}),
rr AS (
  SELECT c.qid, c.cand_id, c.lex_score,
         {COSINE('qe.embedding', 'ce.embedding')} AS cos_sim
  FROM cands c
  JOIN embeddings qe ON qe.vec_id = c.qid
  JOIN embeddings ce ON ce.vec_id = c.cand_id)
SELECT qid, cand_id, lex_score, cos_sim, CAST(rn AS INT) AS rank FROM (
  SELECT *, row_number() OVER (
      PARTITION BY qid ORDER BY cos_sim DESC, cand_id) AS rn
  FROM rr) WHERE rn <= {RERANK_K}
""",
    category="L",
)
def sim_search_hybrid_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: idf-weighted shingle-overlap recall (top 20 per
    query) reranked by embedding cosine (top 5). Lexical scores are
    decimal sums of 6-dp idf weights (order-free, hash-exact); cosines
    are the bit-identical sequential fold of ``pipeline.vectors``; every
    top-k has a unique total order via the candidate-id tie-break.

    Plan shape: shingle df aggregation (map-side combine) → broadcast-able
    idf index join → per-query window on the capped candidate pairs →
    two hash joins against embeddings for exactly (queries × LEX_K) rows
    → bounded rerank window. No cartesian, no corpus-wide dense math."""
    d = t(spark, sf_dir, "documents")
    sh = d.select("doc_id", F.explode(shingles(F.col("text"))).alias("s"))
    n_docs = d.count()  # scalar for the idf; one tiny job, driver-held

    idx = (
        sh.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= RETRIEVAL_DF_CAP)
        .select(
            "s",
            F.round(F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("w"),
        )
    )
    q = sh.filter(F.col("doc_id") % RETRIEVAL_QMOD == 0).select(
        F.col("doc_id").alias("qid"), "s"
    )
    c = sh.select(F.col("doc_id").alias("cand_id"), "s")
    lex = (
        q.join(idx, "s")
        .join(c, "s")
        .filter(F.col("cand_id") != F.col("qid"))
        .groupBy("qid", "cand_id")
        .agg(dsum(F.col("w")).alias("lex_score"))
    )
    w_lex = Window.partitionBy("qid").orderBy(
        F.col("lex_score").desc(), "cand_id"
    )
    cands = (
        lex.withColumn("rn", F.row_number().over(w_lex))
        .filter(F.col("rn") <= LEX_K)
        .drop("rn")
    )

    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qe = e.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    ce = e.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cemb")
    )
    rr = (
        cands.join(qe, "qid")
        .join(ce, "cand_id")
        .withColumn("cos_sim", cosine(F.col("qe"), F.col("cemb")))
    )
    w_rr = Window.partitionBy("qid").orderBy(
        F.col("cos_sim").desc(), "cand_id"
    )
    return (
        rr.withColumn("rank", F.row_number().over(w_rr).cast("int"))
        .filter(F.col("rank") <= RERANK_K)
        .select("qid", "cand_id", "lex_score", "cos_sim", "rank")
    )


RRF_K0 = 60  # the standard RRF damping constant
RRF_QMOD = 100  # query subset: ids with an embedding AND sparse text
RRF_OUT_K = 5


_RRF_ORACLE = f"""
WITH {_SHINGLE_SQL},
idx AS (
  SELECT s, round(ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                    / COUNT(*)), 6) AS w
  FROM sh GROUP BY s HAVING COUNT(*) <= {RETRIEVAL_DF_CAP}),
lex AS (
  SELECT q.doc_id AS qid, c.doc_id AS cand_id, {DSUM('i.w')} AS lex_score
  FROM sh q
  JOIN idx i ON q.s = i.s
  JOIN sh c ON c.s = i.s AND c.doc_id <> q.doc_id
  WHERE q.doc_id % {RRF_QMOD} = 0
  GROUP BY q.doc_id, c.doc_id),
lexr AS (
  SELECT qid, cand_id, rn AS lex_rank FROM (
    SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY lex_score DESC, cand_id) AS rn
    FROM lex) WHERE rn <= {LEX_K}),
vecr AS (
  SELECT qid, cand_id, rn AS vec_rank FROM (
    SELECT q.vec_id AS qid, e.vec_id AS cand_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {COSINE('q.embedding', 'e.embedding')} DESC,
                      e.vec_id) AS rn
    FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
    WHERE q.vec_id % {RRF_QMOD} = 0) WHERE rn <= {LEX_K}),
fused AS (
  SELECT COALESCE(l.qid, v.qid) AS qid,
         COALESCE(l.cand_id, v.cand_id) AS cand_id,
         l.lex_rank, v.vec_rank,
         COALESCE(1.0 / ({RRF_K0} + l.lex_rank), 0.0)
           + COALESCE(1.0 / ({RRF_K0} + v.vec_rank), 0.0) AS rrf_score
  FROM lexr l FULL OUTER JOIN vecr v
    ON l.qid = v.qid AND l.cand_id = v.cand_id)
SELECT qid, cand_id,
       CAST(lex_rank AS BIGINT) AS lex_rank,
       CAST(vec_rank AS BIGINT) AS vec_rank,
       rrf_score, CAST(rn AS INT) AS rank
FROM (SELECT *, row_number() OVER (
          PARTITION BY qid ORDER BY rrf_score DESC, cand_id) AS rn
      FROM fused) WHERE rn <= {RRF_OUT_K}
"""


@query("sim_search_rrf_fusion", oracle=_RRF_ORACLE, category="L")
def sim_search_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-Rank Fusion (Cormack et al. 2009, public) of the two
    retrieval modalities: the idf-weighted lexical top-20 and the exact
    cosine top-20 are fused per query by Σ 1/(60 + rank) over the lists
    containing the candidate, then cut to the top 5. The complement of
    ``sim_search_hybrid_rerank``'s cascade — fusion keeps candidates
    either ranker found, the standard recipe when neither modality
    dominates. Scores are two correctly-rounded divisions added in one
    pinned order (lexical term first) with absent lists contributing an
    exact 0.0, and integer ranks tie-break on candidate id — so the
    fused ranking is bit-deterministic.

    Scale: both rank lists bound their own cost (DF-capped inverted
    index; brute-force cosine is the audit path with sign-LSH named as
    the corpus-scale replacement); fusion itself joins two
    (queries × 20)-row frames — negligible."""
    d = t(spark, sf_dir, "documents")
    sh = d.select("doc_id", F.explode(shingles(F.col("text"))).alias("s"))
    n_docs = d.count()  # scalar for the idf; one tiny job, driver-held
    idx = (
        sh.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= RETRIEVAL_DF_CAP)
        .select(
            "s",
            F.round(F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("w"),
        )
    )
    q = sh.filter(F.col("doc_id") % RRF_QMOD == 0).select(
        F.col("doc_id").alias("qid"), "s"
    )
    c = sh.select(F.col("doc_id").alias("cand_id"), "s")
    lex = (
        q.join(idx, "s")
        .join(c, "s")
        .filter(F.col("cand_id") != F.col("qid"))
        .groupBy("qid", "cand_id")
        .agg(dsum(F.col("w")).alias("lex_score"))
    )
    w_lex = Window.partitionBy("qid").orderBy(
        F.col("lex_score").desc(), "cand_id"
    )
    lexr = (
        lex.withColumn("lex_rank", F.row_number().over(w_lex))
        .filter(F.col("lex_rank") <= LEX_K)
        .select("qid", "cand_id", "lex_rank")
    )

    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qe = e.filter(F.col("vec_id") % RRF_QMOD == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb")
    )
    # broadcast the SMALL query side; the corpus streams through one scan
    pairs = (
        e.select(
            F.col("vec_id").alias("cand_id"),
            F.col("embedding").alias("cemb"),
        )
        .crossJoin(F.broadcast(qe))
        .filter(F.col("cand_id") != F.col("qid"))
        .withColumn("cos_sim", cosine(F.col("qemb"), F.col("cemb")))
    )
    w_vec = Window.partitionBy("qid").orderBy(
        F.col("cos_sim").desc(), "cand_id"
    )
    vecr = (
        pairs.withColumn("vec_rank", F.row_number().over(w_vec))
        .filter(F.col("vec_rank") <= LEX_K)
        .select("qid", "cand_id", "vec_rank")
    )

    fused = lexr.join(vecr, ["qid", "cand_id"], "full_outer").select(
        "qid",
        "cand_id",
        "lex_rank",
        "vec_rank",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K0) + F.col("lex_rank")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K0) + F.col("vec_rank")), F.lit(0.0)
            )
        ).alias("rrf_score"),
    )
    w_f = Window.partitionBy("qid").orderBy(
        F.col("rrf_score").desc(), "cand_id"
    )
    return (
        fused.withColumn("rank", F.row_number().over(w_f).cast("int"))
        .filter(F.col("rank") <= RRF_OUT_K)
        .select(
            "qid",
            "cand_id",
            F.col("lex_rank").cast("bigint").alias("lex_rank"),
            F.col("vec_rank").cast("bigint").alias("vec_rank"),
            "rrf_score",
            "rank",
        )
    )


# --- sim_search_mmr_diversify (round 5) -----------------------------------
#
# Maximal Marginal Relevance (Carbonell & Goldstein 1998): re-rank a
# query's candidate list to balance relevance against redundancy —
# greedily pick argmax 0.7·rel(c) − 0.3·max_{s∈S} sim(c, s). The standard
# result-diversification pass for RAG retrieval, which Spark has no
# built-in for. Implemented as a STATIC unrolled K-step DataFrame DAG:
# greedy selection is inherently sequential in K, but K is a small fixed
# constant (5), so each step is one bounded join + window argmax — no
# Python, no collect, no iteration state outside the lineage.
#
# Scale (100 TB): the expensive part is the initial top-C candidate
# generation, which reuses the broadcast-query brute-force substrate
# (sim_search_cosine_topk); everything after runs on Q×C rows (C = 10 per
# query — constant), so the K greedy steps cost O(Q·C²) TOTAL, independent
# of corpus size. Candidate-pair similarities are computed once up front
# (C² per query) and reused by every step.
#
# Determinism: cosines are the bit-identical sequential fold
# (pipeline/vectors.py); the MMR score is the shared literal expression
# `0.7 * rel - 0.3 * maxsim` (identical IEEE op order both engines);
# every argmax tie-breaks on neighbor_id.

MMR_CAND = 10  # candidates per query fed to MMR
MMR_K = 5  # diversified results per query
_MMR_SCORE = "0.7 * rel - 0.3 * maxsim"


def _mmr_oracle() -> str:
    from dbsuite_spark.pipeline.similarity import QUERY_MOD

    head = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           WHERE vec_id % {QUERY_MOD} = 0),
allp AS (
  SELECT q.qid, e.vec_id AS neighbor_id,
         {COSINE('q.qe', 'e.embedding')} AS rel
  FROM q, embeddings e
  WHERE e.vec_id <> q.qid),
cand AS (
  SELECT qid, neighbor_id, rel FROM (
    SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY rel DESC, neighbor_id) AS rn
    FROM allp) WHERE rn <= {MMR_CAND}),
csim AS (
  SELECT a.qid, a.neighbor_id AS a_id, b.neighbor_id AS b_id,
         {COSINE('ea.embedding', 'eb.embedding')} AS sim
  FROM cand a
  JOIN cand b ON a.qid = b.qid AND a.neighbor_id <> b.neighbor_id
  JOIN embeddings ea ON ea.vec_id = a.neighbor_id
  JOIN embeddings eb ON eb.vec_id = b.neighbor_id),
s1 AS (
  SELECT qid, neighbor_id, rel, 1 AS mmr_rank, 0.7 * rel AS mmr_score
  FROM (SELECT *, row_number() OVER (
            PARTITION BY qid ORDER BY rel DESC, neighbor_id) AS rn
        FROM cand) WHERE rn = 1),
sel1 AS (SELECT qid, neighbor_id FROM s1)"""
    steps = []
    for k in range(2, MMR_K + 1):
        p = k - 1
        steps.append(f"""
score{k} AS (
  SELECT c.qid, c.neighbor_id, c.rel, MAX(cs.sim) AS maxsim
  FROM cand c
  JOIN csim cs ON cs.qid = c.qid AND cs.a_id = c.neighbor_id
  JOIN sel{p} s ON s.qid = cs.qid AND s.neighbor_id = cs.b_id
  LEFT JOIN sel{p} me
         ON me.qid = c.qid AND me.neighbor_id = c.neighbor_id
  WHERE me.neighbor_id IS NULL
  GROUP BY c.qid, c.neighbor_id, c.rel),
s{k} AS (
  SELECT qid, neighbor_id, rel, {k} AS mmr_rank,
         {_MMR_SCORE} AS mmr_score
  FROM (SELECT *, row_number() OVER (
            PARTITION BY qid
            ORDER BY {_MMR_SCORE} DESC, neighbor_id) AS rn
        FROM score{k}) WHERE rn = 1),
sel{k} AS (SELECT qid, neighbor_id FROM sel{p}
           UNION ALL SELECT qid, neighbor_id FROM s{k})""")
    tail = (
        "\nSELECT qid, neighbor_id, CAST(mmr_rank AS INT) AS mmr_rank,"
        " rel, mmr_score FROM ("
        + " UNION ALL ".join(
            f"SELECT * FROM s{k}" for k in range(1, MMR_K + 1)
        )
        + ")"
    )
    return head + "," + ",".join(steps) + tail


@query("sim_search_mmr_diversify", oracle=_mmr_oracle(), category="L")
def sim_search_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR result diversification, K=5 over C=10 cosine candidates per
    query (block comment above: static unrolled greedy DAG, bounded
    joins, bit-identical scores, id tie-breaks)."""
    from dbsuite_spark.pipeline.similarity import _cosine_pairs, _topk
    from dbsuite_spark.pipeline.vectors import dot, l2_norm

    # Both bounded frames (C=10 candidates per query; C² pair sims) feed
    # EVERY greedy round twice (anti-join + max-sim join), so without a
    # materialization the unrolled DAG re-plans ~3^K copies of the
    # all-pairs cosine subtree — 16 s of Catalyst planning at fixture
    # scale, worse at any real K. Cache once; rounds then join two tiny
    # in-memory relations.
    cand = memo_cache(
        _topk(_cosine_pairs(spark, sf_dir), MMR_CAND)
        .select("qid", "neighbor_id", F.col("cos_sim").alias("rel")),
        f"mmr_cand:{sf_dir}:{MMR_CAND}",
    )
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("nrm")
    )
    ce = cand.join(
        e, cand.neighbor_id == e.vec_id
    ).select("qid", "neighbor_id", "embedding", "nrm")
    a = ce.select(
        F.col("qid").alias("p_qid"),
        F.col("neighbor_id").alias("a_id"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = ce.select(
        F.col("qid").alias("p_qid"),
        F.col("neighbor_id").alias("b_id"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    csim = memo_cache(
        a.join(b, ["p_qid"])
        .where(F.col("a_id") != F.col("b_id"))
        .select(
            F.col("p_qid").alias("qid"),
            "a_id",
            "b_id",
            (
                dot(F.col("ea"), F.col("eb"))
                / (F.col("na") * F.col("nb"))
            ).alias("sim"),
        ),
        f"mmr_csim:{sf_dir}",
    )
    w_rel = Window.partitionBy("qid").orderBy(
        F.col("rel").desc(), "neighbor_id"
    )
    out = (
        cand.withColumn("rn", F.row_number().over(w_rel))
        .where(F.col("rn") == 1)
        .select(
            "qid",
            "neighbor_id",
            "rel",
            F.lit(1).alias("mmr_rank"),
            F.expr("0.7 * rel").alias("mmr_score"),
        )
    )
    selected = out.select("qid", "neighbor_id")
    for k in range(2, MMR_K + 1):
        maxsim = (
            csim.join(
                selected.withColumnRenamed("neighbor_id", "b_id"),
                ["qid", "b_id"],
            )
            .groupBy("qid", "a_id")
            .agg(F.max("sim").alias("maxsim"))
        )
        scored = (
            cand.join(selected, ["qid", "neighbor_id"], "left_anti")
            .join(
                maxsim.withColumnRenamed("a_id", "neighbor_id"),
                ["qid", "neighbor_id"],
            )
            .withColumn("mmr_score", F.expr(_MMR_SCORE))
        )
        w_sc = Window.partitionBy("qid").orderBy(
            F.col("mmr_score").desc(), "neighbor_id"
        )
        sk = (
            scored.withColumn("rn", F.row_number().over(w_sc))
            .where(F.col("rn") == 1)
            .select(
                "qid",
                "neighbor_id",
                "rel",
                F.lit(k).alias("mmr_rank"),
                "mmr_score",
            )
            # flatten lineage per round (the CC-loop discipline): sk is
            # one row per query, but it is consumed by BOTH growing
            # unions and the next round's two joins — unchecked, the
            # plan triples per round
            .localCheckpoint(eager=False)
        )
        out = out.unionAll(sk)
        selected = selected.unionAll(sk.select("qid", "neighbor_id"))
    return out.select(
        "qid",
        "neighbor_id",
        F.col("mmr_rank").cast("int").alias("mmr_rank"),
        "rel",
        "mmr_score",
    )
