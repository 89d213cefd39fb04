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
from dbsuite_spark.tables import t

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
