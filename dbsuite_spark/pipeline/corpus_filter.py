"""Corpus-level hygiene filters (round 5): global chunk-frequency dedup
(the CCNet shared-line removal adapted to token chunks) and PMI
collocation mining.

``text_chunk_dedup_global`` is the corpus-frequency complement to the
per-document cleaners (``text_remove_boilerplate`` — C4 rules inside one
doc) and the pairwise dedupers (``dedup_substring_ngram`` — cross-doc
*pairs*): here a chunk is dropped because it is common across the WHOLE
corpus (header/footer boilerplate), regardless of which pair of docs
shares it. This is the shape of CCNet's shared-line filter.

Scale design (100 TB):
- Chunking is row-local (``sequence`` + ``explode`` + ``slice`` — codegen,
  no Python). Output rows ≈ input tokens / W, a fixed fan-out.
- The document-frequency pass is one shuffle on the chunk hash with
  map-side partial distinct; frequent-chunk set is TINY (vocab-bounded —
  boilerplate is by definition low-cardinality), so at cluster scale the
  df>T set broadcasts and the filter join is broadcast-hash, no second
  shuffle of the big side. (On fixtures we inner-join the full df table;
  the plan is the same exchange either way at this size.)
- Reassembly groups by doc_id — same key the chunker exploded from, so
  AQE coalesces; the ordered concat uses array_sort(collect_list(struct))
  which is partition-order-independent (sort key carried in the struct).

Determinism: counts and indices are BIGINT; kept_ratio is one int/int
IEEE division (identical across engines); the reassembled text is md5'd
after an explicit in-group sort by chunk index, so no engine's
aggregation order leaks into the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsuite_spark.exact import BIGCOUNT
from dbsuite_spark.registry import query
from dbsuite_spark.tables import t

CHUNK_W = 3  # tokens per non-overlapping chunk ("line" analogue)
CHUNK_DF_MAX = 4  # chunks seen in more than this many docs are boilerplate

PMI_MIN_COUNT = 30  # collocation candidates need support
PMI_TOP = 100


def _chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, i, chunk): non-overlapping CHUNK_W-token windows."""
    d = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.split(F.col("text"), " ").alias("toks"))
        .withColumn("n", F.size("toks"))
    )
    c = d.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.expr(f"(n - 1) div {CHUNK_W}"))
        ).alias("i"),
    )
    return c.select(
        "doc_id",
        F.col("i").cast("bigint").alias("i"),
        F.concat_ws(
            " ", F.slice(F.col("toks"), F.col("i") * CHUNK_W + 1, CHUNK_W)
        ).alias("chunk"),
    )


_CHUNK_DEDUP_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
idx AS (
  SELECT doc_id, ts, CAST(u.i AS BIGINT) AS i
  FROM toks,
       UNNEST(range(CAST(ceil(len(ts) / {CHUNK_W}.0) AS BIGINT))) AS u(i)),
chunks AS (
  SELECT doc_id, i,
         array_to_string(ts[i*{CHUNK_W}+1 : i*{CHUNK_W}+{CHUNK_W}], ' ')
           AS chunk
  FROM idx),
df AS (
  SELECT chunk, COUNT(DISTINCT doc_id) AS df FROM chunks GROUP BY chunk),
kept AS (
  SELECT c.doc_id, c.i, c.chunk
  FROM chunks c JOIN df USING (chunk)
  WHERE df.df <= {CHUNK_DF_MAX}),
stats AS (
  SELECT doc_id, {BIGCOUNT('*')} AS n_chunks FROM chunks GROUP BY doc_id),
keeps AS (
  SELECT doc_id, {BIGCOUNT('*')} AS n_kept,
         md5(string_agg(chunk, ' ' ORDER BY i)) AS kept_md5
  FROM kept GROUP BY doc_id)
SELECT s.doc_id,
       s.n_chunks,
       COALESCE(k.n_kept, 0) AS n_kept,
       CAST(COALESCE(k.n_kept, 0) AS DOUBLE) / s.n_chunks AS kept_ratio,
       COALESCE(k.kept_md5, md5('')) AS kept_md5
FROM stats s LEFT JOIN keeps k USING (doc_id)
"""


@query("text_chunk_dedup_global", oracle=_CHUNK_DEDUP_ORACLE, category="L")
def text_chunk_dedup_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style global boilerplate removal: drop every {W}-token chunk
    whose corpus document-frequency exceeds CHUNK_DF_MAX, then report per
    doc how much survived (count, ratio, md5 of the reassembled text).

    Plan: chunk (row-local) → df groupBy (one shuffle, partial distinct)
    → filter join → per-doc regroup with in-struct index sort. No window
    function, no Python, no collect."""
    c = _chunks(spark, sf_dir)
    df = c.groupBy("chunk").agg(
        F.count_distinct("doc_id").alias("df")
    )
    kept = (
        c.join(df, "chunk")
        .where(F.col("df") <= CHUNK_DF_MAX)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("i", "chunk"))),
                        lambda s: s.chunk,
                    ),
                    " ",
                )
            ).alias("kept_md5"),
        )
    )
    stats = c.groupBy("doc_id").agg(F.count("*").alias("n_chunks"))
    return stats.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        (
            F.coalesce("n_kept", F.lit(0)).cast("double")
            / F.col("n_chunks")
        ).alias("kept_ratio"),
        F.coalesce("kept_md5", F.md5(F.lit(""))).alias("kept_md5"),
    )


_PMI_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
uni AS (
  SELECT u.tok AS tok FROM toks, UNNEST(ts) AS u(tok)),
ucnt AS (SELECT tok, {BIGCOUNT('*')} AS n FROM uni GROUP BY tok),
utot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM ucnt),
bi AS (
  SELECT ts[CAST(u.i AS BIGINT) + 1] AS w1,
         ts[CAST(u.i AS BIGINT) + 2] AS w2
  FROM toks, UNNEST(range(len(ts) - 1)) AS u(i)
  WHERE len(ts) >= 2),
bcnt AS (SELECT w1, w2, {BIGCOUNT('*')} AS n_ab FROM bi GROUP BY w1, w2),
btot AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS nb FROM bcnt)
SELECT w1, w2, n_ab,
       ROUND(ln( (CAST(n_ab AS DOUBLE) / nb)
                 / ( (CAST(a.n AS DOUBLE) / nt)
                   * (CAST(b.n AS DOUBLE) / nt) ) ), 6) AS pmi
FROM bcnt
JOIN ucnt a ON bcnt.w1 = a.tok
JOIN ucnt b ON bcnt.w2 = b.tok
CROSS JOIN utot CROSS JOIN btot
WHERE n_ab >= {PMI_MIN_COUNT}
ORDER BY pmi DESC, w1, w2
LIMIT {PMI_TOP}
"""


@query("text_collocation_pmi", oracle=_PMI_ORACLE, category="L")
def text_collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocation mining: top bigrams by
    PMI = ln(P(ab) / (P(a)P(b))), support-filtered (n_ab ≥ 30) — the
    classic phrase-mining signal (word2vec's phrase pass uses the same
    score).

    Scale: unigram and bigram counts are two partial-agg shuffles over
    the token stream; the unigram table is vocab-sized, so both PMI
    joins broadcast at cluster scale; totals are 1-row broadcasts. The
    final order is TakeOrderedAndProject (per-partition heaps). PMI is
    rounded to 6dp before the (DESC, w1, w2) order so the top-k cut is
    cross-engine deterministic even at libm's last ulp."""
    d = t(spark, sf_dir, "documents").select(
        F.split(F.col("text"), " ").alias("toks")
    )
    uni = (
        d.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    utot = uni.agg(F.sum("n").alias("nt"))
    k = F.size(F.col("toks")) - 1
    bi = d.where(F.size("toks") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.struct(
                    F.element_at(F.col("toks"), i).alias("w1"),
                    F.element_at(F.col("toks"), i + 1).alias("w2"),
                ),
            )
        ).alias("b")
    )
    bcnt = bi.groupBy(
        F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    ).agg(F.count("*").alias("n_ab"))
    btot = bcnt.agg(F.sum("n_ab").alias("nb"))
    a = uni.select(F.col("tok").alias("w1"), F.col("n").alias("n_a"))
    b = uni.select(F.col("tok").alias("w2"), F.col("n").alias("n_b"))
    return (
        bcnt.where(F.col("n_ab") >= PMI_MIN_COUNT)
        .join(F.broadcast(a), "w1")
        .join(F.broadcast(b), "w2")
        .crossJoin(F.broadcast(utot))
        .crossJoin(F.broadcast(btot))
        .select(
            "w1",
            "w2",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.round(
                F.log(
                    (F.col("n_ab").cast("double") / F.col("nb"))
                    / (
                        (F.col("n_a").cast("double") / F.col("nt"))
                        * (F.col("n_b").cast("double") / F.col("nt"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(PMI_TOP)
    )
