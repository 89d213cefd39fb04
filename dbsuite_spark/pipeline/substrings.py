"""Category L extension — repeated-substring (word n-gram) dedup.

``dedup_substring_ngram`` is the span-level counterpart of the
document-level dedup family: instead of asking "is this document a
near-copy of another document", it asks "which spans of this document are
verbatim repeats of spans elsewhere in the corpus" — the signal behind
suffix-array substring dedup in published training-data pipelines
(Lee et al., "Deduplicating Training Data Makes Language Models Better",
ACL 2022). A true suffix array is a poor fit for a shared-nothing engine;
the Spark-first equivalent is fixed-length word n-grams at stride 1:
every length-K verbatim overlap of at least K words is caught by its
constituent K-grams, and the plan is two co-partitioned hash shuffles
instead of a global sort.

Plan shape (100 TB):
- gram generation is row-local (``split`` + ``transform(sequence(...))``
  inside codegen, no Python);
- grams travel as 60-bit md5-prefix integers, not strings — the shuffle
  carries 8 bytes/gram instead of ~50;
- global repeat detection is ONE hash aggregation on the gram hash
  (map-side combined), and the per-document rollup joins grams to their
  global counts on that same key, so AQE co-partitions the pair;
- the fixture runs stride 1 for exactness; at crawl scale the documented
  knob is gram stride (sample every s-th gram), which divides both
  shuffle volumes by s and still catches overlaps ≥ K + s − 1 words.

The 60-bit hash space makes collisions across a fixture-scale corpus
vanishingly unlikely and — because both engines compute the SAME md5
prefix — any collision is shared, so the oracle stays bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsuite_spark.registry import query
from dbsuite_spark.tables import t

GRAM_WORDS = 8  # verbatim spans of >= 8 words are "repeated substrings"

_SUBSTRING_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
grams AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(array_to_string(
             list_slice(tk, i, i + {GRAM_WORDS - 1}), ' ')), 1, 15)
           AS BIGINT) AS hv
  FROM toks, unnest(generate_series(1, len(tk) - {GRAM_WORDS - 1})) u(i)),
freq AS (
  SELECT hv, COUNT(*) AS cnt FROM grams GROUP BY hv),
per_doc AS (
  SELECT g.doc_id,
         COUNT(*) AS n_grams,
         SUM(CASE WHEN f.cnt > 1 THEN 1 ELSE 0 END) AS n_dup_grams
  FROM grams g JOIN freq f ON g.hv = f.hv
  GROUP BY g.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(p.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       CASE WHEN COALESCE(p.n_grams, 0) > 0
            THEN CAST(p.n_dup_grams AS DOUBLE) / p.n_grams
            ELSE CAST(0.0 AS DOUBLE) END AS dup_frac
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""


def _gram_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, hv): one 60-bit hash per word {GRAM_WORDS}-gram, stride 1.

    Spark ``sequence(1, 0)`` yields a DESCENDING [1, 0] rather than an
    empty array, so short documents guard the sequence explicitly."""
    d = t(spark, sf_dir, "documents")
    tk = F.split(F.col("text"), " ")
    n_grams = F.size(tk) - (GRAM_WORDS - 1)
    gram_text = lambda i: F.concat_ws(  # noqa: E731
        " ", F.slice(tk, i, GRAM_WORDS)
    )
    grams = F.when(
        n_grams >= 1,
        F.transform(F.sequence(F.lit(1), n_grams), gram_text),
    ).otherwise(F.array().cast("array<string>"))
    return d.select(
        "doc_id", F.explode(grams).alias("g")
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("g"), 1, 15), 16, 10)
        .cast("long")
        .alias("hv"),
    )


@query("dedup_substring_ngram", oracle=_SUBSTRING_ORACLE, category="L")
def dedup_substring_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repeated-substring profile: how many of the document's
    word 8-grams occur more than once in the corpus (within- OR
    cross-document), and the repeated fraction. Downstream cleaning drops
    or trims documents whose ``dup_frac`` exceeds a corpus-calibrated gate
    — the span-level complement of ``dedup_near_minhash``'s whole-document
    verdicts.

    ``dup_frac`` is a single IEEE division of two exact counts, so it is
    bit-identical across engines with no rounding step."""
    grams = _gram_hashes(spark, sf_dir)
    freq = grams.groupBy("hv").agg(F.count("*").alias("cnt"))
    per_doc = (
        grams.join(freq, "hv")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).alias(
                "n_dup_grams"
            ),
        )
    )
    d = t(spark, sf_dir, "documents").select("doc_id")
    return d.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
        F.when(
            F.coalesce("n_grams", F.lit(0)) > 0,
            F.col("n_dup_grams").cast("double") / F.col("n_grams"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )


_NOVELTY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
grams AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(array_to_string(
             list_slice(tk, i, i + {GRAM_WORDS - 1}), ' ')), 1, 15)
           AS BIGINT) AS hv
  FROM toks, unnest(generate_series(1, len(tk) - {GRAM_WORDS - 1})) u(i)),
first_seen AS (
  SELECT hv, MIN(doc_id) AS first_doc FROM grams GROUP BY hv),
per_doc AS (
  SELECT g.doc_id,
         COUNT(*) AS n_grams,
         SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS n_novel
  FROM grams g JOIN first_seen f ON g.hv = f.hv
  GROUP BY g.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(p.n_novel, 0) AS BIGINT) AS n_novel,
       CASE WHEN COALESCE(p.n_grams, 0) > 0
            THEN CAST(p.n_novel AS DOUBLE) / p.n_grams
            ELSE CAST(0.0 AS DOUBLE) END AS novelty_frac
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""


@query("docs_ngram_novelty", oracle=_NOVELTY_ORACLE, category="L")
def docs_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY in corpus order: the fraction of a
    document's word 8-grams that no lower-id document contains — the
    ordering signal curriculum builders and streaming dedupers use (a
    document whose spans were all "introduced" earlier adds nothing new;
    ``dedup_substring_ngram`` is the symmetric repeat view of the same
    substrate). A gram occurrence is novel iff this document IS the
    gram's global first occurrence (min doc_id).

    Scale: identical plan to ``dedup_substring_ngram`` — row-local gram
    hashing, one gram-keyed aggregation (min instead of count), one
    co-partitioned rejoin, one per-doc rollup; ``novelty_frac`` is a
    single exact-integer division."""
    grams = _gram_hashes(spark, sf_dir)
    first_seen = grams.groupBy("hv").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        grams.join(first_seen, "hv")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    d = t(spark, sf_dir, "documents").select("doc_id")
    return d.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        F.when(
            F.coalesce("n_grams", F.lit(0)) > 0,
            F.col("n_novel").cast("double") / F.col("n_grams"),
        )
        .otherwise(F.lit(0.0))
        .alias("novelty_frac"),
    )
