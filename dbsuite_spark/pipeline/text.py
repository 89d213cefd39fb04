"""Category L — text analysis over ``documents`` (SURVEY §2L:
``text_tokenize_counts``, ``text_tfidf_topterms``, ``text_ngrams``,
``text_lang_profile``).

Driver-mandated LLM-pipeline scope. All pure DataFrame ops: explode →
partial-aggregated counts (map-side combine), window top-k per doc, and
TakeOrderedAndProject for global top-k — no driver-side loops, no Python
row functions, so every key here is the same plan at 100 TB.

Determinism: every top-k has a unique total order (count DESC, term ASC);
TF-IDF scores are ln() of identical doubles rounded to 6 dp on both sides
(libm last-ulp differences are the one place bit-equality can't be
promised — SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbsuite_spark.exact import BIGCOUNT
from dbsuite_spark.registry import query
from dbsuite_spark.tables import fan_out, t

TOP_TERMS = 100
TFIDF_PER_DOC = 3
TOP_BIGRAMS = 200


def _tokens(
    spark: SparkSession, sf_dir: str, key: str | None = None
) -> DataFrame:
    """(doc_id, token) exploded stream. ``key="doc_id"`` fan_outs the
    documents scan hash-partitioned (see ``_shingle_rows`` — same
    single-task-scan hazard, same scoping-by-consumer discipline): the
    tokenize+explode then runs session-wide instead of fused into the
    one-task scan, and a downstream groupBy whose keys INCLUDE doc_id
    (a superset of the partitioning key satisfies the clustering)
    plans as one complete aggregation with zero further exchanges.
    Callers whose aggregation is NOT doc_id-aligned keep the default
    (no fan_out) unless measured otherwise."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    if key is not None:
        d = fan_out(d, key=key)
    return d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )


@query(
    "text_tokenize_counts",
    oracle=f"""
SELECT token, {BIGCOUNT('*')} AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY n DESC, token
LIMIT {TOP_TERMS}
""",
    category="L",
)
def text_tokenize_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word frequencies, top 100 terms (count DESC, token ASC —
    unique total order). orderBy+limit plans as TakeOrderedAndProject:
    per-partition heaps, no global sort, scale-safe."""
    return (
        _tokens(spark, sf_dir)
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(TOP_TERMS)
    )


@query(
    "text_tfidf_topterms",
    oracle=f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
tf AS (SELECT doc_id, token, COUNT(*) AS tf
       FROM tok GROUP BY doc_id, token),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token,
         round(tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
)
SELECT doc_id, token, tfidf, CAST(rn AS INT) AS rank FROM (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
  FROM scored) WHERE rn <= {TFIDF_PER_DOC}
""",
    category="L",
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF per (doc, term) with idf = ln(N/df); top 3 terms per doc.

    Round-13 optimization (guide §2.3 'aggregate before you shuffle'):
    ``tf`` has exactly one row per (doc, token), so the document
    frequency IS ``count(*)`` of ``tf`` rows per token — aggregated from
    ``tf`` itself — instead of a second tokenize pass over the corpus
    feeding a COUNT(DISTINCT doc_id) (whose partial-distinct aggregate
    shuffled every (token, doc) pair a second time). One corpus
    scan+explode instead of two; the join stays a hash join (a window-df
    variant was measured SLOWER — it trades the join for a full sort of
    tf by token; interleaved measurements in OPTIMIZATION_r13.md).
    Locally timing-neutral (the fixture corpus is small); at scale the
    saved pass is the win. Evidence:
    plans/r13/text_tfidf_topterms_{before,after}.txt."""
    # Round-14: keyed fan_out of the documents scan (see _tokens) —
    # hashpartitioning(doc_id) spreads the tokenize+explode AND
    # satisfies both the (doc_id, token) tf aggregation and the final
    # per-doc rank window, so the whole key plans with the fan_out
    # exchange as the ONLY corpus-wide exchange.
    tok = _tokens(spark, sf_dir, key="doc_id")
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = t(spark, sf_dir, "documents").agg(
        F.count("*").alias("n_docs")
    )
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_PER_DOC)
        .select("doc_id", "token", "tfidf", "rank")
    )


@query(
    "text_ngrams",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
bg AS (SELECT doc_id,
              unnest(list_transform(generate_series(1, len(tk) - 1),
                     i -> tk[i] || ' ' || tk[i+1])) AS bigram
       FROM toks)
SELECT bigram, {BIGCOUNT('*')} AS n
FROM bg
GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT {TOP_BIGRAMS}
""",
    category="L",
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram counts (top 200, unique total order). Bigrams are built by a
    codegen lambda over the token array — no Python, no extra scan."""
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    k = F.size(toks) - 1
    bigrams = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(TOP_BIGRAMS)
    )


@query(
    "text_lang_profile",
    oracle=f"""
SELECT lang,
       {BIGCOUNT('*')} AS n_docs,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM documents
GROUP BY lang
""",
    category="L",
)
def text_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile: doc counts, char-length stats, source
    coverage. avg = exact integer SUM / COUNT → identical doubles."""
    d = t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        (
            F.sum("n_chars").cast("double") / F.count("*")
        ).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PHONE_RE = "\\b[0-9]{3}-[0-9]{4}\\b"


@query(
    "text_pii_redact",
    oracle=f"""
WITH enriched AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS txt
  FROM documents
),
redacted AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(txt, '{EMAIL_RE}')) AS BIGINT)
             AS n_emails,
         CAST(len(regexp_extract_all(txt, '{PHONE_RE}')) AS BIGINT)
             AS n_phones,
         regexp_replace(regexp_replace(txt, '{EMAIL_RE}', '[EMAIL]', 'g'),
                        '{PHONE_RE}', '[PHONE]', 'g') AS clean
  FROM enriched
)
SELECT doc_id, n_emails, n_phones,
       CAST(length(clean) AS BIGINT) AS clean_len,
       md5(clean) AS clean_md5
FROM redacted
""",
    category="L",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: regex-redact emails and phone
    numbers, report per-doc match counts plus an md5 probe of the cleaned
    text. The fixtures carry no real PII, so deterministic synthetic PII
    is appended per doc before redaction — the redaction path is what's
    exercised. Pure row-local JVM regex (codegen, no shuffle, no Python);
    at 100 TB this is a map-only pass that pushes only doc_id+text through
    the scan. Patterns stay in the Java∩RE2 common subset so Spark and
    DuckDB match identically."""
    d = t(spark, sf_dir, "documents")
    txt = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(txt, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
    )
    return d.select(
        "doc_id",
        F.regexp_count(txt, F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(txt, F.lit(PHONE_RE)).cast("bigint").alias("n_phones"),
        F.length(clean).cast("bigint").alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
    )
