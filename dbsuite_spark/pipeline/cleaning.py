"""Web-corpus cleaning operators — the extraction/boilerplate/repetition
stage every crawl-derived pretraining corpus passes through before the
dedup and quality gates (all three rules are public: tag stripping is
universal, the cross-document repeated-line rule is C4's, and the
repeated-n-gram ratio is Gopher's).

All three are DataFrame-algebra only: row-local regex for extraction,
one document-frequency aggregation + broadcast for boilerplate, two
bounded aggregations for repetition. No Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsuite_spark.registry import query
from dbsuite_spark.tables import t

BOILER_DF = 5  # a sentence in more than this many docs is boilerplate
REP_TOP_FRAC = 6  # round repetition fractions to 6 dp


@query(
    "text_html_strip",
    oracle="""
WITH wrapped AS (
  SELECT doc_id,
         '<html><body  class="c' || CAST(doc_id % 7 AS VARCHAR)
         || '"><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>'
         || replace(text, '. ', '.</p>\n<p>')
         || '</p><br/>&amp;footer&nbsp;</body></html>' AS html
  FROM documents)
SELECT doc_id,
       trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           regexp_replace(html, '<[^>]*>', ' ', 'g'),
           '&amp;', '&', 'g'), '&nbsp;', ' ', 'g'),
           '&[a-z]+;', '', 'g'), '\\s+', ' ', 'g')) AS clean_text,
       CAST(octet_length(encode(html)) AS BIGINT) AS html_bytes
FROM wrapped
""",
    category="L",
)
def text_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML-to-text extraction: strip tags, decode the common entities,
    collapse whitespace — the first transform of every crawl pipeline.
    The fixture wraps each document in a deterministic HTML shell
    (nested tags, attributes, entities, a self-closing tag) so all the
    stripping rules fire and the oracle can rebuild the same shell.

    Scale: pure row-local regexp_replace chains inside codegen — one
    scan, no shuffle, no Python; a real pipeline swaps the regex chain
    for an extractor UDF only when DOM structure matters (then via
    ``mapInArrow``, see udf_map_in_arrow)."""
    d = t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><body  class="c'),
        (F.col("doc_id") % 7).cast("string"),
        F.lit('"><h1>Doc '),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.regexp_replace(F.col("text"), r"\. ", ".</p>\n<p>"),
        F.lit("</p><br/>&amp;footer&nbsp;</body></html>"),
    )
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(html, r"<[^>]*>", " "),
                        r"&amp;",
                        "&",
                    ),
                    r"&nbsp;",
                    " ",
                ),
                r"&[a-z]+;",
                "",
            ),
            r"\s+",
            " ",
        )
    )
    return d.select(
        "doc_id",
        clean.alias("clean_text"),
        F.octet_length(html).cast("bigint").alias("html_bytes"),
    )


@query(
    "text_remove_boilerplate",
    oracle=f"""
WITH sents AS (
  SELECT doc_id, i AS pos, sn[i] AS sent
  FROM (SELECT doc_id, string_split(text, '. ') AS sn FROM documents),
       unnest(generate_series(1, len(sn))) u(i)),
df AS (
  SELECT sent, COUNT(DISTINCT doc_id) AS n_docs
  FROM sents GROUP BY sent),
boiler AS (SELECT sent FROM df WHERE n_docs > {BOILER_DF}),
kept AS (
  SELECT s.doc_id, s.pos, s.sent
  FROM sents s LEFT JOIN boiler b ON s.sent = b.sent
  WHERE b.sent IS NULL)
SELECT doc_id,
       CAST((SELECT COUNT(*) FROM sents t WHERE t.doc_id = k.doc_id)
            AS BIGINT) AS n_sentences,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       string_agg(sent, '. ' ORDER BY pos) AS cleaned_text
FROM kept k GROUP BY doc_id
""",
    category="L",
)
def text_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate removal — C4's repeated-line rule:
    sentences appearing in more than {df} distinct documents (headers,
    footers, cookie banners) are struck from every document, and the
    text is rebuilt in original order. Documents that were pure
    boilerplate drop out entirely, matching the rule's intent.

    Scale: one sentence-frequency aggregation (map-side combine), the
    tiny boilerplate set broadcast as an anti-join onto the sentence
    stream, and an order-restoring per-doc aggregation — the same plan
    C4 ran over Common Crawl; per-doc state is that document's own
    sentences, nothing global."""
    d = t(spark, sf_dir, "documents")
    sents = d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), r"\. ")).alias("pos", "sent"),
    )
    boiler = (
        sents.groupBy("sent")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") > BOILER_DF)
        .select("sent")
    )
    totals = sents.groupBy("doc_id").agg(
        F.count("*").alias("n_sentences")
    )
    kept = sents.join(F.broadcast(boiler), "sent", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            ". ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "sent"))),
                lambda x: x["sent"],
            ),
        ).alias("cleaned_text"),
    )
    return rebuilt.join(totals, "doc_id").select(
        "doc_id", "n_sentences", "n_kept", "cleaned_text"
    )


@query(
    "text_repetition_score",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
bi AS (
  SELECT doc_id, tk[i] || ' ' || tk[i+1] AS bigram
  FROM toks, unnest(generate_series(1, len(tk) - 1)) u(i)),
counts AS (
  SELECT doc_id, bigram, COUNT(*) AS c
  FROM bi GROUP BY doc_id, bigram),
agg AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
         CAST(MAX(c) AS BIGINT) AS top_count
  FROM counts GROUP BY doc_id)
SELECT doc_id, n_bigrams, top_count,
       round(CAST(top_count AS DOUBLE) / n_bigrams, {REP_TOP_FRAC})
           AS top_bigram_frac,
       CAST(top_count AS DOUBLE) / n_bigrams > 0.18 AS flagged
FROM agg
""",
    category="L",
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition filtering — Gopher's repeated-n-gram rule: the fraction
    of a document's bigrams taken by its single most frequent bigram;
    degenerate generated/spam text scores high and gets flagged (the
    published Gopher threshold family; 0.18 here). The fraction is one
    double division of exact integers, rounded to 6 dp.

    Scale: one (doc, bigram) aggregation with map-side combine, then a
    per-doc max/sum — both partial+final; state is bounded by each
    document's own vocabulary. The same plan computes the full Gopher
    rule set by widening the aggregate list."""
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
    counts = (
        d.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
    )
    agg = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.max("c").alias("top_count"),
    )
    frac = F.col("top_count").cast("double") / F.col("n_bigrams")
    return agg.select(
        "doc_id",
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        F.col("top_count").cast("bigint").alias("top_count"),
        F.round(frac, REP_TOP_FRAC).alias("top_bigram_frac"),
        (frac > 0.18).alias("flagged"),
    )


MIN_CLEAN_TOKENS = 20
REP_GATE = 0.05


@query(
    "pipeline_clean_corpus",
    oracle=f"""
WITH sents AS (
  SELECT doc_id, i AS pos, sn[i] AS sent
  FROM (SELECT doc_id, string_split(text, '. ') AS sn FROM documents),
       unnest(generate_series(1, len(sn))) u(i)),
df AS (SELECT sent, COUNT(DISTINCT doc_id) AS n_docs
       FROM sents GROUP BY sent),
boiler AS (SELECT sent FROM df WHERE n_docs > {BOILER_DF}),
kept AS (
  SELECT s.doc_id, s.pos, s.sent
  FROM sents s LEFT JOIN boiler b ON s.sent = b.sent
  WHERE b.sent IS NULL),
rebuilt AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(sent, '. ' ORDER BY pos) AS cleaned_text
  FROM kept GROUP BY doc_id),
bi AS (
  SELECT doc_id, tk[i] || ' ' || tk[i+1] AS bigram
  FROM (SELECT doc_id, string_split(cleaned_text, ' ') AS tk
        FROM rebuilt),
       unnest(generate_series(1, len(tk) - 1)) u(i)),
bcounts AS (SELECT doc_id, bigram, COUNT(*) AS c
            FROM bi GROUP BY doc_id, bigram),
rep AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
               CAST(MAX(c) AS BIGINT) AS top_count
        FROM bcounts GROUP BY doc_id)
SELECT r.doc_id, r.n_kept,
       CAST(len(string_split(r.cleaned_text, ' ')) AS BIGINT)
           AS n_tokens,
       round(CAST(rep.top_count AS DOUBLE) / rep.n_bigrams, 6)
           AS top_bigram_frac,
       CAST(length(r.cleaned_text) AS BIGINT) AS clean_chars
FROM rebuilt r JOIN rep ON r.doc_id = rep.doc_id
WHERE len(string_split(r.cleaned_text, ' ')) >= {MIN_CLEAN_TOKENS}
  AND CAST(rep.top_count AS DOUBLE) / rep.n_bigrams <= {REP_GATE}
""",
    category="L",
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end cleaning composite: boilerplate-line removal feeds the
    repetition gate, which is computed ON THE CLEANED TEXT (order
    matters: a stripped footer must not count toward repetition), then
    documents too short after cleaning or too repetitive are dropped —
    the cleaning half of a crawl-curation pipeline, with
    ``pipeline_quality_corpus`` (language/token gates → dedup) as the
    downstream half.  Gates are corpus-calibrated (min {MIN_CLEAN_TOKENS}
    cleaned tokens, top-bigram fraction ≤ {REP_GATE}) so both fire on
    the fixtures: ~80% of documents survive at every scale.

    Scale: the composed plan is exactly the union of its verified
    stages' plans — sentence-frequency aggregation + broadcast
    anti-join, order-restoring rebuild, per-doc bigram aggregation —
    with Catalyst pipelining the stages so the corpus is scanned once
    and shuffled only on (doc), (sent), and (doc, bigram) keys."""
    d = t(spark, sf_dir, "documents")
    sents = d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), r"\. ")).alias("pos", "sent"),
    )
    boiler = (
        sents.groupBy("sent")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > BOILER_DF)
        .select("sent")
    )
    rebuilt = (
        sents.join(F.broadcast(boiler), "sent", "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.concat_ws(
                ". ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "sent"))),
                    lambda x: x["sent"],
                ),
            ).alias("cleaned_text"),
        )
    )
    toks = F.split(F.col("cleaned_text"), " ")
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
    rep = (
        rebuilt.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.max("c").alias("top_count"),
        )
    )
    frac = F.col("top_count").cast("double") / F.col("n_bigrams")
    n_tokens = F.size(F.split(F.col("cleaned_text"), " "))
    return (
        rebuilt.join(rep, "doc_id")
        .filter((n_tokens >= MIN_CLEAN_TOKENS) & (frac <= REP_GATE))
        .select(
            "doc_id",
            "n_kept",
            n_tokens.cast("bigint").alias("n_tokens"),
            F.round(frac, 6).alias("top_bigram_frac"),
            F.length("cleaned_text").cast("bigint").alias("clean_chars"),
        )
    )
