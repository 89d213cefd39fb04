"""Category L — multimodal column operators (SURVEY §2L:
``multimodal_join``, ``multimodal_quality_filter``).

Driver-mandated LLM-pipeline scope: unify text + vector modalities into one
row with typed nested columns, and quality-filter on cross-modal
predicates. The struct column is the Spark-native "multimodal record":
opaque payloads (image/audio bytes) would ride along as binary fields of
the same struct — see ``dbsuite_spark.pipeline.media`` once added.

Scale: doc⋈vec is a 1:1 key join (shuffles both sides by id once, or
broadcasts the smaller modality); the quality predicates are codegen
row-local math — filter cost is O(dim) per row, no extra pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsuite_spark.pipeline.vectors import L2NORM, l2_norm
from dbsuite_spark.registry import query
from dbsuite_spark.tables import t

CHAR_LO, CHAR_HI = 150, 450
MAXABS_HI = 0.32


@query(
    "multimodal_join",
    oracle="""
SELECT d.doc_id, d.lang, e.label, d.n_chars,
       CAST(len(e.embedding) AS BIGINT) AS dim,
       CAST(e.embedding[1] AS DOUBLE) AS h3_1,
       CAST(e.embedding[2] AS DOUBLE) AS h3_2,
       CAST(e.embedding[3] AS DOUBLE) AS h3_3
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
""",
    category="L",
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unify text + vector modalities: documents ⋈ embeddings on id into a
    struct column {text, lang, embedding, label}, then project typed fields
    back out (the oracle checks the flattened projection — struct layout
    itself is engine-internal)."""
    d = t(spark, sf_dir, "documents")
    e = t(spark, sf_dir, "embeddings")
    joined = d.join(e, d.doc_id == e.vec_id).withColumn(
        "record",
        F.struct(
            F.col("text"), F.col("lang"), F.col("embedding"), F.col("label")
        ),
    )
    rec_emb = F.col("record.embedding")
    return joined.select(
        "doc_id",
        F.col("record.lang").alias("lang"),
        F.col("record.label").alias("label"),
        "n_chars",
        F.size(rec_emb).cast("bigint").alias("dim"),
        F.element_at(rec_emb, 1).cast("double").alias("h3_1"),
        F.element_at(rec_emb, 2).cast("double").alias("h3_2"),
        F.element_at(rec_emb, 3).cast("double").alias("h3_3"),
    )


@query(
    "multimodal_quality_filter",
    oracle=f"""
SELECT d.doc_id, d.lang, d.n_chars,
       {L2NORM('e.embedding')} AS l2_norm,
       list_max(list_transform(e.embedding, x -> abs(CAST(x AS DOUBLE))))
           AS max_abs
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
WHERE d.n_chars BETWEEN {CHAR_LO} AND {CHAR_HI}
  AND list_max(list_transform(e.embedding, x -> abs(CAST(x AS DOUBLE))))
      <= {MAXABS_HI}
  AND {L2NORM('e.embedding')} BETWEEN 0.999 AND 1.001
""",
    category="L",
)
def multimodal_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal quality gate: text length bounds AND embedding sanity
    (unit norm within tolerance, no dominant component). max/abs/sqrt on
    identical doubles → bit-identical filter decisions on both engines."""
    d = t(spark, sf_dir, "documents")
    e = t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    max_abs = F.array_max(
        F.transform(emb, lambda x: F.abs(x.cast("double")))
    )
    norm = l2_norm(emb)
    return (
        d.join(e, d.doc_id == e.vec_id)
        .withColumn("l2_norm", norm)
        .withColumn("max_abs", max_abs)
        .filter(
            F.col("n_chars").between(CHAR_LO, CHAR_HI)
            & (F.col("max_abs") <= MAXABS_HI)
            & F.col("l2_norm").between(0.999, 1.001)
        )
        .select("doc_id", "lang", "n_chars", "l2_norm", "max_abs")
    )
