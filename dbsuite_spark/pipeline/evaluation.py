"""Category L extension — classifier evaluation over pipeline outputs.

``text_langid_eval`` closes the loop on the language-ID heuristic: its
predictions are scored against the labeled ``lang`` column as a
confusion matrix with per-pair corpus shares — the evaluation artifact a
data-quality dashboard tracks release-over-release. The oracle COMPOSES
the already-verified ``text_langid_ngram`` oracle as a CTE (registry
spec reuse), so the eval's truth derives from the same verified
prediction semantics on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsuite_spark.pipeline.text_extra import text_langid_ngram
from dbsuite_spark.registry import query, spec

_PRED_ORACLE = spec("text_langid_ngram").oracle

_EVAL_ORACLE = f"""
WITH pred AS ({_PRED_ORACLE}),
cells AS (
  SELECT lang AS true_lang, predicted AS pred_lang,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM pred GROUP BY 1, 2),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cells)
SELECT true_lang, pred_lang, n,
       CAST(n AS DOUBLE) / total AS share,
       true_lang = pred_lang AS correct
FROM cells, tot
"""


@query("text_langid_eval", oracle=_EVAL_ORACLE, category="L")
def text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the language-ID heuristic against the labeled
    ``lang`` column: per (true, predicted) pair, the document count, its
    share of all classified documents (one exact-integer division), and
    the diagonal flag. Summing ``share`` over ``correct`` rows is the
    corpus accuracy.

    Scale: composes the verified classifier (two aggregations + a
    broadcast profile join) with one tiny confusion aggregation and a
    1-row total broadcast — nothing new touches the corpus."""
    pred = text_langid_ngram(spark, sf_dir)
    cells = (
        pred.groupBy(
            F.col("lang").alias("true_lang"),
            F.col("predicted").alias("pred_lang"),
        )
        .agg(F.count("*").alias("n"))
    )
    tot = cells.agg(F.sum("n").cast("long").alias("total"))
    return cells.crossJoin(F.broadcast(tot)).select(
        "true_lang",
        "pred_lang",
        "n",
        (F.col("n").cast("double") / F.col("total")).alias("share"),
        (F.col("true_lang") == F.col("pred_lang")).alias("correct"),
    )
