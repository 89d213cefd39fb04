"""ML feature-preparation & evaluation, batch 2 (round 5 cont.):
exact quantile binning, smoothed target encoding, and a thresholded
confusion matrix — the tabular-feature counterparts of the text/embedding
prep in this package.

Exactness: ranks and counts are integers; every money sum is decimal-cast
(dbsuite_spark.exact); the derived doubles mirror the oracle expression
shape operation-for-operation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbsuite_spark.exact import BIGCOUNT, DSUM, dsum
from dbsuite_spark.registry import query
from dbsuite_spark.tables import t

# --- exact quantile binning --------------------------------------------

_QB_BINS = 4

_QBIN_ORACLE = f"""
WITH r AS (
  SELECT o_totalprice AS v,
         CAST(rank() OVER (ORDER BY o_totalprice) AS BIGINT) AS rk,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM orders)
SELECT CAST(((rk - 1) * {_QB_BINS}) // n AS INT) AS bin,
       {BIGCOUNT()} AS n_rows,
       MIN(v) AS lo, MAX(v) AS hi,
       {DSUM('v')} / COUNT(*) AS mean_v
FROM r GROUP BY 1
"""


@query("ml_feature_quantile_bin", oracle=_QBIN_ORACLE, category="L")
def ml_feature_quantile_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equal-frequency (quantile) binning of a numeric feature:
    every order lands in one of 4 bins by the min-rank of its price, with
    per-bin count / range / mean — the discretization step feature
    pipelines run before monotone models and WOE encoding.

    Tie semantics: equal values share a min-rank, hence always the same
    bin (unlike NTILE, which splits ties across bins nondeterministically
    under partial orders).

    Scale: NOT a global row sort. Ranks come from the classic compressed
    two-pass: (1) aggregate to distinct values with counts (partial
    map-side agg — the only fact-sized shuffle), (2) a prefix-sum window
    over the *distinct-value* spine yields each value's min-rank, (3) the
    spine joins back to assign bins. The spine is |distinct| rows —
    orders of magnitude smaller than the fact at 100 TB; its single-
    partition prefix window is the same compromise every distributed
    ranking (including Spark's own rank) makes, on far less data. The
    join back is spine-sized → broadcastable."""
    o = t(spark, sf_dir, "orders")
    vals = o.groupBy(F.col("o_totalprice").alias("v")).agg(
        F.count("*").alias("c")
    )
    w_prev = (
        Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    spine = vals.select(
        "v",
        "c",
        (F.coalesce(F.sum("c").over(w_prev), F.lit(0)) + 1).alias("rk"),
        F.sum("c").over(
            Window.orderBy("v").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    ).select(
        "v",
        # Integer floor-division, matching the oracle's `//` exactly —
        # no double rounding in the bin id.
        F.expr(f"CAST(((rk - 1) * {_QB_BINS}) div n AS INT)").alias("bin"),
    )
    binned = o.join(
        F.broadcast(spine), o.o_totalprice == spine.v
    )
    return binned.groupBy("bin").agg(
        F.count("*").alias("n_rows"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        (dsum(F.col("v")) / F.count("*")).alias("mean_v"),
    )


# --- smoothed target encoding ------------------------------------------

_TE_M = 10.0  # smoothing pseudo-count

_TENC_ORACLE = f"""
WITH g AS (
  SELECT {DSUM('o_totalprice')} AS gs, {BIGCOUNT()} AS gn FROM orders),
c AS (
  SELECT o_orderpriority, {BIGCOUNT()} AS n,
         {DSUM('o_totalprice')} AS s
  FROM orders GROUP BY 1)
SELECT c.o_orderpriority, c.n,
       c.s / CAST(c.n AS DOUBLE) AS cat_mean,
       (c.s + {_TE_M} * (g.gs / CAST(g.gn AS DOUBLE)))
           / (CAST(c.n AS DOUBLE) + {_TE_M}) AS encoded
FROM c, g
"""


@query("ml_target_encode_smooth", oracle=_TENC_ORACLE, category="L")
def ml_target_encode_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed (additive / empirical-Bayes) target encoding of a
    categorical feature: per-category target mean shrunk toward the
    global mean with pseudo-count m — the standard high-cardinality
    categorical encoder, where raw per-category means overfit rare
    levels.

    Scale: one partial+final aggregation per arm — the per-category agg
    shuffles |categories| rows, the global agg is a 1-row broadcast
    cross-join; the encoder table this emits is dimension-sized and
    itself broadcastable into the training join. Decimal sums keep the
    means exact at any row count."""
    o = t(spark, sf_dir, "orders")
    g = o.agg(
        dsum(F.col("o_totalprice")).alias("gs"),
        F.count("*").alias("gn"),
    )
    c = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        dsum(F.col("o_totalprice")).alias("s"),
    )
    nd = F.col("n").cast("double")
    return c.crossJoin(F.broadcast(g)).select(
        "o_orderpriority",
        "n",
        (F.col("s") / nd).alias("cat_mean"),
        (
            (F.col("s")
             + F.lit(_TE_M) * (F.col("gs") / F.col("gn").cast("double")))
            / (nd + F.lit(_TE_M))
        ).alias("encoded"),
    )


# --- thresholded confusion matrix --------------------------------------

_CM_ORACLE = """
WITH per_user AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS score,
         (user_id % 5 = 0) AS label
  FROM events GROUP BY user_id),
thr AS (
  SELECT CAST(SUM(score) AS DOUBLE) / COUNT(*) AS cut FROM per_user),
pred AS (
  SELECT label, CAST(score AS DOUBLE) >= thr.cut AS yhat
  FROM per_user, thr),
cm AS (
  SELECT
    CAST(COUNT(*) FILTER (WHERE label AND yhat) AS BIGINT) AS tp,
    CAST(COUNT(*) FILTER (WHERE NOT label AND yhat) AS BIGINT) AS fp,
    CAST(COUNT(*) FILTER (WHERE label AND NOT yhat) AS BIGINT) AS fn,
    CAST(COUNT(*) FILTER (WHERE NOT label AND NOT yhat) AS BIGINT) AS tn
  FROM pred),
pr AS (
  SELECT tp, fp, fn, tn,
         CASE WHEN tp + fp = 0 THEN NULL
              ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END
             AS precision_,
         CASE WHEN tp + fn = 0 THEN NULL
              ELSE CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END
             AS recall_
  FROM cm)
SELECT tp, fp, fn, tn, precision_, recall_,
       CASE WHEN precision_ IS NULL OR recall_ IS NULL
                 OR precision_ + recall_ = 0 THEN NULL
            ELSE 2 * precision_ * recall_ / (precision_ + recall_)
       END AS f1
FROM pr
"""


@query("ml_confusion_matrix", oracle=_CM_ORACLE, category="L")
def ml_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded-classifier confusion matrix + precision/recall/F1,
    on the same deterministic score/label substrate as
    ``ml_auc_rank_eval`` (score = per-user event count, label =
    user_id % 5, threshold = global mean score — scale-invariant).
    AUC grades the ranking; this grades the operating point.

    Every cell is an integer count; the P/R/F1 doubles divide those
    integers with explicit zero-guards (NULL, never Inf/NaN — Spark and
    DuckDB disagree on bare double/0).

    Scale: per-user scores are one partial+final count; the threshold is
    a 1-row broadcast; the four cells fold into a single filtered-count
    aggregation. O(scan), no wide shuffle."""
    e = t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count("*").alias("score")).select(
        (F.col("user_id") % 5 == 0).alias("label"), "score"
    )
    thr = per_user.agg(
        (F.sum("score").cast("double") / F.count("*")).alias("cut")
    )
    pred = per_user.crossJoin(F.broadcast(thr)).select(
        "label", (F.col("score").cast("double") >= F.col("cut")).alias("yhat")
    )
    lab, yh = F.col("label"), F.col("yhat")
    cm = pred.agg(
        F.count_if(lab & yh).alias("tp"),
        F.count_if(~lab & yh).alias("fp"),
        F.count_if(lab & ~yh).alias("fn"),
        F.count_if(~lab & ~yh).alias("tn"),
    )
    tp = F.col("tp").cast("double")
    prec = F.when(F.col("tp") + F.col("fp") == 0, F.lit(None)).otherwise(
        tp / (F.col("tp") + F.col("fp")).cast("double")
    )
    rec = F.when(F.col("tp") + F.col("fn") == 0, F.lit(None)).otherwise(
        tp / (F.col("tp") + F.col("fn")).cast("double")
    )
    pr = cm.select(
        "tp", "fp", "fn", "tn",
        prec.alias("precision_"), rec.alias("recall_"),
    )
    p_, r_ = F.col("precision_"), F.col("recall_")
    f1 = F.when(
        p_.isNull() | r_.isNull() | (p_ + r_ == 0), F.lit(None)
    ).otherwise(F.lit(2) * p_ * r_ / (p_ + r_)).alias("f1")
    return pr.select("tp", "fp", "fn", "tn", "precision_", "recall_", f1)
