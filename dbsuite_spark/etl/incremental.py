"""Incremental warehouse maintenance — materialized-view delta merge and
partitioned backfill (dynamic partition overwrite).

Reference scope: scheduled MV refresh and partition-level reload are the
bread-and-butter of the reference's ETL orchestration [PUBLIC,
module-level; checkout empty — SURVEY §0].

Scale design (100 TB):
- ``etl_incremental_mv`` proves the *incremental* refresh contract: the
  delta batch partial-aggregates map-side, then merges with the stored MV
  by a full-outer join on the group key — cost proportional to
  |delta| + |MV|, never to the base table. Partial sums are kept in
  DECIMAL(18,6) **inside the stored MV** so incremental maintenance is
  bit-identical to a full recompute (decimal addition commutes; summing
  doubles would drift) — the oracle IS the full recompute.
- ``etl_backfill_partitions`` proves partition-scoped rewrite: the
  corrections batch touches 3 partitions; with
  ``partitionOverwriteMode=dynamic`` Spark replaces exactly those
  directories and never reads or rewrites the other ~97% of the table —
  the only sane backfill at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsuite_spark.etl.io import artifact_path
from dbsuite_spark.exact import BIGCOUNT, DEC, DSUM
from dbsuite_spark.registry import query
from dbsuite_spark.tables import t

DELTA_MOD = 20  # o_orderkey % 20 == 0 → the "new batch" slice
BACKFILL_DAYS = 3


@query(
    "etl_incremental_mv",
    oracle=f"""
SELECT o_custkey, {BIGCOUNT("*")} AS n_orders,
       {DSUM("o_totalprice")} AS total_spent
FROM orders GROUP BY o_custkey
""",
    category="K",
)
def etl_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view refresh: the per-customer order MV is
    built from the historical slice, stored with its partial sum in
    DECIMAL(18,6), then a delta batch is partial-aggregated and merged by
    full-outer join — coalesce counts, add exact decimals. Because decimal
    partials commute, the incrementally-maintained MV hashes identically
    to the oracle's full recompute."""
    o = t(spark, sf_dir, "orders")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("total_dec"),
        )

    mv_path = artifact_path(sf_dir, "mv_cust_orders")
    partial(o.filter(F.col("o_orderkey") % DELTA_MOD != 0)).write.mode(
        "overwrite"
    ).parquet(mv_path)

    mv = spark.read.parquet(mv_path)
    delta = partial(o.filter(F.col("o_orderkey") % DELTA_MOD == 0))
    merged = (
        mv.select(
            F.col("o_custkey"),
            F.col("n_orders").alias("n0"),
            F.col("total_dec").alias("t0"),
        )
        .join(
            delta.select(
                F.col("o_custkey"),
                F.col("n_orders").alias("n1"),
                F.col("total_dec").alias("t1"),
            ),
            "o_custkey",
            "full_outer",
        )
        .select(
            "o_custkey",
            (
                F.coalesce(F.col("n0"), F.lit(0))
                + F.coalesce(F.col("n1"), F.lit(0))
            ).alias("n_orders"),
            (
                F.coalesce(F.col("t0"), F.lit(0).cast(DEC))
                + F.coalesce(F.col("t1"), F.lit(0).cast(DEC))
            )
            .cast("double")
            .alias("total_spent"),
        )
    )
    return merged


@query(
    "etl_backfill_partitions",
    oracle=f"""
WITH fix AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events
             ORDER BY d LIMIT {BACKFILL_DAYS})
SELECT event_id, user_id, event_type, value * 2.0 AS value,
       CAST(ts AS DATE) AS event_date
FROM events WHERE CAST(ts AS DATE) IN (SELECT d FROM fix)
UNION ALL
SELECT event_id, user_id, event_type, value, CAST(ts AS DATE) AS event_date
FROM events WHERE CAST(ts AS DATE) NOT IN (SELECT d FROM fix)
""",
    category="K",
)
def etl_backfill_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped backfill: events land partitioned by event_date;
    a corrections batch (value doubled for the 3 earliest days) is then
    written with dynamic partition overwrite, which replaces exactly the
    3 affected directories — no read or rewrite of the untouched ~97%.
    The corrected dates come from a 3-row broadcast semi-join, not a
    driver collect; doubling is exact in IEEE, so the read-back table
    hashes against the oracle's CASE-rewrite."""
    e = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.to_date("ts").alias("event_date"),
    )
    tbl = artifact_path(sf_dir, "events_by_date")
    e.write.mode("overwrite").partitionBy("event_date").parquet(tbl)

    fix_days = (
        e.select("event_date").distinct().orderBy("event_date")
        .limit(BACKFILL_DAYS)
    )
    corrections = e.join(
        F.broadcast(fix_days), "event_date", "left_semi"
    ).withColumn("value", F.col("value") * 2.0)

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        corrections.select(
            "event_id", "user_id", "event_type", "value", "event_date"
        )
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(tbl)
    )
    back = spark.read.parquet(tbl)
    return back.select(
        "event_id", "user_id", "event_type", "value",
        F.col("event_date").cast("date").alias("event_date"),
    )
