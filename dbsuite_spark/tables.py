"""Fixture-table access: one loader, one view-registrar.

All queries funnel through ``t()`` so schema/timezone discipline is applied
in exactly one place. Reads are plain columnar Parquet scans — Catalyst
pushes filters and prunes columns into the scan (verify with
``.explain('formatted')`` → PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; pins session TZ to UTC first (SURVEY §7.4.3).

    ``events.ts`` has shipped as either parquet TIMESTAMP(NANOS) (round-1
    fixtures; Spark 4 rejects it unless read as long via the legacy flag) or
    TIMESTAMP(MICROS, isAdjustedToUTC=false) (round-2 fixtures; Spark reads
    TIMESTAMP_NTZ). Normalize both to microsecond TimestampType so every
    downstream operator (windows, watermarks, oracles) sees one type, and
    the wall-clock matches DuckDB's ``CAST(ts AS TIMESTAMP)`` (SURVEY §7.4.3).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # nanos read as long under the legacy flag: truncate to micros.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif not isinstance(ts_type, T.TimestampType):
            # TIMESTAMP_NTZ micros: identity on wall-clock under UTC session.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name in TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
