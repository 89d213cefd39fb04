"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``dbsuite_spark`` package; this module is a
thin re-export of its registry (one key per SURVEY.md §2 operator).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import dbsuite_spark
from dbsuite_spark.operators.aggregates import flagship
from dbsuite_spark.session import tune_session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship pricing-summary query on /root/testdata/sf0.001."""
    tune_session(spark)
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dbsuite_spark.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per key (omitted => rows-only check)."""
    return dbsuite_spark.oracle_sql()
