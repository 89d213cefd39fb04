"""Bonus key — recursive CTE (SURVEY §4 note: DB2's dialect, and therefore
dbsuite's parser, includes recursive WITH; probed working on the installed
Spark 4.1.2 and DuckDB 1.0.0).

The recursive member generates a month spine (the classic warehouse
calendar recursion); the outer query left-joins monthly 1997 revenue so
months without orders still appear. Near-identical SQL runs on both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dbsuite_spark.exact import BIGCOUNT, DSUM
from dbsuite_spark.registry import query
from dbsuite_spark.tables import register_views

_SQL = f"""
WITH RECURSIVE months AS (
  SELECT 1 AS m
  UNION ALL
  SELECT m + 1 FROM months WHERE m < 12
),
rev AS (
  SELECT CAST(month(o_orderdate) AS INT) AS m,
         {DSUM('o_totalprice')} AS revenue,
         {BIGCOUNT('*')} AS n_orders
  FROM orders
  WHERE year(o_orderdate) = 1997
  GROUP BY 1
)
SELECT months.m, COALESCE(rev.revenue, 0.0) AS revenue,
       COALESCE(rev.n_orders, 0) AS n_orders
FROM months LEFT JOIN rev ON months.m = rev.m
"""


@query("cte_recursive", oracle=_SQL, category="B")
def cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive WITH: 12-month spine ⟕ monthly revenue. The identical SQL
    string is the oracle — both engines run the same recursion."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL)
