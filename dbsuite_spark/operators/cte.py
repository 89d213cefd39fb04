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


@query(
    "sql_pipe_syntax",
    oracle=f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       {DSUM('o_totalprice')} AS total
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
""",
    category="B",
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax (``|>``, SQL:2023-style operator
    chaining): the same filter→aggregate plan written as a linear
    pipeline instead of nested clauses — piped queries parse to
    identical Catalyst plans, so this costs nothing and reads like the
    DataFrame API. The oracle is the classic formulation, proving the
    two denote the same relation."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE COUNT(*) AS n,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                          AS DOUBLE) AS total
           GROUP BY o_orderpriority
        |> SELECT o_orderpriority, n, total
        """
    )


@query(
    "sql_parameterized",
    oracle="""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_rich
FROM customer
WHERE c_acctbal > 5000.0 AND c_nationkey IN (0, 1, 2)
GROUP BY c_mktsegment
""",
    category="B",
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (``spark.sql(query, args=...)``) — the
    injection-safe prepared-statement surface (DB2 parameter markers):
    values bind as typed literals at parse time, never by string
    concatenation, and Catalyst constant-folds them so the plan is
    identical to inlined literals (pushdown still reaches the scan).
    The oracle inlines the same values."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n_rich
        FROM customer
        WHERE c_acctbal > :min_bal AND c_nationkey IN (:n0, :n1, :n2)
        GROUP BY c_mktsegment
        """,
        args={"min_bal": 5000.0, "n0": 0, "n1": 1, "n2": 2},
    )


@query(
    "sql_values_inline",
    oracle="""
WITH tiers(tier_name, lo, hi) AS (
  VALUES ('small', 0.0, 200000.0),
         ('medium', 200000.0, 400000.0),
         ('large', 400000.0, 1000000.0))
SELECT tier_name, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders JOIN tiers
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY tier_name
""",
    category="B",
)
def sql_values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES derived table (the dialect's literal-table
    constructor) joined against a fact — the idiomatic way to ship a
    small lookup (tier bounds, code maps) inside the query text rather
    than a side file. The 3-row literal relation broadcasts; the fact
    is scanned once with the banding as a nested-loop over 3 rows."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH tiers AS (
          SELECT * FROM VALUES
            ('small', 0.0D, 200000.0D),
            ('medium', 200000.0D, 400000.0D),
            ('large', 400000.0D, 1000000.0D)
          AS t(tier_name, lo, hi))
        SELECT tier_name, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders JOIN tiers
          ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY tier_name
        """
    )


@query(
    "sql_group_by_all",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       {DSUM('o_totalprice')} AS total
FROM orders
GROUP BY ALL
""",
    category="B",
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` (group by every non-aggregate select item) —
    the dialect sugar both engines added for wide rollups where
    repeating the key list invites drift. Parses to the same
    partial+final aggregate as the explicit form."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                   AS total
        FROM orders
        GROUP BY ALL
        """
    )


@query(
    "join_natural",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey, r_name
FROM nation NATURAL JOIN (
  SELECT r_regionkey AS n_regionkey, r_name FROM region) r
""",
    category="C",
)
def join_natural(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATURAL JOIN — implicit equi-join over the shared column names,
    coalescing the key into one output column (the dialect construct;
    production code prefers explicit USING, but the parser surface
    matters for ported queries). Dim×dim here; the plan is the same
    broadcast hash join as the explicit form."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_nationkey, n_name, n_regionkey, r_name
        FROM nation NATURAL JOIN (
          SELECT r_regionkey AS n_regionkey, r_name FROM region) r
        """
    )
