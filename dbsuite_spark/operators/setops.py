"""Category G — set operations (SURVEY §2G): UNION [ALL], INTERSECT [ALL],
EXCEPT [ALL] — the DB2 fullselect surface.

Scale notes: UNION ALL is a zero-shuffle concatenation; the distinct/bag
variants add one hash-aggregate shuffle on the full row — at 100 TB prefer
UNION ALL + downstream dedup on a key when semantics allow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsuite_spark.registry import query
from dbsuite_spark.tables import t


def _year_custkeys(spark, sf_dir, year: int) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.filter(F.year("o_orderdate") == year).select(
        F.col("o_custkey").alias("custkey")
    )


@query(
    "set_union_all",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
UNION ALL
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
""",
    category="G",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag concatenation, no shuffle)."""
    return _year_custkeys(spark, sf_dir, 1996).unionByName(
        _year_custkeys(spark, sf_dir, 1997)
    )


@query(
    "set_union_distinct",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
UNION
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
""",
    category="G",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set semantics = union-all + distinct)."""
    return (
        _year_custkeys(spark, sf_dir, 1996)
        .unionByName(_year_custkeys(spark, sf_dir, 1997))
        .distinct()
    )


@query(
    "set_intersect",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
""",
    category="G",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct customers active in both years)."""
    return _year_custkeys(spark, sf_dir, 1996).intersect(
        _year_custkeys(spark, sf_dir, 1997)
    )


@query(
    "set_intersect_all",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT ALL
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
""",
    category="G",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics: min of per-side multiplicities)."""
    return _year_custkeys(spark, sf_dir, 1996).intersectAll(
        _year_custkeys(spark, sf_dir, 1997)
    )


@query(
    "set_except",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
""",
    category="G",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference, distinct)."""
    return _year_custkeys(spark, sf_dir, 1996).subtract(
        _year_custkeys(spark, sf_dir, 1997)
    )


@query(
    "set_except_all",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
EXCEPT ALL
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
""",
    category="G",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference: multiplicities subtract)."""
    return _year_custkeys(spark, sf_dir, 1996).exceptAll(
        _year_custkeys(spark, sf_dir, 1997)
    )


@query(
    "set_symmetric_difference",
    oracle="""
WITH a AS (SELECT DISTINCT o_custkey AS custkey FROM orders
           WHERE year(o_orderdate) = 1996),
b AS (SELECT DISTINCT o_custkey AS custkey FROM orders
      WHERE year(o_orderdate) = 1997)
SELECT custkey, 'only_1996' AS side FROM (SELECT custkey FROM a EXCEPT SELECT custkey FROM b)
UNION ALL
SELECT custkey, 'only_1997' AS side FROM (SELECT custkey FROM b EXCEPT SELECT custkey FROM a)
""",
    category="G",
)
def set_symmetric_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference with provenance: customers active in exactly
    one of two years, labeled by which — (A∖B) ∪ (B∖A), the churn/new
    split every retention report starts from. Two distinct EXCEPTs over
    the same pair of inputs; AQE reuses the shuffled inputs across both
    branches."""
    a = _year_custkeys(spark, sf_dir, 1996).distinct()
    b = _year_custkeys(spark, sf_dir, 1997).distinct()
    only_a = a.exceptAll(b).select(
        "custkey", F.lit("only_1996").alias("side")
    )
    only_b = b.exceptAll(a).select(
        "custkey", F.lit("only_1997").alias("side")
    )
    return only_a.unionByName(only_b)


@query(
    "set_union_by_name",
    oracle="""
SELECT o_custkey AS custkey,
       o_totalprice AS price,
       CAST(NULL AS VARCHAR) AS priority
FROM orders WHERE year(o_orderdate) = 1996
UNION ALL
SELECT o_custkey AS custkey,
       CAST(NULL AS DOUBLE) AS price,
       o_orderpriority AS priority
FROM orders WHERE year(o_orderdate) = 1997
""",
    category="G",
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``unionByName(allowMissingColumns=True)`` — positional UNION's
    safe sibling: columns align by NAME and absent columns null-fill,
    the only sane way to append frames whose schemas drifted (the
    in-memory twin of the mergeSchema scan). The oracle states the
    null-padded union."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_totalprice").alias("price"),
    )
    b = o.filter(F.year("o_orderdate") == 1997).select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
    )
    return a.unionByName(b, allowMissingColumns=True).select(
        "custkey", "price", "priority"
    )
