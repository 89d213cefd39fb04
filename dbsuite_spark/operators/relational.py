"""Category B — projection / filter / predicate operators (SURVEY §2B).

Reference semantics: the SELECT-list and WHERE-clause surface of the DB2 LUW
dialect parsed by dbsuite (provenance SURVEY §0/§2 [PUBLIC, module-level];
reference checkout empty). All Spark-native: filters compile to Parquet
pushdown + whole-stage codegen; subquery predicates become broadcast
semi/anti joins under Catalyst's RewritePredicateSubquery.

Scale notes: every filter here is pushed into the parquet scan (verified
via .explain → PushedFilters); predicates on 100 TB prune row groups before
any CPU is spent. Subquery rewrites broadcast the (small) inner side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsuite_spark.registry import query
from dbsuite_spark.tables import register_views, t


@query(
    "project_columns",
    oracle="""
SELECT o_orderkey AS order_id, o_orderstatus AS status, o_orderpriority AS priority
FROM orders
""",
    category="B",
)
def project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column subset + rename — column pruning reaches the parquet scan."""
    return t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    )


@query(
    "project_computed",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS DOUBLE)
           AS net_price,
       CAST(CAST(l_quantity * 2 AS DECIMAL(18,6)) AS DOUBLE) AS double_qty
FROM lineitem
""",
    category="B",
)
def project_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived expressions in the SELECT list (the TPC-H pricing expr)."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,6)")
        .cast("double")
        .alias("net_price"),
        (F.col("l_quantity") * 2).cast("decimal(18,6)").cast("double").alias(
            "double_qty"
        ),
    )


@query(
    "filter_comparison",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice >= 300000 AND o_orderstatus <> 'P'
""",
    category="B",
)
def filter_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """<, <=, =, <>, >= comparison predicates (pushed to the scan)."""
    o = t(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_totalprice") >= 300000) & (F.col("o_orderstatus") != "P")
    ).select("o_orderkey", "o_totalprice")


@query(
    "filter_boolean_logic",
    oracle="""
SELECT l_orderkey, l_linenumber
FROM lineitem
WHERE (l_returnflag = 'R' OR l_linestatus = 'O')
  AND NOT (l_quantity < 5 AND l_discount > 0.08)
""",
    category="B",
)
def filter_boolean_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND / OR / NOT composition."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_returnflag") == "R") | (F.col("l_linestatus") == "O"))
        & ~((F.col("l_quantity") < 5) & (F.col("l_discount") > 0.08))
    ).select("l_orderkey", "l_linenumber")


@query(
    "filter_between",
    oracle="""
SELECT o_orderkey, o_orderdate
FROM orders
WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
""",
    category="B",
)
def filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN (inclusive both ends) on a timestamp column."""
    o = t(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderdate").between(
            F.lit("1997-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    ).select("o_orderkey", "o_orderdate")


@query(
    "filter_in_list",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'FURNITURE')
""",
    category="B",
)
def filter_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN over a literal list."""
    c = t(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY", "FURNITURE")
    ).select("c_custkey", "c_mktsegment")


@query(
    "filter_like",
    oracle="""
SELECT p_partkey, p_type
FROM part
WHERE p_type LIKE 'PROMO%' OR p_name LIKE '%_5%'
""",
    category="B",
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE with % and _ wildcards."""
    p = t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("PROMO%") | F.col("p_name").like("%_5%")
    ).select("p_partkey", "p_type")


@query(
    "filter_regexp",
    oracle="""
SELECT p_partkey, p_brand
FROM part
WHERE regexp_matches(p_brand, 'Brand#1[0-9]$')
""",
    category="B",
)
def filter_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicate (DB2 9.7+ REGEXP_LIKE analog)."""
    p = t(spark, sf_dir, "part")
    return p.filter(F.col("p_brand").rlike("Brand#1[0-9]$")).select(
        "p_partkey", "p_brand"
    )


@query(
    "filter_null_semantics",
    oracle="""
SELECT o_orderkey,
       NULLIF(o_orderstatus, 'P') AS status_or_null
FROM orders
WHERE NULLIF(o_orderstatus, 'P') IS NULL
   OR (NULLIF(o_orderstatus, 'P') = 'F') IS NULL
""",
    category="B",
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL + three-valued logic. Fixtures are NULL-free, so NULLs
    are manufactured with NULLIF; the second disjunct is never-true but
    exercises (NULL = x) IS NULL three-valued evaluation."""
    o = t(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey", status_or_null.alias("status_or_null")
    ).filter(
        F.col("status_or_null").isNull()
        | (F.col("status_or_null") == "F").isNull()
    )


@query(
    "distinct_rows",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
""",
    category="B",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT (hash-aggregate with partial dedup before shuffle)."""
    return t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).distinct()


@query(
    "case_when",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 300000 THEN 'high'
            WHEN o_totalprice >= 100000 THEN 'mid'
            ELSE 'low' END AS price_band
FROM orders
""",
    category="B",
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Searched CASE expression."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
    )


@query(
    "cast_expr",
    oracle="""
SELECT p_partkey,
       CAST(p_size AS VARCHAR) AS size_str,
       CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
       TRY_CAST(p_type AS INTEGER) AS bad_cast,
       TRY_CAST(CAST(p_size AS VARCHAR) AS INTEGER) AS roundtrip
FROM part
""",
    category="B",
)
def cast_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST / TRY_CAST between numeric and string. Double→int goes through
    FLOOR on both sides (Spark truncates, DuckDB rounds — never cast a raw
    double to int across engines)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("string").alias("size_str"),
        F.floor("p_retailprice").cast("bigint").alias("price_floor"),
        F.col("p_type").try_cast("int").alias("bad_cast"),
        F.col("p_size").cast("string").try_cast("int").alias("roundtrip"),
    )


@query(
    "filter_exists_subquery",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
""",
    category="B",
)
def filter_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → left-semi join (Catalyst's own rewrite)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "filter_not_exists",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    category="B",
)
def filter_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "scalar_subquery",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice >
      (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
       FROM orders) * 2
""",
    category="B",
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate. The scalar is a decimal-exact mean so
    the comparison threshold is bit-identical across engines."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice >
              (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                      / COUNT(*)
               FROM orders) * 2
        """
    )


@query(
    "filter_in_subquery",
    oracle="""
SELECT o_orderkey, o_custkey
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
""",
    category="B",
)
def filter_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (SELECT ...) → left-semi join on the filtered inner side."""
    o = t(spark, sf_dir, "orders")
    rich = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    return o.join(
        rich, o.o_custkey == rich.c_custkey, "left_semi"
    ).select("o_orderkey", "o_custkey")


@query(
    "sql_star_except",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
WHERE o_orderstatus = 'F'
""",
    category="B",
)
def sql_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT * EXCEPT (cols)`` — Spark 4's subtractive projection:
    keep everything but the named columns, the ergonomic (and
    evolution-safe) way to drop bulky/sensitive fields without
    enumerating survivors. The oracle states the equivalent explicit
    list; column pruning still reaches the scan either way (the analyzer
    expands EXCEPT before optimization)."""
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT * EXCEPT (o_orderstatus, o_orderdate) FROM orders "
        "WHERE o_orderstatus = 'F'"
    )
