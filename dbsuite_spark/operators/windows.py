"""Category E — window functions (SURVEY §2E): DB2 "OLAP specifications",
a headline feature of the dialect dbsuite parsed.

Every window here has a *total* deterministic order (tie-break on a unique
key) so results are hash-stable (SURVEY §7.4.4). Windowed sums go through
decimal (order-exact) like all aggregates.

Scale notes: a window = one shuffle on partitionBy keys + per-partition
sort. Partition keys (custkey, returnflag) are high-cardinality or bounded;
no single-partition global windows except where the result is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbsuite_spark.exact import DEC
from dbsuite_spark.registry import query
from dbsuite_spark.tables import t


@query(
    "win_row_number",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn
FROM orders
""",
    category="E",
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER per customer in order-date order (orderkey tie-break)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("bigint").alias("rn"),
    )


@query(
    "win_rank_dense",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS BIGINT)
           AS qty_rank,
       CAST(DENSE_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
            AS BIGINT) AS qty_dense_rank
FROM lineitem
""",
    category="E",
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK + DENSE_RANK with genuine ties (quantity is a small domain)."""
    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w).cast("bigint").alias("qty_rank"),
        F.dense_rank().over(w).cast("bigint").alias("qty_dense_rank"),
    )


@query(
    "win_ntile",
    oracle="""
SELECT c_custkey,
       CAST(NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT)
           AS balance_quartile
FROM customer
""",
    category="E",
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) buckets over a unique total order. Global window is fine
    here (customer is dimension-sized); a fact-table ntile would instead be
    computed per-partition-key."""
    c = t(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey", F.ntile(4).over(w).cast("bigint").alias("balance_quartile")
    )


@query(
    "win_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey,
       LAG(o_totalprice, 1, -1.0) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
       LEAD(o_totalprice, 1, -1.0) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
FROM orders
""",
    category="E",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD with explicit defaults."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice", 1, -1.0).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1, -1.0).over(w).alias("next_price"),
    )


@query(
    "win_first_last",
    oracle="""
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       LAST_VALUE(o_orderkey) OVER w AS last_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    category="E",
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE / LAST_VALUE over an explicit unbounded frame (the
    default frame would make LAST_VALUE = current row)."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    )


@query(
    "win_running_total",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_spend
FROM orders
""",
    category="E",
)
def win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum — decimal-exact so the running value is identical no
    matter how the engine incrementalizes the frame."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias(
            "running_spend"
        ),
    )


@query(
    "win_moving_avg",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
           / COUNT(*) OVER w AS moving_avg_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
""",
    category="E",
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding physical frame (ROWS 3 PRECEDING): exact decimal sum /
    frame count, identical under sliding-frame re-use on either engine."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double")
            / F.count("*").over(w)
        ).alias("moving_avg_price"),
    )


@query(
    "win_range_frame",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice,
       CAST(COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                           RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS peers_within_10k
FROM orders
""",
    category="E",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logical RANGE frame (value-based): peers within a 10k price band
    below each order."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 0)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.count("*").over(w).cast("bigint").alias("peers_within_10k"),
    )


@query(
    "win_percent_cume",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(PERCENT_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity), 9)
           AS pct_rank,
       ROUND(CUME_DIST() OVER (PARTITION BY l_returnflag ORDER BY l_quantity), 9)
           AS cume
FROM lineitem
""",
    category="E",
)
def win_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK and CUME_DIST (both are exact rational arithmetic on
    ranks; rounded to 9 for hash stability)."""
    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )


@query(
    "win_topk_per_group",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey)
              AS BIGINT) AS rn
  FROM orders) ranked
WHERE rn <= 3
""",
    category="E",
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greatest-n-per-group: top-3 orders per customer by price (unique
    tie-break). One shuffle on the group key; AQE handles group skew."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )
