"""TPC-H-shaped composite queries over the fixture star schema (SURVEY
§2N). These are the end-to-end workloads a reference deployment actually
runs — each one exercises several §2 operators in one plan (multi-join +
filter + aggregate + top-k), with the same decimal-sum/alias discipline as
the unit keys, so every query carries a full DuckDB value-hash oracle.

Adaptations to the fixture schema (documented per query): there is no
``partsupp`` table and no commit/receipt dates or comment/phone columns,
so queries that need them are *adapted*, not skipped — Q2/Q11/Q20 derive
the part–supplier relation from lineitem shipment history, Q9 uses
``p_retailprice`` as the cost basis, Q4/Q12/Q21 define lateness from
shipdate vs orderdate, and Q22's phone-prefix filter becomes a nation-key
slice. Q1 is the flagship ``agg_groupby_basic`` (operators/aggregates.py),
so all 22 classic queries have a fixture-shaped equivalent. Nation names
are the fixture's ``NATION_<k>``; date pivots are chosen inside the
fixture's 1995–2001 span.

Scale notes: every plan here is the classic warehouse shape — selective
filters pushed to scans, bounded dims (region/nation/part-slices)
broadcast, the lineitem fact shuffled at most once per aggregation level,
top-k as TakeOrderedAndProject. AQE handles the rest at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbsuite_spark.exact import BIGCOUNT, DSUM, dsum
from dbsuite_spark.registry import query
from dbsuite_spark.tables import fan_out, t

def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


REV_SQL = "l_extendedprice * (1 - l_discount)"


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey,
       {DSUM(REV_SQL)} AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
""",
    category="N",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: unshipped high-value orders for one segment. Segment filter
    prunes customer (broadcast), date filters push to both fact scans,
    one grouped aggregation, top-10 via TakeOrdered (l_orderkey added to
    the sort for a deterministic boundary)."""
    c = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    # Round-14: keyed fan_out AFTER the pushed filter — with both joins
    # broadcast, the probe chain + partial aggregate fused into the
    # single-row-group lineitem scan ran on one core (see
    # join_multiway_star). Identity at scale.
    li = fan_out(
        t(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
        ),
        key="l_orderkey",
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_rev()).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "tpch_q4_order_priority",
    oracle=f"""
SELECT o_orderpriority, {BIGCOUNT("*")} AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
""",
    category="N",
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 (adapted: lateness = shipped >60 days after order, since the
    fixture has no commitdate): priority mix of late orders. EXISTS plans
    as a left-semi join — the fact side never fans out."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@query(
    "tpch_q5_local_supplier",
    oracle=f"""
SELECT n_name, {DSUM(REV_SQL)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
    category="N",
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: revenue through local suppliers per nation of one region. The
    region→nation→supplier dimension chain broadcasts; lineitem joins
    orders on the shuffle key and everything else map-side."""
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    # Round-14: keyed fan_out MEASURED AND REJECTED here (2/6
    # interleaved, median 0.77→0.85 s): unlike join_multiway_star, the
    # fan_out exchange ships the full-width fact rows while the serial
    # probe it parallelizes is already cheap — the dim chain prunes
    # early. The one-task scan stage stays the documented local ceiling.
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum(_rev()).alias("revenue"))
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
SELECT {DSUM("l_extendedprice * l_discount")} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    category="N",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: pure scan-filter-aggregate — every predicate pushes into the
    parquet scan; a single global decimal sum (partial+final)."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue")
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
       {DSUM(REV_SQL)} AS revenue
FROM supplier s
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                     AND TIMESTAMP '1997-12-31'
GROUP BY supp_nation, cust_nation, l_year
""",
    category="N",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: bilateral trade volume by year between two nations. Both
    nation dims broadcast; the OR'd nation-pair predicate filters after
    the map-side joins, before the single grouped aggregation."""
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(n.withColumnRenamed("n_name", "supp_nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    c = t(spark, sf_dir, "customer").join(
        F.broadcast(n.withColumnRenamed("n_name", "cust_nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "cust_nation")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1")
        & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2")
        & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dsum(_rev()).alias("revenue"))
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
WITH vol AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         CAST({REV_SQL} AS DECIMAL(18,6)) AS volume,
         sn.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region   ON cn.n_regionkey = r_regionkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                        AND TIMESTAMP '1997-12-31'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                     ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM vol GROUP BY o_year
""",
    category="N",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: one nation's share of regional order volume for one part type,
    by year. Share = ratio of two exact decimal sums cast to double —
    engine-deterministic. Part/region/nation dims broadcast."""
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = (
        t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cnk"))
    )
    sn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    c = t(spark, sf_dir, "customer").join(
        F.broadcast(cn), F.col("c_nationkey") == F.col("cnk")
    )
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    dec0 = F.lit(0).cast("decimal(18,6)")
    vol = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev().cast("decimal(18,6)").alias("volume"),
            "supp_nation",
        )
    )
    return vol.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                .otherwise(dec0)
            ).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name, {DSUM(REV_SQL)} AS revenue,
       c_acctbal, c_mktsegment
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, c_mktsegment
ORDER BY revenue DESC, c_custkey LIMIT 20
""",
    category="N",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: top-20 customers by returned-merchandise revenue in one
    quarter. Return-flag + date filters push to the scans; per-customer
    rollup then TakeOrdered with key tie-break."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .agg(dsum(_rev()).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select(
            "c_custkey", "c_name", "revenue", "c_acctbal", "c_mktsegment"
        )
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
GROUP BY c_count
""",
    category="N",
)
def tpch_q13_customer_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q13: distribution of orders-per-customer including zero-order
    customers (left join + count of the nullable key). Two aggregation
    levels; the second input is one row per customer — tiny."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "tpch_q14_promo_effect",
    oracle=f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                 THEN CAST({REV_SQL} AS DECIMAL(18,6))
                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
       / {DSUM(REV_SQL)} AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate < TIMESTAMP '1996-10-01'
""",
    category="N",
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promotional revenue share for one month — conditional decimal
    sum over a broadcast part join, ratio taken in double at the end."""
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    dec0 = F.lit(0).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                100.0
                * F.sum(
                    F.when(
                        F.col("p_type").like("PROMO%"),
                        _rev().cast("decimal(18,6)"),
                    ).otherwise(dec0)
                ).cast("double")
                / dsum(_rev())
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey AS supplier_no, {DSUM(REV_SQL)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
""",
    category="N",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with maximum 3-month revenue. The revenue "view"
    aggregates once; the max is a rank-1 window over that tiny aggregate
    (equivalent to the scalar-subquery formulation, one less pass)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_rev()).alias("total_revenue")
    )
    w = Window.orderBy(F.desc("total_revenue"))
    top = (
        rev.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return top.join(
        s, top.supplier_no == s.s_suppkey
    ).select("s_suppkey", "s_name", "total_revenue")


@query(
    "tpch_q17_small_quantity",
    oracle=f"""
WITH flagged AS (
  SELECT l_extendedprice, l_quantity,
         AVG(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty, p_brand
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#3')
SELECT {DSUM("l_extendedprice")} / 7.0 AS avg_yearly
FROM flagged WHERE l_quantity < 0.2 * avg_qty
""",
    category="N",
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue lost to small-quantity orders of one brand. The
    correlated per-part average decorrelates to a window over the
    brand-filtered join (quantities are whole numbers, so the double
    average is exact on both engines)."""
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li = t(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    w = Window.partitionBy("l_partkey")
    return (
        j.withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((dsum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly"))
    )


@query(
    "tpch_q18_large_volume",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 300)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {DSUM("l_quantity")} AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
""",
    category="N",
)
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: customers with very large single orders.

    Round-13 optimization (guide §2.4 — don't recompute what an
    aggregate already holds): the classic shape re-scans lineitem to
    roll up detail per surviving order, but the final GROUP BY contains
    ``o_orderkey``, so the rollup's ``SUM(l_quantity)`` per group IS the
    HAVING pre-pass aggregate ``q`` — the second lineitem scan + probe +
    final rollup exchange computed a value the pre-pass already had.
    Now: ONE lineitem scan (the HAVING aggregation — the only fact
    shuffle), and the tiny >300-qty set carries its sum straight into
    two broadcast joins against orders and customer; no second fact
    pass, no final aggregation at all. ``total_qty`` is the same
    decimal(18,6) sum cast to double (dsum's exact definition), so the
    output is row-identical (verified vs the old shape and the oracle
    at sf0.01/sf0.1; interleaved same-session at sf0.1 it won 4 of 5
    rounds, min 1.68 → 1.50 s; at scale it removes a full fact scan).

    Broadcast-size assumption (ADVICE r04): the >300-qty set is a
    constant *fraction* of orders — low-millions of rows at the 100 TB
    regime, and narrower than before (orderkey + one sum). The forced
    ``F.broadcast`` hints are correct up to the broadcast ceiling;
    past that, drop the hints and let AQE pick shuffled-hash — the
    single-fact-shuffle structure is unchanged either way."""
    # Round-14: keyed fan_out on the groupBy key — the one-task partial
    # aggregate of the single-row-group scan becomes a 32-wide COMPLETE
    # aggregation riding the fan_out exchange (hashpartitioning
    # satisfies the groupBy's distribution, so no further exchange is
    # planned). Same single-fact-shuffle structure, wide instead of
    # serial; identity at scale.
    li = fan_out(t(spark, sf_dir, "lineitem"), key="l_orderkey")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey", F.col("q").cast("double").alias("total_qty"))
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    sub = o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
    return c.join(
        F.broadcast(sub), sub.o_custkey == c.c_custkey
    ).select(
        "c_name", "c_custkey", "o_orderkey", "o_orderdate",
        "o_totalprice", "total_qty",
    )


@query(
    "tpch_q19_discounted_revenue",
    oracle=f"""
SELECT {DSUM(REV_SQL)} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
""",
    category="N",
)
def tpch_q19_discounted_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q19: disjunctive brand/size/quantity predicate over the part join —
    the classic OR-of-ANDs that exercises predicate handling inside a
    join. Part is bounded → broadcast; the OR evaluates post-join in
    codegen."""
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = t(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(branch).agg(dsum(_rev()).alias("revenue"))


@query(
    "tpch_q16_supplier_relation",
    oracle="""
SELECT p_brand, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
""",
    category="N",
)
def tpch_q16_supplier_relation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q16 (adapted: lineitem stands in for the absent partsupp relation,
    and the complaints filter becomes negative account balance): distinct
    supplier counts per brand/size slice. The excluded-supplier set is a
    broadcast anti-join; the distinct count is the expand+two-level
    aggregation Catalyst plans for COUNT(DISTINCT) — both partial-
    aggregate map-side."""
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    )
    bad = t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = t(spark, sf_dir, "lineitem").join(
        F.broadcast(bad),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_anti",
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey),
eligible AS (
  SELECT l_partkey, unit_cost, s_name, s_acctbal, n_name
  FROM cost
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE')
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
FROM eligible JOIN part ON l_partkey = p_partkey
WHERE p_size <= 25 AND p_type = 'ECONOMY'
  AND unit_cost = (SELECT MIN(e2.unit_cost) FROM eligible e2
                   WHERE e2.l_partkey = part.p_partkey)
""",
    category="N",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 (adapted: no partsupp, so the part-supplier offer is derived from
    shipment history — unit cost = MIN(extendedprice/quantity) per
    (part, supplier)): cheapest EUROPE supplier per part in a size/type
    slice. The correlated MIN decorrelates to a window over the
    region-filtered offers; region→nation dims broadcast. Per-row IEEE
    division and MIN are order-free, so the double compares exactly."""
    cost = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_cost"
            )
        )
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    eligible = cost.join(s, cost.l_suppkey == s.s_suppkey)
    w = Window.partitionBy("l_partkey")
    best = eligible.withColumn(
        "min_cost", F.min("unit_cost").over(w)
    ).filter(F.col("unit_cost") == F.col("min_cost"))
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 25) & (F.col("p_type") == "ECONOMY")
    )
    return best.join(
        F.broadcast(p), best.l_partkey == p.p_partkey
    ).select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
             "unit_cost")


@query(
    "tpch_q9_product_type_profit",
    oracle=f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       {DSUM("l_extendedprice * (1 - l_discount)"
             " - p_retailprice * l_quantity * 0.1")} AS sum_profit
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
""",
    category="N",
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 (adapted: no partsupp supplycost — unit cost modeled as 10% of
    ``p_retailprice``): profit on one product line by supplier nation and
    order year. Part filter broadcasts; lineitem joins orders on the
    shuffle key; nation broadcast at the end."""
    p = t(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_retailprice")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # Round-14: keyed fan_out MEASURED AND REJECTED here (0/6
    # interleaved, median 0.82→1.08 s): the broadcast part filter
    # (%widget%) prunes most fact rows in the scan stage, so the
    # exchange of full-width rows costs more than the serial probe of
    # the survivors. Left at the documented local scan ceiling.
    li = t(spark, sf_dir, "lineitem")
    profit = (
        _rev() - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(profit).alias("sum_profit"))
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
WITH val AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
             AS vdec
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey = 1
  GROUP BY l_partkey)
SELECT l_partkey AS p_partkey, CAST(vdec AS DOUBLE) AS part_value
FROM val
WHERE CAST(vdec AS DOUBLE) >
      0.0001 * (SELECT CAST(SUM(vdec) AS DOUBLE) FROM val)
""",
    category="N",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 (adapted: stock value per part = shipped revenue through one
    nation's suppliers, since there is no partsupp availqty): parts whose
    value exceeds a fraction of the national total. The scalar-subquery
    threshold is a 1-row broadcast; both the per-part and global sums stay
    in exact decimal until the final double cast, so the > comparison is
    engine-identical."""
    s = t(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey") == 1
    ).select("s_suppkey")
    li = t(spark, sf_dir, "lineitem")
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(_rev().cast("decimal(18,6)")).alias("vdec"))
    )
    total = val.agg(
        F.sum("vdec").cast("double").alias("total_value")
    )
    return (
        val.crossJoin(F.broadcast(total))
        .filter(
            F.col("vdec").cast("double") > 0.0001 * F.col("total_value")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("vdec").cast("double").alias("part_value"),
        )
    )


@query(
    "tpch_q12_shipmode_priority",
    oracle="""
SELECT l_linestatus AS ship_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY ship_class
""",
    category="N",
)
def tpch_q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 (adapted: ``l_linestatus`` stands in for the absent shipmode and
    lateness = shipped >60 days after order): priority mix of late lines
    per shipping class — the classic conditional-count pivot."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q20_excess_inventory",
    oracle="""
WITH shipped AS (
  SELECT l_suppkey
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_name LIKE 'small%')
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 50)
SELECT DISTINCT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2'
  AND s_suppkey IN (SELECT l_suppkey FROM shipped)
""",
    category="N",
)
def tpch_q20_excess_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 (adapted: 'excess availability' = shipped more than 50 units of
    one 'small%' part in a year, since there is no partsupp availqty):
    NATION_2 suppliers with heavy shipments of the targeted parts. The
    part-name filter broadcasts into the fact scan; the HAVING pre-pass
    yields a tiny supplier set consumed by a semi-join."""
    p = t(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("q"))
        .filter(F.col("q") > 50)
        .select("l_suppkey")
        .distinct()
    )
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return s.join(
        heavy, s.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
WITH ostat AS (
  SELECT l_orderkey, MAX(l_shipdate) AS max_ship,
         COUNT(DISTINCT l_suppkey) AS nsupp
  FROM lineitem GROUP BY l_orderkey),
latest AS (
  SELECT DISTINCT li.l_orderkey, li.l_suppkey
  FROM lineitem li JOIN ostat ON li.l_orderkey = ostat.l_orderkey
  WHERE li.l_shipdate = ostat.max_ship),
sole AS (
  SELECT l_orderkey FROM latest GROUP BY l_orderkey HAVING COUNT(*) = 1)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM latest
JOIN sole   ON latest.l_orderkey = sole.l_orderkey
JOIN ostat  ON latest.l_orderkey = ostat.l_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE ostat.nsupp >= 2 AND n_name = 'NATION_0'
GROUP BY s_name
""",
    category="N",
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 (adapted: 'kept the order waiting' = this supplier alone shipped
    on the order's latest ship date and the order used ≥2 suppliers, since
    commit/receipt dates don't exist): per-NATION_0-supplier count of
    multi-supplier orders they finished last.

    Round-13 optimization (guide §2.4 — same-key window reuses the
    aggregation's partitioning): the EXISTS/NOT-EXISTS pair decorrelates
    to per-order WINDOW aggregates over ONE hash shuffle of the fact
    table — max shipdate and distinct-supplier count (size of collect_set
    ≡ countDistinct) as windows over ``l_orderkey``, the latest-shipper
    dedup as a same-partitioning dropDuplicates (hash(l_orderkey)
    satisfies the (l_orderkey, l_suppkey) clustering requirement — no
    second exchange), and the 'sole latest shipper' test as a count
    window over the deduped rows, again exchange-free. The previous
    groupBy+join+distinct+semi-join shape shuffled the fact three more
    times (measured interleaved same-session: min 2.23s → 1.05s at
    sf0.1; plans/r13/tpch_q21_waiting_suppliers_{before,after}.txt)."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    w = Window.partitionBy("l_orderkey")
    latest = (
        li.select(
            "l_orderkey",
            "l_suppkey",
            "l_shipdate",
            F.max("l_shipdate").over(w).alias("max_ship"),
            F.size(F.collect_set("l_suppkey").over(w)).alias("nsupp"),
        )
        .filter(F.col("l_shipdate") == F.col("max_ship"))
        .select("l_orderkey", "l_suppkey", "nsupp")
        .dropDuplicates(["l_orderkey", "l_suppkey"])
        .withColumn("n_latest", F.count("*").over(w))
    )
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_0")
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    return (
        latest.filter((F.col("nsupp") >= 2) & (F.col("n_latest") == 1))
        .join(s, latest.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle=f"""
WITH pool AS (
  SELECT c_custkey, c_nationkey, c_acctbal FROM customer
  WHERE c_nationkey IN (0, 1, 2, 3)),
thresh AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
         / COUNT(*) AS avg_bal
  FROM pool WHERE c_acctbal > 0.0)
SELECT c_nationkey, {BIGCOUNT("*")} AS numcust,
       {DSUM("c_acctbal")} AS totacctbal
FROM pool, thresh
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
""",
    category="N",
)
def tpch_q22_global_sales_opportunity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q22 (adapted: the phone-prefix country filter becomes a nation-key
    slice, and 'never ordered' becomes 'no orders since 2000-01-01' so the
    result is non-empty at every fixture SF): wealthy-but-dormant customers
    per nation. The average is a 1-row broadcast scalar
    (decimal sum / count, so the > threshold compares identically on both
    engines); the no-orders test is a left-anti join, never a fan-out."""
    pool = t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(0, 1, 2, 3)
    ).select("c_custkey", "c_nationkey", "c_acctbal")
    thresh = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("avg_bal")
    )
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        pool.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, pool.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )
