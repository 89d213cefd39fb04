"""Scale-pattern operators — the cluster disciplines the 100 TB mandate
names explicitly: bucketed co-located joins, skew salting, dynamic
partition pruning, and ANALYZE-fed CBO statistics.

Reference semantics: DB2 achieved the same ends with MDC/partitioned
tablespaces, hash distribution keys, and RUNSTATS [PUBLIC, module-level;
checkout empty — SURVEY §0]; these keys are their Parquet-lake
equivalents. Every key's *result* is plain relational content (full SQL
oracle); the physical property each exists to demonstrate is pinned in
tests/test_plans.py, because that property IS the feature.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsuite_spark.etl.io import artifact_path
from dbsuite_spark.registry import query
from dbsuite_spark.tables import t

N_BUCKETS = 8
N_SALT = 8


def _sf_tag(sf_dir: str) -> str:
    return (
        os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
        or "default"
    )


def _bucketed_table(
    spark: SparkSession,
    sf_dir: str,
    df: DataFrame,
    name: str,
    key: str,
) -> DataFrame:
    """Write ``df`` as an external bucketed+sorted table (idempotent per
    sf) and return it *from the catalog* — only catalog tables carry
    bucket metadata into planning."""
    tbl = f"{name}_{_sf_tag(sf_dir)}"
    if not spark.catalog.tableExists(tbl):
        # One file per bucket: repartition on the bucket key with
        # numPartitions == numBuckets (same Murmur3 hash family), so each
        # write task holds exactly one bucket. Only then does the reader
        # trust sortBy order and elide the per-side Sort under SMJ.
        (
            df.repartition(N_BUCKETS, F.col(key))
            .write.bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", artifact_path(sf_dir, f"bucketed_{name}"))
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(tbl)
        )
    return spark.table(tbl)


@query(
    "join_bucketed_colocate",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""",
    category="C",
)
def join_bucketed_colocate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via bucketing: both sides are written
    ``bucketBy(8, custkey) sortBy(custkey)``, so the sort-merge join reads
    bucket i against bucket i with NO exchange and NO sort on either side
    — the plan test pins both absences. This is how a 100 TB fact table
    joins a large dimension repeatedly without ever re-shuffling: pay the
    shuffle once at write time, amortize it over every subsequent join.
    (``merge`` hint pins SMJ so the small test-scale dim doesn't broadcast
    and hide the bucketing effect; the legacy outputOrdering conf lets the
    reader trust sortBy file order — valid because the writer guarantees
    one file per bucket.)"""
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
    )
    o = _bucketed_table(
        spark,
        sf_dir,
        t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        ),
        "b_orders",
        "o_custkey",
    )
    c = _bucketed_table(
        spark,
        sf_dir,
        t(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", "c_mktsegment"
        ),
        "b_customer",
        "c_custkey",
    )
    return (
        o.hint("merge")
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
    )


@query(
    "join_salted_skew",
    oracle="""
SELECT e.user_id, c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events e JOIN customer c ON c.c_custkey = e.user_id + 1
GROUP BY e.user_id, c.c_mktsegment
""",
    category="C",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join for skewed keys: ``events.user_id`` has tiny cardinality
    (~15 users for 100k+ events), so a plain shuffle join puts everything
    on 15 reducers. Salting appends ``pmod(hash(event_id), 8)`` to the big
    side's key and explodes the small side 8× so each hot key spreads over
    8 reducers; the join on (key, salt) is exact — results are identical
    to the unsalted join, which is exactly what the oracle checks. At
    100 TB this (or AQE skew-split, which handles moderate skew
    automatically) is the difference between a straggler-bound stage and a
    balanced one."""
    e = t(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.hash("event_id"), F.lit(N_SALT))
    )
    c = (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALT - 1)))
        )
    )
    return (
        e.hint("shuffle_hash")
        .join(
            c,
            (F.col("c_custkey") == F.col("user_id") + 1)
            & (e["salt"] == c["salt"]),
        )
        .groupBy("user_id", "c_mktsegment")
        .agg(F.count("*").alias("n_events"))
    )


@query(
    "join_dpp_partitioned",
    oracle="""
WITH dim AS (SELECT DISTINCT CAST(year(o_orderdate) AS INT) AS yr
             FROM orders WHERE o_orderpriority = '1-URGENT'
               AND year(o_orderdate) >= 1999)
SELECT f.l_year,
       CAST(SUM(CAST(f.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
         AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT CAST(year(l_shipdate) AS INT) AS l_year, l_extendedprice
      FROM lineitem) f
JOIN dim ON f.l_year = dim.yr
GROUP BY f.l_year
""",
    category="C",
)
def join_dpp_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is laid out
    ``partitionBy(l_year)`` (the etl_bulk_load discipline, SURVEY §4);
    joining it to a filtered dim on the partition column makes Catalyst
    inject a runtime subquery filter into the fact SCAN — only matching
    year directories are read. The plan test asserts the
    ``dynamicpruning`` expression. At 100 TB with date partitions this is
    the difference between scanning 3 days and 7 years."""
    fact_path = artifact_path(sf_dir, "lineitem_by_year")
    if not os.path.exists(os.path.join(fact_path, "_SUCCESS")):
        (
            t(spark, sf_dir, "lineitem")
            .select(
                F.year("l_shipdate").alias("l_year"), "l_extendedprice"
            )
            .write.partitionBy("l_year")
            .mode("overwrite")
            .parquet(fact_path)
        )
    fact = spark.read.parquet(fact_path)
    dim = (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.year("o_orderdate") >= 1999)
        )
        .select(F.year("o_orderdate").alias("yr"))
        .distinct()
    )
    return (
        fact.join(dim, fact["l_year"] == dim["yr"])
        .groupBy("l_year")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n"),
        )
        .select(F.col("l_year").cast("int").alias("l_year"), "revenue", "n")
    )


@query(
    "etl_analyze_stats",
    oracle="""
SELECT 'orders' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows
FROM orders
""",
    category="K",
)
def etl_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNSTATS equivalent: register the table in the catalog, run
    ``ANALYZE TABLE ... COMPUTE STATISTICS``, and read the row count back
    out of the *catalog statistics* (DESCRIBE EXTENDED), not the data —
    proving the stats CBO join-reordering feeds on (SURVEY §4) are
    actually populated. At 100 TB ANALYZE runs in the load path so every
    subsequent plan is costed with real cardinalities."""
    tbl = f"stats_orders_{_sf_tag(sf_dir)}"
    if not spark.catalog.tableExists(tbl):
        (
            t(spark, sf_dir, "orders")
            .write.option("path", artifact_path(sf_dir, "stats_orders"))
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(tbl)
        )
    spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS")
    stats = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}")
        .filter(F.col("col_name") == "Statistics")
        .select(
            F.regexp_extract("data_type", r"(\d+) rows", 1)
            .cast("bigint")
            .alias("n_rows")
        )
    )
    return stats.select(F.lit("orders").alias("table_name"), "n_rows")


@contextmanager
def bloom_filter_confs(spark: SparkSession):
    """Session confs under which Catalyst's InjectRuntimeFilter fires at
    fixture scale: broadcast disabled (the join must shuffle — the 100 TB
    shape where bloom filters pay) and the bloom creation/application
    thresholds scaled down to fixture sizes. Restores the prior session
    state on exit, even on error — safe on the shared driver session.

    Public on purpose: both ``join_bloom_filtered`` and the plan tests
    enter it, so the demonstrated shape survives a caller wrapping the
    result and re-planning (VERDICT r03 item 9)."""
    tweaks = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "100MB",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k, None) for k in tweaks}
    for k, v in tweaks.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@query(
    "join_bloom_filtered",
    oracle="""
SELECT l_orderkey, l_extendedprice, o_totalprice
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
""",
    category="C",
)
def join_bloom_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle join accelerated by Catalyst's runtime bloom-filter
    injection (InjectRuntimeFilter): the selective orders side builds a
    ``bloom_filter_agg`` subquery whose ``might_contain`` predicate is
    pushed into the lineitem scan, filtering the big side *before* the
    shuffle — at 100 TB this is the difference between shuffling the
    whole fact table and shuffling only probable matches. Results are
    identical to the plain join (bloom filters only skip non-matches).

    The driver's session has broadcast enabled and default thresholds
    (which suppress injection at fixture sizes), so the plan is forced
    eagerly under temporarily-adjusted confs (``bloom_filter_confs``) and
    the session is restored before returning — the physical plan is
    cached on the DataFrame, so execution keeps the bloom shape.
    ``tests/test_plans.py`` pins ``might_contain`` in the scan filter,
    including on a *wrapped, re-planned* DataFrame driven through the
    same public context manager (no private-API reliance for the
    demonstration: any caller composing on top of this result re-plans
    with the bloom shape by entering ``bloom_filter_confs`` around its
    action). Results are identical either way — bloom filters only skip
    non-matches — so correctness never depends on the confs."""
    with bloom_filter_confs(spark):
        o = t(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        ).select("o_orderkey", "o_totalprice")
        li = t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )
        df = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "l_extendedprice", "o_totalprice"
        )
        # Force physical planning NOW, while the confs are in effect; the
        # QueryExecution caches the plan for later actions on THIS frame.
        df._jdf.queryExecution().executedPlan()
    return df


_SKEW_ORACLE = """
WITH k AS (
  SELECT l_suppkey AS key, CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY l_suppkey),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(n) AS BIGINT) AS total_rows,
         CAST(MAX(n) AS BIGINT) AS max_rows,
         ROUND(quantile_cont(n, 0.5), 6) AS p50_rows,
         ROUND(quantile_cont(n, 0.99), 6) AS p99_rows
  FROM k),
top1 AS (
  SELECT CAST(MIN(key) AS BIGINT) AS hottest_key FROM k
  WHERE n = (SELECT MAX(n) FROM k))
SELECT t.n_keys, t.total_rows, t.max_rows, t.p50_rows, t.p99_rows,
       CAST(t.max_rows AS DOUBLE) / t.p50_rows AS skew_ratio,
       CAST(t.max_rows AS DOUBLE) / t.total_rows AS top1_share,
       h.hottest_key
FROM tot t, top1 h
"""


@query("etl_join_skew_report", oracle=_SKEW_ORACLE, category="K")
def etl_join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler — the pre-flight for every wide join in
    this repo's scale notes (``join_salted_skew``, the graph 2-hop keys,
    co-purchase): per-key row counts of the fact's supplier key reduced
    to the ops dashboard numbers — key count, max/median/p99 per-key
    rows, max:median skew ratio, the hottest key's share of all rows,
    and which key it is (min id on ties). Counts are exact integers;
    the two ratios are single pinned divisions; percentiles follow the
    ``agg_percentile_exact`` cross-engine interpolation (6-dp rounded).

    Scale: one partial+final count per key, then constant-size
    aggregates over the reduced (key, n) table — the profile that
    decides between plain shuffle, AQE skew split, and salting BEFORE
    the expensive join runs."""
    li = t(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    tot = k.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("n").cast("bigint").alias("total_rows"),
        F.max("n").cast("bigint").alias("max_rows"),
        F.round(F.percentile("n", F.lit(0.5)), 6).alias("p50_rows"),
        F.round(F.percentile("n", F.lit(0.99)), 6).alias("p99_rows"),
    )
    mx = k.agg(F.max("n").alias("mxn"))
    top1 = (
        k.crossJoin(F.broadcast(mx))
        .filter(F.col("n") == F.col("mxn"))
        .agg(F.min("key").cast("bigint").alias("hottest_key"))
    )
    return tot.crossJoin(F.broadcast(top1)).select(
        "n_keys",
        "total_rows",
        "max_rows",
        "p50_rows",
        "p99_rows",
        (F.col("max_rows").cast("double") / F.col("p50_rows")).alias(
            "skew_ratio"
        ),
        (F.col("max_rows").cast("double") / F.col("total_rows")).alias(
            "top1_share"
        ),
        "hottest_key",
    )
