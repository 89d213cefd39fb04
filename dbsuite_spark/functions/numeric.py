"""Category H (part 2) — math, decimal, null-handling, conditional, hash
batteries (SURVEY §2H).

Reference semantics: DB2 LUW numeric/conditional scalar functions parsed by
dbsuite [PUBLIC, module-level; checkout empty — SURVEY §0]. All JVM-side
codegen expressions.

Cross-engine determinism (SURVEY §7.4.1–.2):
- ROUND: comparisons go through DECIMAL casts or post-rounding to 6 dp;
  Spark HALF_UP and DuckDB round() agree away-from-zero on these domains.
- exp/ln/log10 may differ in the last ulp between libm implementations →
  results are rounded to 6 dp on BOTH sides before hashing.
- Spark ceil/floor/sign return BIGINT/DOUBLE; DuckDB returns DOUBLE/INT —
  both sides cast explicitly to BIGINT / INT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsuite_spark.registry import query
from dbsuite_spark.tables import t


@query(
    "fn_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_quantity - 25.0)                                    AS ab,
       CAST(round(CAST(l_extendedprice AS DECIMAL(18,6)), 2) AS DOUBLE)
                                                                 AS rd,
       CAST(ceil(l_discount * 100) AS BIGINT)                    AS ce,
       CAST(floor(l_tax * 100) AS BIGINT)                        AS fl,
       l_orderkey % 7                                            AS md,
       power(l_quantity, 2)                                      AS pw,
       sqrt(l_quantity)                                          AS sq,
       round(exp(l_discount), 6)                                 AS ex,
       round(ln(l_extendedprice), 6)                             AS lg,
       round(log10(l_extendedprice), 6)                          AS l10,
       CAST(sign(l_discount - 0.05) AS INT)                      AS sg,
       greatest(l_quantity, l_discount * 100, 10.0)              AS gr,
       least(l_quantity, l_tax * 100, 10.0)                      AS ls,
       CAST(least(greatest(floor(l_quantity / 5) + 1, 0), 11) AS BIGINT)
                                                                 AS qty_bucket
FROM lineitem
""",
    category="H",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABS/ROUND/CEIL/FLOOR/MOD/POWER/SQRT/EXP/LN/LOG10/SIGN/GREATEST/LEAST
    + WIDTH_BUCKET(qty, 0, 55, 11). DuckDB 1.0 lacks width_bucket — the
    oracle uses the equivalent clamped-floor formula."""
    li = t(spark, sf_dir, "lineitem")
    q, d, tax, price = (
        F.col("l_quantity"),
        F.col("l_discount"),
        F.col("l_tax"),
        F.col("l_extendedprice"),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(q - 25.0).alias("ab"),
        F.round(price.cast("decimal(18,6)"), 2).cast("double").alias("rd"),
        F.ceil(d * 100).cast("bigint").alias("ce"),
        F.floor(tax * 100).cast("bigint").alias("fl"),
        (F.col("l_orderkey") % 7).alias("md"),
        F.power(q, 2).alias("pw"),
        F.sqrt(q).alias("sq"),
        F.round(F.exp(d), 6).alias("ex"),
        F.round(F.log(price), 6).alias("lg"),
        F.round(F.log10(price), 6).alias("l10"),
        F.signum(d - 0.05).cast("int").alias("sg"),
        F.greatest(q, d * 100, F.lit(10.0)).alias("gr"),
        F.least(q, tax * 100, F.lit(10.0)).alias("ls"),
        F.expr("width_bucket(l_quantity, 0, 55, 11)").alias("qty_bucket"),
    )


@query(
    "fn_decimal_arith",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS gross,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS net,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
""",
    category="H",
)
def fn_decimal_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL money arithmetic + SUM (DB2's core money type).
    Decimal partial sums commute, so map-side combine stays exact at any
    partitioning/scale. Sums run at DECIMAL(18,6) (the exact.py discipline —
    at (12,2) the engines round half-cent ties of doubles differently); the
    2dp×2dp product is carried at DECIMAL(18,4), exactly representable.
    Final columns are cast to DOUBLE: Decimal objects in a final projection
    render engine-specifically and break the driver's value hash."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("gross"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        )
        .cast("double")
        .alias("net"),
        F.count("*").alias("n"),
    )


@query(
    "fn_null_handling",
    oracle="""
SELECT o_orderkey,
       nullif(o_orderstatus, 'P')                         AS status_np,
       coalesce(nullif(o_orderstatus, 'P'), 'PENDING')    AS status_filled,
       ifnull(nullif(o_orderpriority, '5-LOW'), 'LOW')    AS prio_filled,
       (nullif(o_orderstatus, 'P') = 'F')                 AS is_f_3vl,
       coalesce(NULL, NULL, o_totalprice)                 AS first_price
FROM orders
""",
    category="H",
)
def fn_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COALESCE / NULLIF / IFNULL(NVL) + three-valued logic: the ``= 'F'``
    comparison stays NULL (not false) for nulled-out rows on both engines."""
    o = t(spark, sf_dir, "orders")
    status_np = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        status_np.alias("status_np"),
        F.coalesce(status_np, F.lit("PENDING")).alias("status_filled"),
        F.ifnull(
            F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")), F.lit("LOW")
        ).alias("prio_filled"),
        (status_np == "F").alias("is_f_3vl"),
        F.coalesce(F.lit(None), F.lit(None), F.col("o_totalprice")).alias(
            "first_price"
        ),
    )


@query(
    "fn_conditional",
    oracle="""
SELECT o_orderkey,
       CASE o_orderstatus WHEN 'F' THEN 'done'
                          WHEN 'O' THEN 'open' ELSE 'other' END AS simple_case,
       if(o_totalprice > 200000, 'big', 'small')                AS size_tag,
       greatest(nullif(o_totalprice, 0), 100000.0)              AS floor_price,
       least(coalesce(nullif(o_orderstatus, 'P'), 'A'), 'N')    AS min_tag
FROM orders
""",
    category="H",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple CASE (value-match form), IF, GREATEST/LEAST over nullable
    operands (both engines skip NULLs rather than propagate — probed)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "done")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("simple_case"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .otherwise("small")
        .alias("size_tag"),
        F.greatest(
            F.nullif(F.col("o_totalprice"), F.lit(0)), F.lit(100000.0)
        ).alias("floor_price"),
        F.least(
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("A")),
            F.lit("N"),
        ).alias("min_tag"),
    )


@query(
    "fn_hash_funcs",
    oracle="""
SELECT doc_id,
       md5(text)    AS h_md5,
       sha256(text) AS h_sha256
FROM documents
""",
    category="H",
)
def fn_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hashing for dedup keys: MD5 + SHA2-256 (the cross-engine
    pair; DuckDB 1.0 has no crc32/xxhash64 — those are exercised as
    Spark-native determinism checks in tests/test_functions.py and used by
    the category-L dedup keys)."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
    )


@query(
    "fn_try_arithmetic",
    oracle="""
SELECT o_orderkey,
       o_totalprice / NULLIF(o_custkey % 5, 0) AS safe_ratio,
       TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
       TRY_CAST(o_orderstatus AS INTEGER) AS status_num,
       CAST(NULL AS BIGINT) AS overflow_add,
       string_split(o_orderpriority, '-')[5] AS missing_tok
FROM orders
""",
    category="H",
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe error-handling battery — the TRY_* family that returns
    NULL instead of failing the job (division by zero, bad casts, bigint
    overflow, out-of-range element access). At 100 TB this is the
    difference between one poison row killing a 6-hour job and a NULL you
    can audit afterwards. Oracle mirrors each case with DuckDB's native
    NULL-on-error forms (NULLIF guard, TRY_CAST, out-of-range list index;
    the bigint overflow probe is provably NULL for every fixture row)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.try_divide(
            F.col("o_totalprice"), F.col("o_custkey") % 5
        ).alias("safe_ratio"),
        F.expr(
            "try_cast(substr(o_orderpriority, 1, 1) AS INT)"
        ).alias("prio_num"),
        F.expr("try_cast(o_orderstatus AS INT)").alias("status_num"),
        F.try_add(
            F.lit(9223372036854775807).cast("long"),
            F.col("o_orderkey") + 1,  # keys are >= 0 → always overflows
        ).alias("overflow_add"),
        F.try_element_at(
            F.split("o_orderpriority", "-"), F.lit(5)
        ).alias("missing_tok"),
    )
