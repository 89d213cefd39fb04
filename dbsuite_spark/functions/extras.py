"""Category H (part 3) — string-similarity, bitwise, and timezone scalar
batteries (extensions beyond the SURVEY §2H 123-key contract).

Reference semantics: DB2 LUW scalar surface parsed by dbsuite [PUBLIC,
module-level; checkout empty — SURVEY §0]. DB2 provides DIFFERENCE/SOUNDEX
and bit-manipulation (BITAND/BITOR/BITXOR, DB2 9.5+) plus timezone-aware
TIMESTAMP WITH TIME ZONE arithmetic (DB2 10.1+); these keys cover the same
ground with Spark built-ins. All JVM-side codegen expressions — no UDFs.

Cross-engine notes:
- ``levenshtein`` is the classic edit distance in both engines → exact match.
  (DuckDB 1.0 has no ``soundex``; Spark-only, so it stays out of the oracle.)
- Bitwise ops: Spark ``&``/``|``/``^``/``shiftleft``; DuckDB ``&``/``|``/
  ``xor()``/``<<``. ``bit_count`` returns TINYINT in DuckDB, INT in Spark —
  both sides cast to INT.
- Timezone: Spark ``to_utc_timestamp(ts, z)`` (interpret naive ts as wall
  time in z → UTC instant) ≡ DuckDB ``timezone(z, ts)`` on a naive
  TIMESTAMP, cast back to naive TIMESTAMP under a UTC session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsuite_spark.registry import query
from dbsuite_spark.tables import t


@query(
    "fn_string_similarity",
    oracle="""
SELECT p_partkey,
       levenshtein(p_brand, 'Brand#13')                    AS lev_brand,
       levenshtein(string_split(p_type, ' ')[1], 'PROMO')  AS lev_type,
       CAST(levenshtein(p_name, p_type) AS INT)            AS lev_name_type
FROM part
""",
    category="H",
)
def fn_string_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance battery (DB2 DIFFERENCE/SOUNDEX-class fuzzy matching):
    LEVENSHTEIN between part attributes and fixed probes. At 100 TB this is
    a per-row codegen expression — no shuffle; for fuzzy *joins* at scale
    pair it with a blocking key (e.g. length band or first-char bucket)
    rather than a cross join."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein(F.col("p_brand"), F.lit("Brand#13")).alias("lev_brand"),
        F.levenshtein(
            F.split(F.col("p_type"), " ").getItem(0), F.lit("PROMO")
        ).alias("lev_type"),
        F.levenshtein(F.col("p_name"), F.col("p_type"))
        .cast("int")
        .alias("lev_name_type"),
    )


@query(
    "fn_bitwise",
    oracle="""
SELECT o_orderkey,
       o_orderkey & 255                     AS band,
       o_orderkey | 4096                    AS bor,
       xor(o_orderkey, 255)                 AS bxor,
       o_orderkey << 2                      AS shl,
       o_orderkey >> 3                      AS shr,
       CAST(bit_count(o_orderkey) AS INT)   AS popcnt
FROM orders
""",
    category="H",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-manipulation battery (DB2 BITAND/BITOR/BITXOR + shifts): AND/OR/
    XOR masks, shifts, popcount over the order key. Pure codegen; the
    classic use at scale is hash-bucket / shard-id derivation without a
    shuffle."""
    o = t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(4096)).alias("bor"),
        k.bitwiseXOR(F.lit(255)).alias("bxor"),
        F.expr("o_orderkey << 2").alias("shl"),
        F.expr("o_orderkey >> 3").alias("shr"),
        F.bit_count(k).alias("popcnt"),
    )


@query(
    "fn_datetime_tz",
    oracle="""
SELECT o_orderkey,
       CAST(timezone('America/New_York', o_orderdate) AS TIMESTAMP)
         AS utc_instant,
       CAST(timezone('Asia/Tokyo',
                     CAST(timezone('America/New_York', o_orderdate)
                          AS TIMESTAMP) AT TIME ZONE 'UTC') AS TIMESTAMP)
         AS tokyo_wall
FROM orders
WHERE o_orderkey % 10 = 0
""",
    category="H",
)
def fn_datetime_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion battery (DB2 10.1 TIMESTAMP WITH TIME ZONE
    analog): interpret the naive order date as New-York wall time → UTC
    instant (``to_utc_timestamp``), then render that instant as Tokyo wall
    time (``from_utc_timestamp``). Session TZ is pinned UTC on both engines
    (SURVEY §7.4.3), so naive-timestamp round-trips are well-defined."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    utc = F.to_utc_timestamp(F.col("o_orderdate"), "America/New_York")
    return o.select(
        "o_orderkey",
        utc.alias("utc_instant"),
        F.from_utc_timestamp(utc, "Asia/Tokyo").alias("tokyo_wall"),
    )


@query(
    "fn_url_parse",
    oracle="""
SELECT c_custkey,
       lower(c_mktsegment) || '.example.com'        AS host,
       '/cust/' || CAST(c_custkey AS VARCHAR)       AS path,
       CAST(c_nationkey AS VARCHAR)                 AS nation_param
FROM customer
""",
    category="H",
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing battery (``parse_url`` HOST/PATH/QUERY): URLs are
    synthesized from customer columns, then each component is parsed back
    out — the oracle reconstructs the components directly, so the check
    proves parse_url inverts the construction. Pure codegen expressions;
    the web-log-parsing staple of training-data pipelines."""
    c = t(spark, sf_dir, "customer")
    url = F.concat(
        F.lit("https://"),
        F.lower("c_mktsegment"),
        F.lit(".example.com/cust/"),
        F.col("c_custkey").cast("string"),
        F.lit("?nation="),
        F.col("c_nationkey").cast("string"),
    )
    return c.select(
        "c_custkey",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("nation")).alias(
            "nation_param"
        ),
    )
