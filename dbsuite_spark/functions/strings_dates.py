"""Category H (part 1) — string and date/time scalar batteries (SURVEY §2H).

Reference semantics: the DB2 LUW scalar-function surface dbsuite's parser
covers (SUBSTR/TRIM/TRANSLATE/..., labeled-duration date arithmetic)
[PUBLIC, module-level; reference checkout empty — SURVEY §0]. All built-in
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen, zero Python in
the hot path, so these cost the same per-row at sf0.001 and at 100 TB.

Cross-engine notes (each verified against DuckDB 1.0.0 this session):
- DuckDB has no ``initcap`` — the oracle emulates per-word capitalization
  with ``list_transform`` over ``string_split``.
- Spark ``dayofweek`` is 1=Sunday..7; DuckDB ``dayofweek`` is 0=Sunday..6
  → oracle adds 1.
- Spark ``length``/``instr``/``size`` return INT; DuckDB returns BIGINT —
  Spark side casts to BIGINT so schemas line up.
- ``add_months`` clamps month ends; DuckDB ``+ INTERVAL n MONTH`` clamps
  identically (1997-03-31 + 1 month = 1997-04-30, probed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsuite_spark.registry import query
from dbsuite_spark.tables import t


@query(
    "fn_string_core",
    oracle="""
SELECT p_partkey,
       upper(p_type)                                   AS up,
       lower(p_brand)                                  AS lo,
       CAST(length(p_name) AS BIGINT)                  AS name_len,
       substr(p_name, 3, 5)                            AS sub,
       trim('  ' || p_brand || '  ')                   AS trimmed,
       p_brand || ':' || p_type                        AS joined,
       replace(p_type, ' ', '_')                       AS underscored,
       lpad(CAST(p_size AS VARCHAR), 6, '0')           AS size_pad,
       rpad(left(p_brand, 5), 8, '*')                  AS brand_pad,
       left(p_name, 4)                                 AS head4,
       right(p_name, 3)                                AS tail3,
       CAST(instr(p_name, 'a') AS BIGINT)              AS pos_a,
       array_to_string(
         list_transform(string_split(lower(p_type), ' '),
                        w -> upper(left(w, 1)) || substr(w, 2)), ' ')
                                                       AS type_title,
       repeat(left(p_brand, 2), 2)                     AS rep2,
       reverse(p_type)                                 AS rev,
       translate(p_type, 'AEO', 'aeo')                 AS transl
FROM part
""",
    category="H",
)
def fn_string_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUBSTR/UPPER/LOWER/LENGTH/TRIM/CONCAT/REPLACE/LPAD/RPAD/LEFT/RIGHT/
    INSTR/INITCAP/REPEAT/REVERSE/TRANSLATE over ``part`` — one row per input
    row, pure codegen projection."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_type").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_name", 3, 5).alias("sub"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias(
            "trimmed"
        ),
        F.concat_ws(":", "p_brand", "p_type").alias("joined"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias(
            "underscored"
        ),
        F.lpad(F.col("p_size").cast("string"), 6, "0").alias("size_pad"),
        F.rpad(F.expr("left(p_brand, 5)"), 8, "*").alias("brand_pad"),
        F.expr("left(p_name, 4)").alias("head4"),
        F.expr("right(p_name, 3)").alias("tail3"),
        F.instr("p_name", "a").cast("bigint").alias("pos_a"),
        F.initcap(F.lower("p_type")).alias("type_title"),
        F.repeat(F.expr("left(p_brand, 2)"), 2).alias("rep2"),
        F.reverse("p_type").alias("rev"),
        F.translate("p_type", "AEO", "aeo").alias("transl"),
    )


@query(
    "fn_string_regex_split",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_brand, 'Brand#(\\d+)', 1)      AS brand_num,
       regexp_replace(p_type, '[aeiou]', '', 'g')      AS no_vowels,
       array_to_string(string_split(p_type, ' '), '|') AS toks,
       string_split(p_type, ' ')[1]                    AS tok1,
       CAST(len(string_split(p_type, ' ')) AS BIGINT)  AS n_toks
FROM part
""",
    category="H",
)
def fn_string_regex_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REGEXP_EXTRACT / REGEXP_REPLACE / SPLIT. NB Spark regexp_replace is
    global by default; DuckDB needs the 'g' flag (probed). The split array
    is serialized with '|' in the final select — raw array columns crash
    the driver's pandas canonicalizer (round-1 red key)."""
    p = t(spark, sf_dir, "part")
    toks = F.split(F.col("p_type"), " ")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num"),
        F.regexp_replace("p_type", "[aeiou]", "").alias("no_vowels"),
        F.array_join(toks, "|").alias("toks"),
        F.element_at(toks, 1).alias("tok1"),
        F.size(toks).cast("bigint").alias("n_toks"),
    )


@query(
    "fn_date_extract",
    oracle="""
SELECT event_id,
       CAST(year(ts) AS INT)            AS y,
       CAST(month(ts) AS INT)           AS mo,
       CAST(day(ts) AS INT)             AS d,
       CAST(quarter(ts) AS INT)         AS q,
       CAST(weekofyear(ts) AS INT)      AS wk,
       CAST(dayofweek(ts) + 1 AS INT)   AS dow,
       CAST(dayofyear(ts) AS INT)       AS doy,
       CAST(hour(ts) AS INT)            AS hh,
       CAST(minute(ts) AS INT)          AS mi,
       CAST(second(ts) AS INT)          AS ss
FROM events
""",
    category="H",
)
def fn_date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YEAR/MONTH/DAY/QUARTER/WEEK/DAYOFWEEK/DAYOFYEAR/HOUR/MINUTE/SECOND.
    Session TZ is pinned UTC on both engines (SURVEY §7.4.3); Spark
    dayofweek is 1=Sunday, DuckDB 0=Sunday (oracle aligns)."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.quarter("ts").alias("q"),
        F.weekofyear("ts").alias("wk"),
        F.dayofweek("ts").alias("dow"),
        F.dayofyear("ts").alias("doy"),
        F.hour("ts").alias("hh"),
        F.minute("ts").alias("mi"),
        F.second("ts").alias("ss"),
    )


@query(
    "fn_date_arith",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate + INTERVAL 30 DAY AS DATE)                 AS plus30d,
       CAST(o_orderdate + INTERVAL 2 MONTH AS DATE)                AS plus2mo,
       CAST(date_diff('day', o_orderdate, DATE '2002-01-01') AS INT)
                                                                   AS days_to_2002,
       last_day(o_orderdate)                                       AS month_end,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)         AS month_start,
       CAST((year(DATE '2002-01-01') - year(o_orderdate)) * 12
            + (1 - month(o_orderdate)) AS INT)                     AS whole_months,
       strftime(o_orderdate, '%Y-%m-%d %H:%M')                     AS fmt
FROM orders
""",
    category="H",
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date ± interval, ADD_MONTHS (month-end clamped both engines),
    DATEDIFF, LAST_DAY, TRUNC(month), DATE_FORMAT. Whole-month difference is
    computed arithmetically on both sides because Spark months_between and
    DuckDB date_diff('month') disagree on fractional semantics."""
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_add(d, 30).alias("plus30d"),
        F.add_months(d, 2).alias("plus2mo"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).alias(
            "days_to_2002"
        ),
        F.last_day(d).alias("month_end"),
        F.date_trunc("month", d).alias("month_start"),
        ((F.lit(2002) - F.year(d)) * 12 + (F.lit(1) - F.month(d))).alias(
            "whole_months"
        ),
        F.date_format(d, "yyyy-MM-dd HH:mm").alias("fmt"),
    )


@query(
    "fn_collation_ci",
    oracle="""
WITH mixed AS (
  SELECT CASE WHEN o_orderkey % 2 = 0 THEN lower(o_orderpriority)
              ELSE upper(o_orderpriority) END AS prio_mixed,
         o_totalprice
  FROM orders)
SELECT upper(prio_mixed) AS prio,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
FROM mixed GROUP BY upper(prio_mixed)
""",
    category="H",
)
def fn_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collation support (DB2's collating-sequence semantics): a
    deliberately case-mangled priority column is grouped under the
    ``UTF8_LCASE`` collation — the engine-level case-insensitive
    comparison, not an ``upper()`` rewrite (collations also drive joins,
    ORDER BY, and DISTINCT, and at 100 TB a collated comparison avoids
    materializing a normalized shadow column). The oracle normalizes
    with upper(), equivalent on this ASCII domain; the output key is
    re-canonicalized so the projection stays collation-free and
    hash-safe.

    Scale: one partial+final hash aggregation; the collated key hashes
    case-folded, so the shuffle distributes exactly like the normalized
    rewrite."""
    o = t(spark, sf_dir, "orders")
    mixed = o.select(
        F.when(
            F.col("o_orderkey") % 2 == 0, F.lower("o_orderpriority")
        )
        .otherwise(F.upper("o_orderpriority"))
        .alias("prio_mixed"),
        "o_totalprice",
    )
    return (
        mixed.groupBy(
            F.collate(F.col("prio_mixed"), "UTF8_LCASE").alias("k")
        )
        .agg(
            F.upper(F.max("prio_mixed")).alias("prio"),
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("total"),
        )
        .select("prio", "n", "total")
    )


# --- interval / calendar arithmetic battery (round 5) ------------------

@query(
    "fn_interval_arith",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS d,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus_30d,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus_2m,
       CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
            AS INT) AS days_since_95,
       CAST(quarter(o_orderdate) AS INT) AS qtr
FROM orders
""",
    category="H",
)
def fn_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval arithmetic battery: day offsets, month offsets
    (both engines clamp month-end: Jan 31 + 1 month = Feb 28/29),
    month truncation, last_day, day-difference from an epoch, quarter —
    the date-dimension derivations every warehouse load performs.
    Row-local codegen expressions; zero shuffle."""
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.alias("d"),
        F.date_add(d, 30).alias("plus_30d"),
        F.add_months(d, 2).alias("plus_2m"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.datediff(d, F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_95"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
    )


@query(
    "fn_string_pad_translate",
    oracle="""
SELECT c_custkey,
       lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded_key,
       rpad(c_mktsegment, 12, '.') AS padded_seg,
       translate(c_name, '#_', '-:') AS translated,
       repeat('=', CAST(c_custkey % 5 AS INT)) AS bar,
       reverse(c_mktsegment) AS rev_seg,
       CAST(ascii(c_mktsegment) AS INT) AS first_code,
       chr(CAST(65 + c_custkey % 26 AS INT)) AS bucket_letter
FROM customer
""",
    category="H",
)
def fn_string_pad_translate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Formatting-string battery: zero-padded fixed-width keys (lpad),
    dot-fill alignment (rpad), character-map translate, repeat, reverse,
    ascii/chr round-trip — the report/export formatting helpers of the
    reference's string library. Pure codegen row-local expressions."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias(
            "padded_key"
        ),
        F.rpad("c_mktsegment", 12, ".").alias("padded_seg"),
        F.translate("c_name", "#_", "-:").alias("translated"),
        F.repeat(F.lit("="), (F.col("c_custkey") % 5).cast("int")).alias(
            "bar"
        ),
        F.reverse("c_mktsegment").alias("rev_seg"),
        F.ascii("c_mktsegment").cast("int").alias("first_code"),
        F.chr((F.lit(65) + F.col("c_custkey") % 26).cast("int")).alias(
            "bucket_letter"
        ),
    )


@query(
    "fn_regexp_extract_all",
    oracle=r"""
SELECT event_id,
       array_to_string(regexp_extract_all(props, '\d+'), ',') AS nums,
       CAST(len(regexp_extract_all(props, '\d+')) AS INT) AS n_nums
FROM events
""",
    category="H",
)
def fn_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``regexp_extract_all`` — every match in match order (both engines
    scan left-to-right, so the positional list is deterministic), plus
    the match count. The battery row for bulk pattern harvesting (IDs
    from logs, numbers from semi-structured text). The list is emitted
    comma-joined: raw arrays crash the driver's canonicalizer (round-1
    lesson). Pure row-local regex — codegen, zero shuffle."""
    nums = F.regexp_extract_all(F.col("props"), F.lit(r"\d+"), F.lit(0))
    return t(spark, sf_dir, "events").select(
        "event_id",
        F.array_join(nums, ",").alias("nums"),
        F.size(nums).cast("int").alias("n_nums"),
    )
