"""Star Schema Benchmark (SSB) adapted to the fixture star (SURVEY §2N2).

SSB (O'Neil, O'Neil & Chen, "The Star Schema Benchmark", 2009 — public
spec) is the classic star-join workload: a denormalized ``lineorder``
fact against date/customer/supplier/part dims, 4 query flights of
increasing dimensionality. It is the canonical stress of exactly the
pattern Spark's Catalyst + AQE optimizes best — selective dim filters,
broadcast hash joins, a single fact shuffle per aggregation.

Fixture adaptations (no ``lineorder``, no date dim, no city columns):
- lineorder ≈ ``lineitem ⋈ orders`` (custkey/orderdate ride on orders);
  flight 1 uses ``l_shipdate`` so it stays the pure scan-filter-agg shape
  the original Q1.x has on the denormalized fact.
- d_year = EXTRACT(year) of the relevant date; the "week" slice of Q1.3
  becomes days 1–7 of a month (no engine-portable week numbering).
- city-level groupings (Q3.2–Q4.3 in the original) step up to nation
  level — the fixture's finest geo grain.
- p_category/p_mfgr → ``p_type``/``p_brand``; SSB profit's supplycost
  (no partsupp table) → ``(l_quantity * p_retailprice) * 0.5`` computed
  per-row in double with identical association on both engines.

Scale notes: region/nation are constant-size (5/25 rows) and explicitly
broadcast; supplier/part/customer are left to the optimizer — they
auto-broadcast at fixture scale but must shuffle-join at 100 TB where
part/customer grow with SF (forcing a broadcast hint there would be the
q18 mistake, see workloads/tpch.py). Every measure is a DSUM
decimal-exact sum (all fixture money columns are 2dp, quantities
integral, so per-row double products are ≤4dp — exactly representable in
DECIMAL(18,6) on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsuite_spark.exact import DSUM, dsum
from dbsuite_spark.registry import query
from dbsuite_spark.tables import t

# (Column builders are functions: constructing a Column needs an active
# SparkContext, which doesn't exist at import/registration time.)


def _disc_rev():
    """SSB Q1.x measure: revenue lost if discounts were dropped."""
    return F.col("l_extendedprice") * F.col("l_discount")


DISC_REV_SQL = "l_extendedprice * l_discount"


def _rev():
    """Flights 2-4 measure: net revenue."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


REV_SQL = "l_extendedprice * (1 - l_discount)"


def _profit():
    """Flight 4 measure: profit (supplycost adapted from retail price)."""
    return _rev() - (F.col("l_quantity") * F.col("p_retailprice")) * 0.5


PROFIT_SQL = f"{REV_SQL} - (l_quantity * p_retailprice) * 0.5"


def _nation_region(spark: SparkSession, sf_dir: str, prefix: str) -> DataFrame:
    """(nationkey, {prefix}_nation, {prefix}_region) — a 25-row broadcast
    dim assembled from nation ⋈ region."""
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("n_nationkey").alias(f"{prefix}_nationkey"),
            F.col("n_name").alias(f"{prefix}_nation"),
            F.col("r_name").alias(f"{prefix}_region"),
        )
    )


_NR_SQL = (
    "SELECT n_nationkey, n_name AS nation, r_name AS region "
    "FROM nation JOIN region ON n_regionkey = r_regionkey"
)


# ---------------------------------------------------------------- flight 1

@query(
    "ssb_q1_1",
    oracle=f"""
SELECT {DSUM(DISC_REV_SQL)} AS revenue
FROM lineitem
WHERE CAST(EXTRACT(year FROM l_shipdate) AS INT) = 1996
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 25
""",
    category="N",
)
def ssb_q1_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q1.1: one-year discount-revenue probe. Pure scan-filter-agg —
    every predicate pushes to the parquet scan, partial+final decimal
    sum, zero joins (the flight-1 shape the spec designed to isolate
    scan selectivity)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.year("l_shipdate") == 1996)
            & F.col("l_discount").between(0.02, 0.04)
            & (F.col("l_quantity") < 25)
        ).agg(dsum(_disc_rev()).alias("revenue"))
    )


@query(
    "ssb_q1_2",
    oracle=f"""
SELECT {DSUM(DISC_REV_SQL)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity BETWEEN 26 AND 35
""",
    category="N",
)
def ssb_q1_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q1.2: one-month slice, tighter discount/quantity bands —
    selectivity drops ~10× vs Q1.1 while the plan shape is unchanged."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & F.col("l_quantity").between(26, 35)
        ).agg(dsum(_disc_rev()).alias("revenue"))
    )


@query(
    "ssb_q1_3",
    oracle=f"""
SELECT {DSUM(DISC_REV_SQL)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-03-08'
  AND l_discount BETWEEN 0.08 AND 0.10
  AND l_quantity BETWEEN 36 AND 40
""",
    category="N",
)
def ssb_q1_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q1.3: one-week slice (days 1–7 — no engine-portable ISO week),
    the narrowest flight-1 probe."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-03-08").cast("timestamp"))
            & F.col("l_discount").between(0.08, 0.10)
            & F.col("l_quantity").between(36, 40)
        ).agg(dsum(_disc_rev()).alias("revenue"))
    )


# ---------------------------------------------------------------- flight 2

def _flight2(
    spark: SparkSession, sf_dir: str, part_pred, s_region: str
) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    p = t(spark, sf_dir, "part").filter(part_pred)
    s = t(spark, sf_dir, "supplier")
    snr = _nation_region(spark, sf_dir, "s").filter(
        F.col("s_region") == s_region
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(snr), s.s_nationkey == snr.s_nationkey)
        .groupBy(F.year("o_orderdate").alias("d_year"), "p_brand")
        .agg(dsum(_rev()).alias("revenue"))
        .select("d_year", "p_brand", "revenue")
    )


def _flight2_sql(part_pred_sql: str, s_region: str) -> str:
    return f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS d_year,
       p_brand, {DSUM(REV_SQL)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN ({_NR_SQL}) sn ON s_nationkey = sn.n_nationkey
WHERE {part_pred_sql} AND sn.region = '{s_region}'
GROUP BY d_year, p_brand
"""


@query(
    "ssb_q2_1",
    oracle=_flight2_sql("p_type = 'STANDARD'", "AMERICA"),
    category="N",
)
def ssb_q2_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q2.1: (year × brand) revenue for one part category
    (p_type adapts p_category) and one supplier region. Star shape:
    constant dims broadcast, one fact shuffle for the group-by."""
    return _flight2(
        spark, sf_dir, F.col("p_type") == "STANDARD", "AMERICA"
    )


_BRANDS_12_18 = [f"Brand#{i}" for i in range(12, 19)]


@query(
    "ssb_q2_2",
    oracle=_flight2_sql(
        "p_brand IN (" + ", ".join(f"'{b}'" for b in _BRANDS_12_18) + ")",
        "ASIA",
    ),
    category="N",
)
def ssb_q2_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q2.2: brand-range slice (IN-list — the fixture's brand keys
    aren't contiguous strings) against one supplier region."""
    return _flight2(
        spark, sf_dir, F.col("p_brand").isin(_BRANDS_12_18), "ASIA"
    )


@query(
    "ssb_q2_3",
    oracle=_flight2_sql("p_brand = 'Brand#9'", "EUROPE"),
    category="N",
)
def ssb_q2_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q2.3: single-brand needle — the most selective flight-2
    probe; the part filter prunes the build side to a handful of keys."""
    return _flight2(spark, sf_dir, F.col("p_brand") == "Brand#9", "EUROPE")


# ---------------------------------------------------------------- flight 3

def _flight3(
    spark: SparkSession, sf_dir: str,
    c_pred, s_pred, date_pred, group_cols: list[str],
) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(date_pred)
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    cnr = _nation_region(spark, sf_dir, "c").filter(c_pred)
    snr = _nation_region(spark, sf_dir, "s").filter(s_pred)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cnr), c.c_nationkey == cnr.c_nationkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(snr), s.s_nationkey == snr.s_nationkey)
        .groupBy(
            *group_cols, F.year("o_orderdate").alias("d_year")
        )
        .agg(dsum(_rev()).alias("revenue"))
    )


def _flight3_sql(where: str, select: str, group: str) -> str:
    # DuckDB resolves output aliases in GROUP BY, so `group` lists the
    # alias names that `select` defines (plus d_year).
    return f"""
SELECT {select}{', ' if select else ''}CAST(EXTRACT(year FROM o_orderdate) AS INT) AS d_year,
       {DSUM(REV_SQL)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN ({_NR_SQL}) cn ON c_nationkey = cn.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN ({_NR_SQL}) sn ON s_nationkey = sn.n_nationkey
WHERE {where}
GROUP BY {group}{', ' if group else ''}d_year
"""


@query(
    "ssb_q3_1",
    oracle=_flight3_sql(
        "cn.region = 'ASIA' AND sn.region = 'ASIA' "
        "AND EXTRACT(year FROM o_orderdate) BETWEEN 1995 AND 1997",
        "cn.nation AS c_nation, sn.nation AS s_nation",
        "c_nation, s_nation",
    ),
    category="N",
)
def ssb_q3_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q3.1: intra-ASIA trade lanes by (customer nation × supplier
    nation × year) over a 3-year window — the widest flight-3 rollup."""
    return _flight3(
        spark, sf_dir,
        F.col("c_region") == "ASIA",
        F.col("s_region") == "ASIA",
        F.year("o_orderdate").between(1995, 1997),
        ["c_nation", "s_nation"],
    ).select("c_nation", "s_nation", "d_year", "revenue")


@query(
    "ssb_q3_2",
    oracle=_flight3_sql(
        "cn.nation = 'NATION_7' AND sn.region = 'EUROPE' "
        "AND EXTRACT(year FROM o_orderdate) BETWEEN 1995 AND 1997",
        "sn.nation AS s_nation",
        "s_nation",
    ),
    category="N",
)
def ssb_q3_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q3.2 (nation-grain adaptation): one buying nation against
    every European supplier nation, by year."""
    return _flight3(
        spark, sf_dir,
        F.col("c_nation") == "NATION_7",
        F.col("s_region") == "EUROPE",
        F.year("o_orderdate").between(1995, 1997),
        ["s_nation"],
    ).select("s_nation", "d_year", "revenue")


@query(
    "ssb_q3_3",
    oracle=_flight3_sql(
        "cn.nation = 'NATION_7' AND sn.nation = 'NATION_12'", "", ""
    ),
    category="N",
)
def ssb_q3_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q3.3 (nation-grain): one specific trade lane across all
    years — both geo dims collapse to single keys."""
    return _flight3(
        spark, sf_dir,
        F.col("c_nation") == "NATION_7",
        F.col("s_nation") == "NATION_12",
        F.lit(True),
        [],
    ).select("d_year", "revenue")


@query(
    "ssb_q3_4",
    oracle=_flight3_sql(
        "cn.nation = 'NATION_7' AND sn.nation = 'NATION_12' "
        "AND o_orderdate >= TIMESTAMP '1997-12-01' "
        "AND o_orderdate < TIMESTAMP '1998-01-01'",
        "", "",
    ),
    category="N",
)
def ssb_q3_4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q3.4: the same lane in a single month — the drill-down
    endpoint of the flight (most selective date predicate)."""
    return _flight3(
        spark, sf_dir,
        F.col("c_nation") == "NATION_7",
        F.col("s_nation") == "NATION_12",
        (F.col("o_orderdate") >= F.lit("1997-12-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")),
        [],
    ).select("d_year", "revenue")


# ---------------------------------------------------------------- flight 4

def _flight4(
    spark: SparkSession, sf_dir: str,
    c_pred, s_pred, p_pred, date_pred, group_cols: list[str],
) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(date_pred)
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    p = t(spark, sf_dir, "part").filter(p_pred)
    cnr = _nation_region(spark, sf_dir, "c").filter(c_pred)
    snr = _nation_region(spark, sf_dir, "s").filter(s_pred)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cnr), c.c_nationkey == cnr.c_nationkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(snr), s.s_nationkey == snr.s_nationkey)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.year("o_orderdate").alias("d_year"), *group_cols)
        .agg(dsum(_profit()).alias("profit"))
        .select("d_year", *group_cols, "profit")
    )


def _flight4_sql(where: str, select: str, group: str) -> str:
    # As in _flight3_sql, `group` lists the output aliases of `select`.
    return f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS d_year,
       {select}{', ' if select else ''}{DSUM(PROFIT_SQL)} AS profit
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN ({_NR_SQL}) cn ON c_nationkey = cn.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN ({_NR_SQL}) sn ON s_nationkey = sn.n_nationkey
JOIN part ON l_partkey = p_partkey
WHERE {where}
GROUP BY d_year{', ' if group else ''}{group}
"""


@query(
    "ssb_q4_1",
    oracle=_flight4_sql(
        "cn.region = 'AMERICA' AND sn.region = 'AMERICA' "
        "AND p_type IN ('ECONOMY', 'PROMO')",
        "cn.nation AS c_nation",
        "c_nation",
    ),
    category="N",
)
def ssb_q4_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q4.1: profit by (year × customer nation) for intra-America
    trade in two part categories — the full 4-dim star (customer,
    supplier, part, date) in one plan, profit = revenue − adapted
    supply cost."""
    return _flight4(
        spark, sf_dir,
        F.col("c_region") == "AMERICA",
        F.col("s_region") == "AMERICA",
        F.col("p_type").isin("ECONOMY", "PROMO"),
        F.lit(True),
        ["c_nation"],
    )


@query(
    "ssb_q4_2",
    oracle=_flight4_sql(
        "cn.region = 'AMERICA' AND sn.region = 'AMERICA' "
        "AND p_type IN ('ECONOMY', 'PROMO') "
        "AND EXTRACT(year FROM o_orderdate) IN (1997, 1998)",
        "sn.nation AS s_nation, p_type",
        "s_nation, p_type",
    ),
    category="N",
)
def ssb_q4_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q4.2: drill to (year × supplier nation × part type) over two
    years — same star, one more group dimension, tighter date slice."""
    return _flight4(
        spark, sf_dir,
        F.col("c_region") == "AMERICA",
        F.col("s_region") == "AMERICA",
        F.col("p_type").isin("ECONOMY", "PROMO"),
        F.year("o_orderdate").isin(1997, 1998),
        ["s_nation", "p_type"],
    )


@query(
    "ssb_q4_3",
    oracle=_flight4_sql(
        "sn.nation = 'NATION_3' AND p_type = 'ECONOMY' "
        "AND EXTRACT(year FROM o_orderdate) IN (1997, 1998)",
        "p_brand",
        "p_brand",
    ),
    category="N",
)
def ssb_q4_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q4.3: the flight's endpoint — one supplier nation, one part
    category, profit by (year × brand)."""
    return _flight4(
        spark, sf_dir,
        F.lit(True),
        F.col("s_nation") == "NATION_3",
        F.col("p_type") == "ECONOMY",
        F.year("o_orderdate").isin(1997, 1998),
        ["p_brand"],
    )
