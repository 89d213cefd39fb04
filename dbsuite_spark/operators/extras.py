"""Categories D/E extensions beyond the 123-key contract — ordered-argument
aggregates, boolean aggregates, NTH_VALUE, and mergeable HLL sketches.

Reference semantics: DB2 OLAP/column-function surface parsed by dbsuite
[PUBLIC, module-level; checkout empty — SURVEY §0]. Determinism discipline:
every ordered-argument aggregate orders by a UNIQUE key (o_orderkey) so
ties cannot produce engine-dependent answers (SURVEY §7.4.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbsuite_spark.exact import DSUM, dsum
from dbsuite_spark.registry import query
from dbsuite_spark.tables import t


@query(
    "agg_min_max_by",
    oracle="""
SELECT o_custkey,
       arg_min(o_orderpriority, o_orderkey) AS first_priority,
       arg_max(o_orderpriority, o_orderkey) AS last_priority,
       arg_min(o_totalprice, o_orderkey)    AS first_price,
       arg_max(o_totalprice, o_orderkey)    AS last_price
FROM orders GROUP BY o_custkey
""",
    category="D",
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN_BY/MAX_BY (DuckDB arg_min/arg_max): per customer, the attributes
    of their lowest- and highest-keyed order. The ordering argument
    (o_orderkey) is unique → deterministic across engines and partitionings;
    partial+final aggregation commutes, so it scales like any hash agg."""
    o = t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.groupBy("o_custkey").agg(
        F.min_by(F.col("o_orderpriority"), k).alias("first_priority"),
        F.max_by(F.col("o_orderpriority"), k).alias("last_priority"),
        F.min_by(F.col("o_totalprice"), k).alias("first_price"),
        F.max_by(F.col("o_totalprice"), k).alias("last_price"),
    )


@query(
    "agg_bool_and_or",
    oracle="""
SELECT o_custkey,
       bool_and(o_totalprice > 50000)    AS all_big,
       bool_or(o_orderstatus = 'F')      AS any_filled,
       bool_and(o_orderpriority <> '5-LOW') AS never_low
FROM orders GROUP BY o_custkey
""",
    category="D",
)
def agg_bool_and_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOOL_AND / BOOL_OR (DB2 EVERY/ANY analog): per-customer predicates
    folded with three-valued logic. Commutative/associative → map-side
    partials at scale."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.bool_and(F.col("o_totalprice") > 50000).alias("all_big"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_filled"),
        F.bool_and(F.col("o_orderpriority") != "5-LOW").alias("never_low"),
    )


@query(
    "win_nth_value",
    oracle="""
SELECT o_orderkey, o_custkey,
       nth_value(o_totalprice, 2) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS second_price,
       nth_value(o_orderpriority, 3) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS third_priority
FROM orders
""",
    category="E",
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTH_VALUE over the full partition frame (DB2 OLAP spec): the 2nd
    price / 3rd priority of each customer's order history, NULL where the
    partition is shorter. Tie-broken by unique o_orderkey (SURVEY §7.4.4)."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.nth_value(F.col("o_totalprice"), 2).over(w).alias("second_price"),
        F.nth_value(F.col("o_orderpriority"), 3).over(w).alias("third_priority"),
    )


@query(
    "agg_hll_sketch_merge",
    oracle="""
SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS exact_total,
       CAST(COUNT(DISTINCT c_nationkey) AS INT) AS n_sketches,
       TRUE AS approx_within_3rsd
FROM customer
""",
    category="D",
)
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HyperLogLog sketches (Apache DataSketches via Spark 3.5+
    ``hll_sketch_agg``/``hll_union_agg``): build one customer-key sketch per
    nation, then union the 25 nation sketches into a global distinct-count
    estimate — the canonical two-level pattern for 100 TB (per-partition
    sketches merge associatively; only tiny sketch bytes cross the shuffle,
    never raw keys, and sketches can be persisted for incremental rollup).

    The estimate is engine-specific, so the hashed projection carries its
    *verdict* (VERDICT r02 ask #5): lgConfigK=14 → rsd ≈ 1.04/√2^14 ≈
    0.81%, and ``approx_within_3rsd`` asserts the merged estimate lands
    within 3·rsd (±2.4%) of the exact global distinct (custkeys are
    globally unique, so the per-nation exacts sum to it). The sketch is
    deterministic for a given dataset, so the boolean is stable and the
    oracle's TRUE makes bound violations fail the hash gate."""
    c = t(spark, sf_dir, "customer")
    per_nation = c.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey", 14).alias("sk"),
        F.countDistinct("c_custkey").alias("exact_nation"),
    )
    g = per_nation.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx"),
        F.sum("exact_nation").alias("exact_total"),
        F.count("*").cast("int").alias("n_sketches"),
    )
    rsd = 1.04 / (2 ** 7)  # 1.04 / sqrt(2^14)
    return g.select(
        F.col("exact_total").cast("bigint").alias("exact_total"),
        "n_sketches",
        (
            F.abs(F.col("approx") - F.col("exact_total"))
            <= 3 * rsd * F.col("exact_total")
        ).alias("approx_within_3rsd"),
    )


@query(
    "unpivot_melt",
    oracle="""
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
""",
    category="D",
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (inverse of pivot_values): three measure columns →
    (measure, val) rows. Spark's ``unpivot`` is a narrow expand — no
    shuffle, 3× row multiplication done streaming per partition. The
    oracle is the portable UNION ALL formulation."""
    li = t(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "measure",
        "val",
    )


@query(
    "join_lateral",
    oracle="""
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
""",
    category="C",
)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated-subquery join (DB2 TABLE()/LATERAL dialect): each
    customer's top-2 orders by price, tie-broken by unique key. Catalyst
    decorrelates this into a window top-k over one shuffled join — same
    physical shape as win_topk_per_group, no per-row re-execution, so it
    scales like any windowed agg."""
    from dbsuite_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        """
    )


@query(
    "win_ignore_nulls",
    oracle="""
SELECT o_orderkey, o_custkey,
       first_value(filled_price IGNORE NULLS) OVER w AS first_filled,
       last_value(filled_price IGNORE NULLS) OVER w  AS last_filled,
       lag(filled_price IGNORE NULLS) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         AS prev_filled
FROM (SELECT *, CASE WHEN o_orderstatus = 'O' THEN NULL
                     ELSE o_totalprice END AS filled_price
      FROM orders)
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    category="E",
)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window semantics (DB2 OLAP spec option): the price of
    each customer's first/last/previous *filled* (non-open) order, skipping
    NULL rows — the gap-filling idiom for sparse time-series. Spark puts
    IGNORE NULLS after the call, DuckDB inside it; semantics match.
    Tie-broken by unique o_orderkey (SURVEY §7.4.4)."""
    from dbsuite_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               first_value(filled_price) IGNORE NULLS OVER w AS first_filled,
               last_value(filled_price) IGNORE NULLS OVER w  AS last_filled,
               lag(filled_price) IGNORE NULLS OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                 AS prev_filled
        FROM (SELECT *, CASE WHEN o_orderstatus = 'O' THEN NULL
                             ELSE o_totalprice END AS filled_price
              FROM orders)
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
        """
    )


@query(
    "agg_mode_deterministic",
    oracle="""
SELECT o_custkey, o_orderpriority AS modal_priority,
       CAST(n AS BIGINT) AS n
FROM (
  SELECT o_custkey, o_orderpriority, COUNT(*) AS n,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
  FROM orders GROUP BY o_custkey, o_orderpriority)
WHERE rn = 1
""",
    category="D",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE: each customer's most frequent order priority,
    ties broken by priority string — unlike the built-in ``mode()`` (both
    engines pick an arbitrary tied value), this count+row_number rewrite is
    engine-stable, which is what makes it oracle-checkable. Two hash aggs +
    one window on the same key → two shuffles, both on o_custkey."""
    o = t(spark, sf_dir, "orders")
    counts = o.groupBy("o_custkey", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderpriority").alias("modal_priority"),
            "n",
        )
    )


@query(
    "win_ratio_to_report",
    oracle="""
SELECT o_orderkey, o_custkey,
       o_totalprice /
       (SUM(CAST(o_totalprice AS DECIMAL(18,6)))
          OVER (PARTITION BY o_custkey))::DOUBLE AS spend_share
FROM orders
""",
    category="E",
)
def win_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RATIO_TO_REPORT (DB2 OLAP spec): each order's share of its
    customer's total spend. The window denominator is a decimal-exact sum
    (order-free partials, SURVEY §7.4.1) cast to double before one double
    division — bit-identical on both engines, no tolerance needed."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    denom = F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w)
    return o.select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") / denom.cast("double")).alias("spend_share"),
    )


@query(
    "agg_regr",
    oracle="""
SELECT l_returnflag,
       ROUND(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 3) AS intercept,
       ROUND(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
""",
    category="D",
)
def agg_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (DB2 REGR_* OLAP functions): slope /
    intercept / R² of extendedprice on quantity per return flag. Rounded on
    both sides — streaming-moment implementations agree to ~1e-12 relative,
    far inside the rounding (same treatment as agg_stats). Single
    partial+final hash agg; at 100 TB the moments commute across
    partitions like any covariance."""
    li = t(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 3).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).alias("n"),
    )


# log10(1 + 1/d) for d = 1..9, precomputed once and inlined as identical
# 10-dp literals on both engines (libm log10 is not correctly rounded, so
# neither side computes it at query time)
BENFORD_P = {
    1: 0.3010299957, 2: 0.1760912591, 3: 0.1249387366,
    4: 0.0969100130, 5: 0.0791812460, 6: 0.0669467896,
    7: 0.0579919470, 8: 0.0511525224, 9: 0.0457574906,
}

_BENFORD_CASE = "CASE first_digit " + " ".join(
    f"WHEN {d} THEN CAST({p!r} AS DOUBLE)" for d, p in BENFORD_P.items()
) + " END"

_BENFORD_ORACLE = f"""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                     1, 1) AS INT) AS first_digit
  FROM orders WHERE o_totalprice >= 1),
c AS (
  SELECT first_digit, CAST(COUNT(*) AS BIGINT) AS n FROM d
  GROUP BY first_digit),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
SELECT first_digit, n,
       CAST(n AS DOUBLE) / total AS obs_share,
       {_BENFORD_CASE} AS benford_share,
       abs(CAST(n AS DOUBLE) / total - {_BENFORD_CASE}) AS abs_dev
FROM c, tot
"""


@query("agg_benford_profile", oracle=_BENFORD_ORACLE, category="D")
def agg_benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fraud/synthetic-data screen: per leading digit, the exact count, the
    observed share (one pinned division), the expected Benford share
    (log10(1+1/d) precomputed and inlined as identical literals — no
    query-time transcendental, which libm would not round identically),
    and the absolute deviation. The first digit is extracted via the
    integer's string form (both engines render BIGINTs identically),
    never float log10.

    Scale: one row-local digit projection + a 9-group integer count with
    map-side combine; the profile is 9 rows at any data size."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("first_digit")
    )
    c = d.groupBy("first_digit").agg(F.count("*").cast("bigint").alias("n"))
    tot = c.agg(F.sum("n").cast("bigint").alias("total"))
    bp = F.create_map(
        *[F.lit(x) for kv in BENFORD_P.items() for x in kv]
    )[F.col("first_digit")]
    obs = F.col("n").cast("double") / F.col("total")
    return c.crossJoin(F.broadcast(tot)).select(
        "first_digit",
        "n",
        obs.alias("obs_share"),
        bp.alias("benford_share"),
        F.abs(obs - bp).alias("abs_dev"),
    )


# --- higher-moment statistics (round 5) --------------------------------

# Skewness/kurtosis from raw power sums. The sums are decimal-exact
# (l_quantity is integral <= 50, so q^2..q^4 are integers <= 6.25e6 —
# exactly representable in DECIMAL(18,6); per-group sums stay well under
# the 1e12 integral-digit ceiling at sf0.1 and the key is grouped, so
# headroom scales with group count, not corpus size). The moment algebra
# then runs on SCALARS in double with the exact same expression text on
# both engines — identical IEEE op sequences give bit-identical results
# (sqrt is correctly rounded; no transcendentals).
_MU = "(s1 / n)"
_M2 = f"(s2 / n - {_MU} * {_MU})"
_M3 = f"(s3 / n - 3 * {_MU} * (s2 / n) + 2 * {_MU} * {_MU} * {_MU})"
_M4 = (
    f"(s4 / n - 4 * {_MU} * (s3 / n) + 6 * ({_MU} * {_MU}) * (s2 / n)"
    f" - 3 * ({_MU} * {_MU}) * ({_MU} * {_MU}))"
)
_SKEW = f"({_M3} / ({_M2} * sqrt({_M2})))"
_KURT = f"({_M4} / ({_M2} * {_M2}))"

_MOMENTS_ORACLE = f"""
WITH s AS (
  SELECT l_returnflag, l_linestatus,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS s2,
         CAST(SUM(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS s3,
         CAST(SUM(CAST(l_quantity * l_quantity * l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS s4
  FROM lineitem GROUP BY l_returnflag, l_linestatus)
SELECT l_returnflag, l_linestatus, n,
       {_MU} AS mean_qty,
       {_M2} AS m2,
       {_SKEW} AS skewness,
       {_KURT} AS kurtosis
FROM s
"""


@query("agg_skew_kurtosis", oracle=_MOMENTS_ORACLE, category="D")
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and (raw) kurtosis per (returnflag, status)
    group, computed from raw power sums S1..S4 — the one-pass
    partial+final-aggregable formulation (never the two-pass centered
    form, which would need the mean before the shuffle). At 100 TB this
    is a single map-side-combined aggregation; the moment algebra is
    per-group scalar math.

    Cross-engine exactness: power sums are decimal-exact; the scalar
    algebra is executed from the SAME SQL expression strings on both
    engines (selectExpr here, the oracle there), so the IEEE op sequence
    — and therefore every bit of the result — is identical. Spark's own
    skewness()/kurtosis() aggregates are NOT used: their merge order is
    partition-dependent, exactly the nondeterminism this formulation
    removes."""
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    s = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(q.cast("decimal(18,6)")).cast("double").alias("s1"),
        F.sum((q * q).cast("decimal(18,6)")).cast("double").alias("s2"),
        F.sum((q * q * q).cast("decimal(18,6)")).cast("double").alias("s3"),
        F.sum((q * q * q * q).cast("decimal(18,6)"))
        .cast("double")
        .alias("s4"),
    )
    return s.selectExpr(
        "l_returnflag",
        "l_linestatus",
        "n",
        f"{_MU} AS mean_qty",
        f"{_M2} AS m2",
        f"{_SKEW} AS skewness",
        f"{_KURT} AS kurtosis",
    )


# --- skyline / Pareto front (round 5) ----------------------------------

# Sort-based skyline: with acctbal in exact integer cents ordered DESC,
# a supplier is Pareto-optimal (maximize acctbal AND revenue) iff its
# revenue strictly exceeds the best revenue at any strictly higher
# acctbal (RANGE ... 1 PRECEDING on the integer key = "strictly
# greater"), and no same-acctbal peer has strictly more revenue. One
# sort, no self-join — the O(n log n) skyline instead of the O(n²)
# NOT-EXISTS formulation (which remains the oracle's *semantic*
# definition, expressed here the same windowed way for bit-equality).
_SKY_WIN_DESC = (
    "max(revenue) OVER (ORDER BY cents DESC"
    " RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
)
_SKY_WIN_TIE = (
    "max(revenue) OVER (PARTITION BY cents)"
)

_SKYLINE_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(18,6))) AS DOUBLE) AS revenue
  FROM lineitem GROUP BY l_suppkey),
pts AS (
  SELECT s_suppkey, s_acctbal, revenue,
         CAST(round(s_acctbal * 100) AS BIGINT) AS cents
  FROM supplier JOIN rev ON s_suppkey = l_suppkey),
w AS (
  SELECT s_suppkey, s_acctbal, revenue,
         {_SKY_WIN_DESC} AS best_above,
         {_SKY_WIN_TIE} AS best_tie
  FROM pts)
SELECT s_suppkey, s_acctbal, revenue
FROM w
WHERE (best_above IS NULL OR revenue > best_above)
  AND revenue = best_tie
"""


@query("agg_skyline_pareto", oracle=_SKYLINE_ORACLE, category="D")
def agg_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto front): suppliers not dominated on
    (account balance, total lifetime revenue) — the multi-criteria
    shortlist operator (dominance: ≥ on both axes, > on at least one).

    Scale: revenue is one partial+final decimal aggregation over the
    fact table; the skyline itself is one sort of the (tiny) supplier
    aggregate — at 100 TB the sort input is |suppliers|, not |lineitem|,
    and the windowed formulation avoids the quadratic NOT-EXISTS
    self-join entirely. Exactness: acctbal is 2dp → exact integer cents;
    revenue is decimal-exact; both window maxima and the dominance
    comparisons are over bit-identical doubles."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,6)"
            )
        )
        .cast("double")
        .alias("revenue")
    )
    pts = (
        s.join(rev, s.s_suppkey == rev.l_suppkey)
        .selectExpr(
            "s_suppkey",
            "s_acctbal",
            "revenue",
            "CAST(round(s_acctbal * 100) AS BIGINT) AS cents",
        )
    )
    w = pts.selectExpr(
        "s_suppkey",
        "s_acctbal",
        "revenue",
        f"{_SKY_WIN_DESC} AS best_above",
        f"{_SKY_WIN_TIE} AS best_tie",
    )
    return w.filter(
        (F.col("best_above").isNull() | (F.col("revenue") > F.col("best_above")))
        & (F.col("revenue") == F.col("best_tie"))
    ).select("s_suppkey", "s_acctbal", "revenue")


# --- correlation matrix (round 5) --------------------------------------

# Pearson correlations among (quantity, discount, tax) from one pass of
# decimal-exact power/cross sums; all pairwise products are <=4dp with
# small magnitudes (qty<=50, rates<=0.1), so DECIMAL(18,6) holds them
# exactly with wide headroom. The correlation algebra runs on scalars
# from identical expression text (sqrt correctly rounded both engines).
_CORR_PAIRS = [("q", "d"), ("q", "x"), ("d", "x")]
_CORR_NAMES = {"q": "l_quantity", "d": "l_discount", "x": "l_tax"}


def _corr_expr(a: str, b: str) -> str:
    return (
        f"((n * s_{a}{b} - s_{a} * s_{b})"
        f" / (sqrt(n * s_{a}{a} - s_{a} * s_{a})"
        f" * sqrt(n * s_{b}{b} - s_{b} * s_{b})))"
    )


def _corr_sums_sql() -> str:
    terms = [f"CAST(COUNT(*) AS BIGINT) AS n"]
    for a in "qdx":
        terms.append(
            f"CAST(SUM(CAST({_CORR_NAMES[a]} AS DECIMAL(18,6)))"
            f" AS DOUBLE) AS s_{a}"
        )
    for a, b in [("q", "q"), ("d", "d"), ("x", "x")] + _CORR_PAIRS:
        terms.append(
            f"CAST(SUM(CAST({_CORR_NAMES[a]} * {_CORR_NAMES[b]}"
            f" AS DECIMAL(18,6))) AS DOUBLE) AS s_{a}{b}"
        )
    return ", ".join(terms)


_CORR_ORACLE = f"""
WITH s AS (SELECT {_corr_sums_sql()} FROM lineitem)
SELECT n,
       {_corr_expr('q', 'd')} AS corr_qty_discount,
       {_corr_expr('q', 'x')} AS corr_qty_tax,
       {_corr_expr('d', 'x')} AS corr_discount_tax
FROM s
"""


@query("agg_corr_matrix", oracle=_CORR_ORACLE, category="D")
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over three measures in ONE
    partial+final aggregation pass (10 exact sums feed all 3
    correlations) — feature-correlation screening before model training,
    without Spark's ``corr()`` whose merge order is partition-dependent.
    Bit-identical across engines and partitionings."""
    li = t(spark, sf_dir, "lineitem")
    s = li.selectExpr("l_quantity", "l_discount", "l_tax").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
        *[
            F.expr(
                f"CAST(SUM(CAST({_CORR_NAMES[a]} AS DECIMAL(18,6)))"
                " AS DOUBLE)"
            ).alias(f"s_{a}")
            for a in "qdx"
        ],
        *[
            F.expr(
                f"CAST(SUM(CAST({_CORR_NAMES[a]} * {_CORR_NAMES[b]}"
                " AS DECIMAL(18,6))) AS DOUBLE)"
            ).alias(f"s_{a}{b}")
            for a, b in [("q", "q"), ("d", "d"), ("x", "x")] + _CORR_PAIRS
        ],
    )
    return s.selectExpr(
        "n",
        f"{_corr_expr('q', 'd')} AS corr_qty_discount",
        f"{_corr_expr('q', 'x')} AS corr_qty_tax",
        f"{_corr_expr('d', 'x')} AS corr_discount_tax",
    )


# --- weighted median (round 5) -----------------------------------------

_WMED_ORACLE = """
WITH w AS (
  SELECT l_returnflag, l_extendedprice,
         CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (
              PARTITION BY l_returnflag ORDER BY l_extendedprice
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cw,
         CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (
              PARTITION BY l_returnflag) AS BIGINT) AS tw
  FROM lineitem)
SELECT l_returnflag,
       MIN(l_extendedprice) AS weighted_median,
       MIN(tw) AS total_weight
FROM w WHERE 2 * cw >= tw
GROUP BY l_returnflag
"""


@query("agg_weighted_median", oracle=_WMED_ORACLE, category="D")
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median per group (price weighted by quantity): the
    lower weighted median — the first value whose running weight reaches
    half the group total. Integer weights make the crossing test exact;
    the output value depends only on the value ordering, so ties among
    equal prices cannot change the result (no unique-key tiebreak
    needed — the chosen VALUE is the same for any tie order).

    Scale: one shuffle on the group key, one in-partition sort shared by
    both window sums, then a grouped MIN over the crossing suffix —
    no per-group collect, no percentile UDF."""
    li = t(spark, sf_dir, "lineitem")
    wg = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    w = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum(F.col("l_quantity").cast("bigint"))
        .over(wg.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cw"),
        F.sum(F.col("l_quantity").cast("bigint"))
        .over(Window.partitionBy("l_returnflag"))
        .cast("bigint")
        .alias("tw"),
    )
    return (
        w.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("weighted_median"),
            F.min("tw").alias("total_weight"),
        )
    )


# --- 2-D equi-width histogram (round 5) --------------------------------

# integer bin arithmetic: floor division spells `div` in Spark SQL and
# `//` in DuckDB — the VALUES are exact integers either way.
_H2D_QBIN_D = "CAST(CAST(l_quantity AS BIGINT) // 10 AS BIGINT)"
_H2D_DBIN_D = "CAST(CAST(round(l_discount * 100) AS BIGINT) // 2 AS BIGINT)"
_H2D_QBIN_S = "CAST(CAST(l_quantity AS BIGINT) div 10 AS BIGINT)"
_H2D_DBIN_S = "CAST(CAST(round(l_discount * 100) AS BIGINT) div 2 AS BIGINT)"

_H2D_ORACLE = f"""
SELECT {_H2D_QBIN_D} AS qty_bin,
       {_H2D_DBIN_D} AS disc_bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
         AS total_price
FROM lineitem
GROUP BY 1, 2
"""


@query("agg_histogram_2d", oracle=_H2D_ORACLE, category="D")
def agg_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D equi-width histogram over (quantity, discount) with a price
    measure per cell — the joint-distribution profile behind heatmaps
    and correlation sanity checks. Bin ids are exact integer arithmetic
    (quantity is integral; discount is 2dp so round(×100) recovers the
    exact integer percent before the width-2 floor division).

    Scale: one partial+final aggregation; cell count is bounded by the
    bin grid (6×6 here), so the reduce side is constant-size."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.selectExpr(
            f"{_H2D_QBIN_S} AS qty_bin",
            f"{_H2D_DBIN_S} AS disc_bin",
            "l_extendedprice",
        )
        .groupBy("qty_bin", "disc_bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_price"),
        )
    )


# --- chi-square independence (round 5) ---------------------------------

_CHI2_CELL = (
    "(o - CAST(rn AS DOUBLE) * cn / tot)"
    " * (o - CAST(rn AS DOUBLE) * cn / tot)"
    " / (CAST(rn AS DOUBLE) * cn / tot)"
)

_CHI2_ORACLE = f"""
WITH obs AS (
  SELECT event_type, CAST(user_id % 4 AS BIGINT) AS cohort,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2),
rowt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS rn
         FROM obs GROUP BY event_type),
colt AS (SELECT cohort, CAST(SUM(o) AS BIGINT) AS cn
         FROM obs GROUP BY cohort),
tott AS (SELECT CAST(SUM(o) AS BIGINT) AS tot FROM obs),
cells AS (
  SELECT obs.event_type, obs.cohort,
         CAST(obs.o AS DOUBLE) AS o, rn, cn, tot
  FROM obs JOIN rowt USING (event_type) JOIN colt USING (cohort)
  CROSS JOIN tott)
SELECT CAST(SUM(CAST(round({_CHI2_CELL}, 6) AS DECIMAL(18,6)))
            AS DOUBLE) AS chi2,
       CAST((SELECT COUNT(*) - 1 FROM rowt)
            * (SELECT COUNT(*) - 1 FROM colt) AS BIGINT) AS dof,
       (SELECT tot FROM tott) AS n
FROM cells
"""


@query("events_chi_square_independence", oracle=_CHI2_ORACLE, category="D")
def events_chi_square_independence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pearson chi-square independence statistic for the (event_type ×
    user-cohort) contingency table, with degrees of freedom — the
    categorical-association test behind segment-mix monitoring (compare
    the statistic against the chi² critical value offline; no p-value
    here because no distribution function is engine-portable).

    Exactness: observed/marginal counts are integers; each cell's
    (O−E)²/E evaluates from identical expression text and is 6dp-rounded
    then summed as exact decimals (cell count is bounded by the grid, so
    the rounding-error budget is fixed). Scale: one contingency
    aggregation + broadcast marginals — the table is |types × cohorts|
    regardless of event volume."""
    e = t(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type", (F.col("user_id") % 4).cast("bigint").alias("cohort")
    ).agg(F.count("*").cast("bigint").alias("o"))
    rowt = obs.groupBy("event_type").agg(
        F.sum("o").cast("bigint").alias("rn")
    )
    colt = obs.groupBy("cohort").agg(F.sum("o").cast("bigint").alias("cn"))
    tott = obs.agg(F.sum("o").cast("bigint").alias("tot"))
    cells = (
        obs.join(F.broadcast(rowt), "event_type")
        .join(F.broadcast(colt), "cohort")
        .crossJoin(F.broadcast(tott))
        .selectExpr("CAST(o AS DOUBLE) AS o", "rn", "cn", "tot")
    )
    dof = (
        rowt.agg((F.count("*") - 1).alias("r"))
        .crossJoin(colt.agg((F.count("*") - 1).alias("c")))
        .select((F.col("r") * F.col("c")).cast("bigint").alias("dof"))
    )
    chi2 = cells.agg(
        F.sum(
            F.expr(f"CAST(round({_CHI2_CELL}, 6) AS DECIMAL(18,6))")
        )
        .cast("double")
        .alias("chi2")
    )
    return (
        chi2.crossJoin(F.broadcast(dof))
        .crossJoin(F.broadcast(tott.withColumnRenamed("tot", "n")))
        .select("chi2", "dof", "n")
    )


# --- exact percentile grid (round 5) -----------------------------------

PCT_GRID = (25, 50, 75, 95)

_PCTGRID_ORACLE = f"""
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         CAST(row_number() OVER (PARTITION BY l_returnflag
              ORDER BY l_extendedprice, l_orderkey, l_linenumber)
              AS BIGINT) AS r,
         CAST(COUNT(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
  FROM lineitem)
SELECT l_returnflag,
       MIN(n) AS n_rows,
       {", ".join(
           f"MAX(CASE WHEN r = CAST(ceil(0.{p:02d} * n) AS BIGINT)"
           f" THEN l_extendedprice END) AS p{p}"
           for p in PCT_GRID)}
FROM ranked GROUP BY l_returnflag
"""


@query("agg_percentile_grid_exact", oracle=_PCTGRID_ORACLE, category="D")
def agg_percentile_grid_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p25/p50/p75/p95 per group in ONE ranked pass: every
    percentile is the rank-crossing ELEMENT (ceil(q·n), pinned total
    order), so all four come from the same window + one conditional
    aggregation — no interpolation (engine-specific), no one-pass-per-
    quantile, no percentile UDF.

    Scale: one shuffle + sort per group key; the grid width only adds
    conditional-aggregate columns. For 100 TB fact tables the
    approx-percentile verdict tier is the swap-in (same output shape)."""
    li = t(spark, sf_dir, "lineitem")
    wr = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(wr).cast("bigint").alias("r"),
        F.count("*")
        .over(Window.partitionBy("l_returnflag"))
        .cast("bigint")
        .alias("n"),
    )
    return ranked.groupBy("l_returnflag").agg(
        F.min("n").alias("n_rows"),
        *[
            F.max(
                F.when(
                    F.col("r")
                    == F.ceil(F.lit(p / 100.0) * F.col("n")).cast("bigint"),
                    F.col("l_extendedprice"),
                )
            ).alias(f"p{p}")
            for p in PCT_GRID
        ],
    )


# --- geometric mean, log domain (round 5) ------------------------------

_GEO_ORACLE = """
WITH w AS (
  SELECT l_returnflag,
         round(ln(l_extendedprice), 6) AS lnp
  FROM lineitem WHERE l_extendedprice > 0)
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(lnp AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
         AS mean_ln_price
FROM w GROUP BY l_returnflag
"""


@query("agg_geometric_mean_log", oracle=_GEO_ORACLE, category="D")
def agg_geometric_mean_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean in the LOG domain: mean of 6dp-rounded ln(price)
    per group (the geometric mean itself is exp of this — applied by the
    consumer, because exp is not correctly rounded cross-engine while
    the log-domain statistic is bit-exact under the package's
    round-then-decimal-sum discipline). The right average for
    multiplicative quantities (growth rates, price ratios); one
    partial+final pass."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    w = li.select(
        "l_returnflag",
        F.round(F.log(F.col("l_extendedprice")), 6).alias("lnp"),
    )
    return w.groupBy("l_returnflag").agg(
        F.count("*").cast("bigint").alias("n"),
        (
            F.sum(F.col("lnp").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("mean_ln_price"),
    )


# --- rollup share-of-parent (round 5 cont.) ----------------------------

_ROLLUP_SHARE_ORACLE = f"""
WITH r AS (
  SELECT o_orderstatus, o_orderpriority,
         CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
         {DSUM('o_totalprice')} AS revenue
  FROM orders
  GROUP BY ROLLUP (o_orderstatus, o_orderpriority)),
s AS (
  SELECT o_orderstatus, o_orderpriority, gid, revenue,
         MAX(CASE WHEN gid = 1 THEN revenue END)
             OVER (PARTITION BY o_orderstatus) AS status_total,
         MAX(CASE WHEN gid = 3 THEN revenue END) OVER () AS grand_total
  FROM r)
SELECT o_orderstatus, o_orderpriority, gid, revenue,
       CASE WHEN gid = 0 THEN revenue / status_total
            WHEN gid = 1 THEN revenue / grand_total
            ELSE 1.0 END AS share_of_parent
FROM s
"""


@query("agg_rollup_share_of_parent", oracle=_ROLLUP_SHARE_ORACLE,
       category="D")
def agg_rollup_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OLAP drill-down report: ROLLUP(status, priority) revenue with
    each row's share of its PARENT level (leaf / status subtotal,
    subtotal / grand total) — the percent-of-parent column every pivot
    UI renders next to a hierarchy. Parent values are recovered from the
    same rollup output via windows keyed on the grouping id, so the fact
    is aggregated exactly once.

    Decimal revenue sums; shares are mirrored double divisions (NULL
    rollup keys partition subtotals with their leaves — the grand row
    partitions alone). Scale: one expand-rollup aggregation plus two
    windows over the |groups|-sized result."""
    r = (
        t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            dsum(F.col("o_totalprice")).alias("revenue"),
        )
    )
    w_status = Window.partitionBy("o_orderstatus")
    w_all = Window.partitionBy()
    s = r.select(
        "o_orderstatus", "o_orderpriority", "gid", "revenue",
        F.max(F.when(F.col("gid") == 1, F.col("revenue"))).over(w_status)
        .alias("status_total"),
        F.max(F.when(F.col("gid") == 3, F.col("revenue"))).over(w_all)
        .alias("grand_total"),
    )
    return s.select(
        "o_orderstatus", "o_orderpriority", "gid", "revenue",
        F.when(F.col("gid") == 0, F.col("revenue") / F.col("status_total"))
        .when(F.col("gid") == 1, F.col("revenue") / F.col("grand_total"))
        .otherwise(F.lit(1.0))
        .alias("share_of_parent"),
    )


# --- period-over-period variance bridge (round 5 cont.) -----------------

BRIDGE_PREV = ("1996-01-01", "1998-01-01")
BRIDGE_CUR = ("1998-01-01", "2000-01-01")

_BRIDGE_ORACLE = f"""
WITH seg AS (
  SELECT o_orderpriority,
         CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '{BRIDGE_PREV[0]}'
                        AND o_orderdate < TIMESTAMP '{BRIDGE_PREV[1]}'
                       THEN CAST(o_totalprice AS DECIMAL(18,6)) END)
              AS DOUBLE) AS prev_rev,
         CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '{BRIDGE_CUR[0]}'
                        AND o_orderdate < TIMESTAMP '{BRIDGE_CUR[1]}'
                       THEN CAST(o_totalprice AS DECIMAL(18,6)) END)
              AS DOUBLE) AS cur_rev
  FROM orders GROUP BY o_orderpriority),
d AS (
  SELECT o_orderpriority, prev_rev, cur_rev,
         cur_rev - prev_rev AS delta,
         CAST(SUM(CAST(cur_rev - prev_rev AS DECIMAL(18,6))) OVER ()
              AS DOUBLE) AS total_delta
  FROM seg)
SELECT o_orderpriority, prev_rev, cur_rev, delta,
       CASE WHEN total_delta = 0 THEN NULL
            ELSE delta / total_delta END AS contribution
FROM d
"""


@query("agg_variance_bridge", oracle=_BRIDGE_ORACLE, category="D")
def agg_variance_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period variance bridge by segment: each priority's
    revenue in two date windows, the delta, and its contribution share
    of the total movement — the "what drove the change" decomposition
    every finance/BI review opens with, companion to
    ``win_budget_waterfall`` (which sequences one period).

    Both period sums come from ONE filtered-aggregation pass over the
    fact (no per-period scans); deltas are decimal-exact doubles, the
    total-delta window re-sums the segment deltas in decimal so the
    normalizer is order-free, and the share is one guarded division."""
    o = t(spark, sf_dir, "orders")
    def period(lo: str, hi: str):
        return F.when(
            (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(hi).cast("timestamp")),
            F.col("o_totalprice").cast("decimal(18,6)"),
        )
    seg = o.groupBy("o_orderpriority").agg(
        F.sum(period(*BRIDGE_PREV)).cast("double").alias("prev_rev"),
        F.sum(period(*BRIDGE_CUR)).cast("double").alias("cur_rev"),
    )
    delta = F.col("cur_rev") - F.col("prev_rev")
    w_all = Window.partitionBy()
    d = seg.select(
        "o_orderpriority", "prev_rev", "cur_rev",
        delta.alias("delta"),
        F.sum(delta.cast("decimal(18,6)")).over(w_all)
        .cast("double").alias("total_delta"),
    )
    return d.select(
        "o_orderpriority", "prev_rev", "cur_rev", "delta",
        F.when(F.col("total_delta") == 0, F.lit(None).cast("double"))
        .otherwise(F.col("delta") / F.col("total_delta"))
        .alias("contribution"),
    )


# --- Chatterjee's xi rank correlation (round 10) --------------------------

_XI_ORACLE = """
WITH base AS (
  SELECT o_totalprice AS x, o_orderdate AS y, o_orderkey AS k
  FROM orders),
ranked AS (
  SELECT
    CAST(row_number() OVER (ORDER BY x, k) AS BIGINT) AS sx,
    CAST(row_number() OVER (ORDER BY y, k) AS BIGINT) AS ry
  FROM base),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
sxy AS (
  SELECT CAST(SUM(abs(ry - lag_ry)) AS BIGINT) AS s
  FROM (SELECT ry, lag(ry) OVER (ORDER BY sx) AS lag_ry FROM ranked)
  WHERE lag_ry IS NOT NULL),
syx AS (
  SELECT CAST(SUM(abs(sx - lag_sx)) AS BIGINT) AS s
  FROM (SELECT sx, lag(sx) OVER (ORDER BY ry) AS lag_sx FROM ranked)
  WHERE lag_sx IS NOT NULL)
SELECT n.n,
       sxy.s AS s_xy, syx.s AS s_yx,
       1.0 - 3.0 * CAST(sxy.s AS DOUBLE) / (CAST(n.n AS DOUBLE) * n.n - 1)
         AS xi_xy,
       1.0 - 3.0 * CAST(syx.s AS DOUBLE) / (CAST(n.n AS DOUBLE) * n.n - 1)
         AS xi_yx
FROM n, sxy, syx
"""


@query("agg_xi_correlation", oracle=_XI_ORACLE, category="D")
def agg_xi_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHATTERJEE'S XI rank correlation (Chatterjee 2020, "A new
    coefficient of correlation", JASA — public method) in BOTH
    directions: sort by X, take consecutive |rank(Y)| jumps,
    xi = 1 − 3·Σ|r_{i+1} − r_i|/(n²−1). Unlike Pearson/Spearman
    (``agg_regr``/``agg_corr_matrix``), xi detects ARBITRARY functional
    dependence (a parabola scores ~0 Pearson but high xi) and is
    asymmetric — xi(X→Y) ≠ xi(Y→X) tells you which variable determines
    which. Runs on X = order price vs Y = order date; ties break on the
    UNIQUE o_orderkey — a genuinely total order (the lineitem fixture's
    (orderkey, linenumber) is NOT unique, which would make row_number
    engine-dependent) — the deterministic form of the estimator's
    random tie-break.

    Exactness: both ranks and the jump sum are pure integers; the two
    final divisions are mirrored double expressions.

    Scale: two global rank windows + two lag windows — the exactness
    reference formulation. At extreme n, both ranks distribute by the
    compressed two-pass spine (``ml_feature_quantile_bin``) or the
    range-totals prefix sum (``docs_shard_assign_prefix_sum``), and the
    consecutive-jump sum localizes per range with one boundary row
    exchanged per partition; the formula itself is a single integer
    reduction either way."""
    li = t(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("x"),
        F.col("o_orderdate").alias("y"),
        F.col("o_orderkey").alias("k"),
    )
    from dbsuite_spark.tables import memo_cache

    # consumed by BOTH jump-sum branches: without the memo each branch
    # re-runs the two global rank sorts (4 sorts, 3 scans per call)
    ranked = memo_cache(
        li.select(
            F.row_number()
            .over(Window.orderBy("x", "k"))
            .cast("bigint")
            .alias("sx"),
            F.row_number()
            .over(Window.orderBy("y", "k"))
            .cast("bigint")
            .alias("ry"),
        ),
        f"xi_ranked:{sf_dir}",
    )
    s_xy = (
        ranked.select(
            "ry", F.lag("ry").over(Window.orderBy("sx")).alias("lag_ry")
        )
        .filter(F.col("lag_ry").isNotNull())
        .agg(
            F.sum(F.abs(F.col("ry") - F.col("lag_ry")))
            .cast("bigint")
            .alias("s_xy")
        )
    )
    s_yx = (
        ranked.select(
            "sx", F.lag("sx").over(Window.orderBy("ry")).alias("lag_sx")
        )
        .filter(F.col("lag_sx").isNotNull())
        .agg(
            F.sum(F.abs(F.col("sx") - F.col("lag_sx")))
            .cast("bigint")
            .alias("s_yx")
        )
    )
    nf = li.agg(F.count("*").cast("bigint").alias("n"))
    nd = F.col("n").cast("double")
    return (
        nf.crossJoin(F.broadcast(s_xy))
        .crossJoin(F.broadcast(s_yx))
        .select(
            "n",
            "s_xy",
            "s_yx",
            (
                F.lit(1.0)
                - F.lit(3.0) * F.col("s_xy").cast("double") / (nd * F.col("n") - 1)
            ).alias("xi_xy"),
            (
                F.lit(1.0)
                - F.lit(3.0) * F.col("s_yx").cast("double") / (nd * F.col("n") - 1)
            ).alias("xi_yx"),
        )
    )
