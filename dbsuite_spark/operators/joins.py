"""Category C — join operators (SURVEY §2C).

Reference semantics: the full DB2 LUW join dialect dbsuite's parser covers
(inner/outer/semi/anti/cross/theta) plus driver-mandated time-series joins
(as-of, interval overlap). Provenance SURVEY §0/§2 [PUBLIC, module-level].

Physical strategy is left to Catalyst + AQE (broadcast vs shuffled-hash vs
sort-merge); only `join_broadcast_hint` pins it. Scale notes per key in
docstrings — the recurring theme: equi-joins shuffle on their keys and
small dims are broadcast, so nothing here degrades to a cross product at
100 TB except the keys that *are* products (cross, theta) which are bounded
to dimension-sized inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbsuite_spark.exact import BIGCOUNT, DSUM, dsum
from dbsuite_spark.registry import query
from dbsuite_spark.tables import fan_out, t


@query(
    "join_inner_equi",
    oracle="""
SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
""",
    category="C",
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join orders ⋈ customer. Dim side broadcasts under AQE."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_left_outer",
    oracle="""
SELECT c_custkey, o_orderkey, o_totalprice
FROM customer LEFT JOIN orders
  ON c_custkey = o_custkey AND o_totalprice > 450000
""",
    category="C",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER JOIN with an extra join-side predicate so null extension
    actually occurs (every customer has orders in the fixtures)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 450000)
    return c.join(o, cond, "left").select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


@query(
    "join_right_outer",
    oracle="""
SELECT c_custkey, o_orderkey
FROM orders RIGHT JOIN customer
  ON o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
""",
    category="C",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER JOIN (mirror of left; Spark plans it as left-outer with
    sides swapped)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    cond = (o.o_custkey == c.c_custkey) & (o.o_orderpriority == "1-URGENT")
    return o.join(c, cond, "right").select("c_custkey", "o_orderkey")


@query(
    "join_full_outer",
    oracle="""
SELECT l.c_custkey AS left_key, r.o_orderkey AS right_key
FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 5000) l
FULL JOIN (SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 400000) r
  ON l.c_custkey = r.o_custkey
""",
    category="C",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER JOIN with unmatched rows on both sides."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000).select(
        "c_custkey"
    )
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000).select(
        "o_orderkey", "o_custkey"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        F.col("c_custkey").alias("left_key"),
        F.col("o_orderkey").alias("right_key"),
    )


@query(
    "join_left_semi",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49)
""",
    category="C",
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join: suppliers with at least one near-max-quantity line."""
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


@query(
    "join_left_anti",
    oracle="""
SELECT p_partkey, p_name
FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_discount > 0.08)
""",
    category="C",
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: parts never sold at a deep discount."""
    p = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.08)
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


@query(
    "join_cross",
    oracle="""
SELECT r_name, n_name FROM region CROSS JOIN nation
""",
    category="C",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — only ever small×small (5×25); a cross join of
    fact tables is a design bug at any scale."""
    r = t(spark, sf_dir, "region").select("r_name")
    n = t(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@query(
    "join_theta_range",
    oracle="""
SELECT s_suppkey, c_custkey
FROM supplier JOIN customer
  ON c_acctbal BETWEEN s_acctbal - 50 AND s_acctbal + 50
""",
    category="C",
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range join (nested-loop class). Bounded to the two dim
    tables: at scale this stays a broadcast nested loop over the small
    side, never fact×fact."""
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    cond = (c.c_acctbal >= s.s_acctbal - 50) & (c.c_acctbal <= s.s_acctbal + 50)
    return s.join(c, cond).select("s_suppkey", "c_custkey")


@query(
    "join_broadcast_hint",
    oracle="""
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    category="C",
)
def join_broadcast_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the 25-row nation dim — the replicated-dim
    pattern that avoids shuffling the big side entirely."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
    )


_STAR_ORACLE = f"""
SELECT r_name, n_name,
       {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue,
       {BIGCOUNT()} AS n_lines
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY r_name, n_name
"""


@query("join_multiway_star", oracle=_STAR_ORACLE, category="C")
def join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star chain region→nation→customer→orders→lineitem with revenue
    rollup (TPC-H Q5 shape). Dims broadcast; the only shuffle is
    lineitem⋈orders + the final group-by. At 100 TB this is the canonical
    star-join plan: one fact shuffle, everything else replicated."""
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    # Round-14: the old "no fan_out — lineitem⋈orders is a shuffled
    # join" rationale went stale when autoBroadcastJoinThreshold rose to
    # 64m: ALL four joins now broadcast, so the whole 600k-row probe
    # chain + the partial aggregate fused into the single-row-group
    # lineitem scan stage ran on ONE core (the same documented local
    # ceiling flagship's fan_out solves). Keyed fan_out (hash
    # l_orderkey, no sort-before-repartition) buys a 32-wide probe for
    # one narrow shuffle; identity at scale where the scan is wide.
    li = fan_out(t(spark, sf_dir, "lineitem"), key="l_orderkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "join_self",
    oracle="""
SELECT o1.o_custkey AS custkey, o1.o_orderkey AS k1, o2.o_orderkey AS k2
FROM orders o1 JOIN orders o2
  ON o1.o_custkey = o2.o_custkey AND o1.o_orderkey < o2.o_orderkey
WHERE o1.o_orderpriority = '1-URGENT' AND o2.o_orderpriority = '1-URGENT'
""",
    category="C",
)
def join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join: unordered pairs of urgent orders per customer. Keys are
    pre-filtered so the per-customer fanout stays bounded."""
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    o1 = o.alias("o1")
    o2 = o.alias("o2")
    return o1.join(
        o2,
        (F.col("o1.o_custkey") == F.col("o2.o_custkey"))
        & (F.col("o1.o_orderkey") < F.col("o2.o_orderkey")),
    ).select(
        F.col("o1.o_custkey").alias("custkey"),
        F.col("o1.o_orderkey").alias("k1"),
        F.col("o2.o_orderkey").alias("k2"),
    )


@query(
    "join_asof",
    oracle="""
SELECT p.event_id,
       (SELECT MAX(c.ts) FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts < p.ts)
           AS prev_click_ts
FROM events p
WHERE p.event_type = 'purchase'
""",
    category="C",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest strictly-prior click
    of the same user. Spark-first formulation: union the two event roles,
    sort within user, carry the last click timestamp forward with
    last(ignorenulls) — a single shuffle on user_id, no range join, no
    per-row subquery. This is the scalable pattern for time-series as-of at
    100 TB (state flows through one window pass)."""
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("click_ts"),
        F.lit(1).alias("role"),  # clicks sort after purchases at equal ts
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(0).alias("role"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "role")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "prev_click_ts", F.last("click_ts", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("role") == 0).select("event_id", "prev_click_ts")


@query(
    "join_interval_overlap",
    oracle="""
SELECT a.o_custkey AS custkey, a.o_orderkey AS k1, b.o_orderkey AS k2
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
 AND a.o_orderdate < b.o_orderdate + INTERVAL 30 DAY
 AND b.o_orderdate < a.o_orderdate + INTERVAL 30 DAY
""",
    category="C",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self join: order pairs of one customer whose 30-day
    activity windows overlap. Equi key (custkey) carries the shuffle; the
    range predicate is applied inside the sort-merge join, so no cross
    product materializes."""
    o = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    a = o.alias("a")
    b = o.alias("b")
    day30 = F.expr("INTERVAL 30 DAYS")
    return a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
        & (F.col("a.o_orderdate") < F.col("b.o_orderdate") + day30)
        & (F.col("b.o_orderdate") < F.col("a.o_orderdate") + day30),
    ).select(
        F.col("a.o_custkey").alias("custkey"),
        F.col("a.o_orderkey").alias("k1"),
        F.col("b.o_orderkey").alias("k2"),
    )


RANGE_BIN_US = 600 * 1_000_000  # 10-minute proximity window = bin width


@query(
    "join_range_binned",
    oracle=f"""
SELECT p.event_id AS purchase_id, c.event_id AS click_id,
       CAST(epoch_us(c.ts) - epoch_us(p.ts) AS BIGINT) AS delta_us
FROM events p, events c
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
  AND abs(epoch_us(c.ts) - epoch_us(p.ts)) <= {RANGE_BIN_US}
""",
    category="C",
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join with NO equi key (every purchase × every click
    within 10 minutes), made shuffle-joinable by time binning: bin width =
    the proximity window, the build side replicated to its bin ± 1, probe
    side kept at its own bin — so the pair lands in exactly one bucket
    (no dedup pass) and the join is a plain hash join on bin id.
    This turns an O(N·M) theta join into O(N + M + output) with
    density-bounded buckets — the standard 100 TB answer when no equi key
    exists (the equi-key-carried variant is ``join_interval_overlap``).
    Microsecond integer deltas keep both engines bit-identical."""
    e = t(spark, sf_dir, "events").select(
        "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("us").alias("p_us"),
        F.expr(f"us div {RANGE_BIN_US}").alias("bin"),
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("us").alias("c_us"),
            F.explode(
                F.array(F.lit(-1), F.lit(0), F.lit(1))
            ).alias("shift"),
        )
        .select(
            "click_id",
            "c_us",
            (
                F.expr(f"c_us div {RANGE_BIN_US}") + F.col("shift")
            ).alias("bin"),
        )
    )
    return (
        p.join(c, "bin")
        .filter(
            F.abs(F.col("c_us") - F.col("p_us")) <= F.lit(RANGE_BIN_US)
        )
        .select(
            "purchase_id",
            "click_id",
            (F.col("c_us") - F.col("p_us")).alias("delta_us"),
        )
    )


@query(
    "join_asof_nearest",
    oracle="""
SELECT event_id,
       CASE
         WHEN prev_ts IS NULL THEN next_ts
         WHEN next_ts IS NULL THEN prev_ts
         WHEN epoch_us(ts) - epoch_us(prev_ts)
              <= epoch_us(next_ts) - epoch_us(ts) THEN prev_ts
         ELSE next_ts
       END AS nearest_click_ts
FROM (
  SELECT p.event_id, p.ts,
         (SELECT MAX(c.ts) FROM events c
          WHERE c.user_id = p.user_id AND c.event_type = 'click'
            AND c.ts < p.ts) AS prev_ts,
         (SELECT MIN(c.ts) FROM events c
          WHERE c.user_id = p.user_id AND c.event_type = 'click'
            AND c.ts > p.ts) AS next_ts
  FROM events p WHERE p.event_type = 'purchase')
""",
    category="C",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join: each purchase matched to the CLOSEST
    click of the same user in either direction (backward on ties). Same
    union-the-roles single-shuffle pattern as ``join_asof``, with two
    window passes over one user_id exchange: the backward pass orders
    same-timestamp clicks AFTER purchases (so 'strictly prior' holds) and
    the forward pass orders them BEFORE (so 'strictly later' holds) —
    strictness on both sides without any range join. Distances compare
    in exact integer microseconds."""
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("click_ts"),
        F.lit(1).alias("role"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(0).alias("role"),
    )
    w_bwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.col("role").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.col("role").desc())
        .rowsBetween(1, Window.unboundedFollowing)
    )
    merged = (
        clicks.unionByName(purchases)
        .withColumn(
            "prev_ts", F.last("click_ts", ignorenulls=True).over(w_bwd)
        )
        .withColumn(
            "next_ts", F.first("click_ts", ignorenulls=True).over(w_fwd)
        )
    )
    back_dist = F.unix_micros("ts") - F.unix_micros("prev_ts")
    fwd_dist = F.unix_micros("next_ts") - F.unix_micros("ts")
    nearest = (
        F.when(F.col("prev_ts").isNull(), F.col("next_ts"))
        .when(F.col("next_ts").isNull(), F.col("prev_ts"))
        .when(back_dist <= fwd_dist, F.col("prev_ts"))
        .otherwise(F.col("next_ts"))
    )
    return merged.filter(F.col("role") == 0).select(
        "event_id", nearest.alias("nearest_click_ts")
    )


@query(
    "join_null_safe_equi",
    oracle="""
WITH l AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN NULL
              ELSE c_nationkey END AS nk
  FROM customer),
r AS (
  SELECT CASE WHEN n_nationkey % 5 = 0 THEN NULL
              ELSE n_nationkey END AS nk,
         n_name
  FROM nation)
SELECT COALESCE(CAST(l.nk AS VARCHAR), 'NULL') AS key_repr,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT l.c_custkey) AS BIGINT) AS n_customers
FROM l JOIN r ON l.nk IS NOT DISTINCT FROM r.nk
GROUP BY 1
""",
    category="C",
)
def join_null_safe_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` ≡ SQL IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of silently dropping — the semantics
    behind late-arriving-dimension joins where 'unknown' buckets must
    still pair up. Both sides carry deterministically synthesized NULLs
    (the fixtures are NULL-free); the result aggregates pair counts per
    key representation, with the NULL×NULL block appearing as its own
    group.

    Scale: ``<=>`` is a hash-join-able equality in Spark (null-safe keys
    hash like any value), so the plan is an ordinary broadcast/shuffle
    hash join — NOT a nested loop; but note every NULL row lands in ONE
    hash bucket, so a null-heavy fact side is a skew hazard: filter or
    salt the null block first at 100 TB (``join_salted_skew`` is that
    substrate)."""
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.col("c_nationkey"))
        .alias("nk"),
    )
    n = t(spark, sf_dir, "nation").select(
        F.when(F.col("n_nationkey") % 5 == 0, None)
        .otherwise(F.col("n_nationkey"))
        .alias("nk2"),
        "n_name",
    )
    return (
        c.join(F.broadcast(n), F.col("nk").eqNullSafe(F.col("nk2")))
        .groupBy(
            F.coalesce(F.col("nk").cast("string"), F.lit("NULL")).alias(
                "key_repr"
            )
        )
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("c_custkey").alias("n_customers"),
        )
    )


ASOF_TOLERANCE = "INTERVAL 2 HOUR"


@query(
    "join_asof_tolerance",
    oracle=f"""
SELECT p.event_id,
       (SELECT MAX(c.ts) FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts < p.ts AND c.ts >= p.ts - {ASOF_TOLERANCE})
           AS prev_click_ts
FROM events p WHERE p.event_type = 'purchase'
""",
    category="C",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match tolerance (pandas ``merge_asof(...,
    tolerance=...)`` semantics): each purchase takes the latest
    strictly-prior click of the same user ONLY if it happened within the
    last 2 hours — stale state must not match. Same single-shuffle
    union + last(ignorenulls) window as ``join_asof``; the tolerance is a
    row-local null-out afterward (the latest prior click is the maximal
    one, so if IT is stale, every prior click is).

    Scale: identical plan to ``join_asof`` — one user_id shuffle, one
    window pass, no range join, no per-row subquery."""
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("click_ts"),
        F.lit(1).alias("role"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(0).alias("role"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "role")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "prev_click_ts", F.last("click_ts", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("role") == 0).select(
        "event_id",
        F.when(
            F.col("prev_click_ts")
            >= F.col("ts") - F.expr(ASOF_TOLERANCE),
            F.col("prev_click_ts"),
        ).alias("prev_click_ts"),
    )


_PIT_ORACLE = """
WITH p AS (
  SELECT event_id, user_id, ts, value AS label_value FROM events
  WHERE event_type = 'purchase'),
lastc AS (
  SELECT event_id, c_ts, c_val FROM (
    SELECT p.event_id, c.ts AS c_ts, c.value AS c_val,
           row_number() OVER (PARTITION BY p.event_id
             ORDER BY c.ts DESC, c.event_id DESC) AS rn
    FROM p JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click'
     AND c.ts < p.ts) WHERE rn = 1),
lastv AS (
  SELECT event_id, v_ts, v_val FROM (
    SELECT p.event_id, v.ts AS v_ts, v.value AS v_val,
           row_number() OVER (PARTITION BY p.event_id
             ORDER BY v.ts DESC, v.event_id DESC) AS rn
    FROM p JOIN events v
      ON v.user_id = p.user_id AND v.event_type = 'view'
     AND v.ts < p.ts) WHERE rn = 1)
SELECT p.event_id, p.user_id, p.label_value,
       lastc.c_val AS click_value, lastv.v_val AS view_value,
       CAST(epoch_us(p.ts) - epoch_us(lastc.c_ts) AS BIGINT)
         AS click_age_us,
       CAST(epoch_us(p.ts) - epoch_us(lastv.v_ts) AS BIGINT)
         AS view_age_us
FROM p
LEFT JOIN lastc ON p.event_id = lastc.event_id
LEFT JOIN lastv ON p.event_id = lastv.event_id
"""


@query("ml_pit_feature_join", oracle=_PIT_ORACLE, category="C")
def ml_pit_feature_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature join — the feature-store primitive behind
    leakage-free training sets: every purchase (the label event) is
    enriched with the value and age of the user's latest STRICTLY-prior
    click and view. One union of the three roles and ONE window pass per
    user carries both feature structs (``last(ignorenulls)`` over
    (ts, role, event_id) order, labels sorting before same-timestamp
    features so equal-time features are excluded — no future leakage,
    and the struct carry makes the picked value deterministic even under
    tied timestamps, unlike a bare MAX(ts) + rejoin). Ages are exact
    integer microsecond deltas.

    Scale: the multi-feature extension of ``join_asof`` — still one
    shuffle on user_id for ANY number of feature sources, versus one
    range join per source in the naive formulation; window state is one
    struct per feature."""
    e = t(spark, sf_dir, "events")

    def role(et: str, r: int, carry: str):
        base = e.filter(F.col("event_type") == et)
        cs = F.struct("ts", "event_id", "value")
        return base.select(
            "user_id",
            "ts",
            F.lit(r).alias("role"),
            "event_id",
            (F.col("value") if et == "purchase" else F.lit(None).cast("double")).alias(
                "label_value"
            ),
            (cs if carry == "c" else F.lit(None).cast(
                "struct<ts:timestamp,event_id:bigint,value:double>"
            )).alias("c_feat"),
            (cs if carry == "v" else F.lit(None).cast(
                "struct<ts:timestamp,event_id:bigint,value:double>"
            )).alias("v_feat"),
        )

    merged = (
        role("purchase", 0, "")
        .unionByName(role("click", 1, "c"))
        .unionByName(role("view", 1, "v"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "role", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = merged.select(
        "user_id",
        "ts",
        "role",
        "event_id",
        "label_value",
        F.last("c_feat", ignorenulls=True).over(w).alias("lc"),
        F.last("v_feat", ignorenulls=True).over(w).alias("lv"),
    ).filter(F.col("role") == 0)
    return out.select(
        "event_id",
        "user_id",
        "label_value",
        F.col("lc.value").alias("click_value"),
        F.col("lv.value").alias("view_value"),
        (F.unix_micros("ts") - F.unix_micros("lc.ts"))
        .cast("bigint")
        .alias("click_age_us"),
        (F.unix_micros("ts") - F.unix_micros("lv.ts"))
        .cast("bigint")
        .alias("view_age_us"),
    )


@query(
    "join_shuffle_merge_hint",
    oracle="""
SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_totalprice > 400000
""",
    category="C",
)
def join_shuffle_merge_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGE join-strategy hint: forces a sort-merge join where the
    optimizer would pick broadcast — the right call when BOTH sides are
    too large to broadcast but arrive pre-sorted/bucketed on the key, or
    when broadcast OOM risk must be excluded (the q18 discussion in
    workloads/tpch.py is the mirror-image case). Results are
    strategy-independent; the plan shape is pinned in tests/test_plans.py
    — this key exists to keep the hint surface exercised and correct."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c.hint("merge"), o.o_custkey == c.c_custkey)
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
    )


@query(
    "join_asof_forward",
    oracle="""
SELECT p.event_id,
       (SELECT MIN(c.ts) FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts > p.ts)
           AS next_click_ts
FROM events p
WHERE p.event_type = 'purchase'
""",
    category="C",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each purchase matched to the EARLIEST strictly
    -later click of the same user — the look-ahead twin of ``join_asof``
    (next-touch attribution, time-to-next-action). Same single-shuffle
    pattern: union the roles, sort within user, carry the next click
    backward with a first(ignorenulls) over the FOLLOWING frame; at
    equal timestamps clicks sort before purchases so "strictly later"
    holds (mirror of the backward key's role bit)."""
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("click_ts"),
        F.lit(0).alias("role"),  # clicks sort before purchases at equal ts
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(1).alias("role"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "role")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "next_click_ts", F.first("click_ts", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("role") == 1).select(
        "event_id", "next_click_ts"
    )
