"""Category J — user-defined function surface (SURVEY §2J).

Reference semantics: dbsuite parsed DB2 ``CREATE FUNCTION`` (SQL-bodied and
external scalar/table functions) [PUBLIC, module-level; checkout empty —
SURVEY §0]; our execution surface is the PySpark UDx family.

Scale discipline (SURVEY guide: UDFs are the slow path):
- Row-at-a-time Python UDFs exist in the surface because the reference
  dialect had external scalar functions — but the oracle shows each one is
  expressible as built-ins; at 100 TB the codegen form wins ~10-100×.
- Pandas (Arrow-vectorized) UDFs amortize the Python boundary per batch —
  the acceptable form when Python is genuinely needed.
- The grouped UDAF (trimmed mean) sums via ``decimal.Decimal`` so the
  result is bit-identical to the oracle's DECIMAL(18,6) sum — same
  exactness discipline as the JVM-side aggregates (SURVEY §7.4.1).
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from decimal import Decimal

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbsuite_spark.registry import query
from dbsuite_spark.tables import register_views, t


@query(
    "udf_python_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_discount < 0.03 THEN 'low'
            WHEN l_discount < 0.07 THEN 'mid'
            ELSE 'high' END AS disc_band
FROM lineitem
""",
    category="J",
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (discount banding) — the DB2 external
    scalar function analog. The oracle proves the logic is CASE-expressible
    (and the built-in form is what a 100 TB run should use)."""

    @F.udf("string")
    def disc_band(d: float) -> str:
        if d < 0.03:
            return "low"
        if d < 0.07:
            return "mid"
        return "high"

    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", disc_band("l_discount").alias("disc_band")
    )


@query(
    "udf_pandas_vectorized",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem
""",
    category="J",
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar UDF: the same pricing expression computed in
    pandas per batch. Element-wise IEEE double ops are order-free, so the
    values are bit-identical to the SQL form on both engines."""

    @F.pandas_udf("double")
    def net_price(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc)

    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_price("l_extendedprice", "l_discount").alias("net_price"),
    )


@query(
    "udf_sql_registered",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 300000 THEN 'jumbo'
            WHEN o_totalprice >= 150000 THEN 'large'
            ELSE 'regular' END AS order_class,
       o_totalprice
FROM orders
""",
    category="J",
)
def udf_sql_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDF registered into the SQL namespace (DB2 CREATE FUNCTION + use in
    a query): ``spark.udf.register`` then called from ``spark.sql``."""

    def order_class(p: float) -> str:
        if p >= 300000:
            return "jumbo"
        if p >= 150000:
            return "large"
        return "regular"

    spark.udf.register("order_class", order_class, "string")
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey,
               order_class(o_totalprice) AS order_class,
               o_totalprice
        FROM orders
        """
    )


@query(
    "udaf_pandas_grouped",
    oracle="""
WITH ranked AS (
  SELECT o_orderstatus, o_totalprice,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM orders)
SELECT o_orderstatus,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
           AS trimmed_mean,
       CAST(COUNT(*) AS BIGINT) AS n_kept
FROM ranked
WHERE rn > floor(n * 0.1) AND rn <= n - floor(n * 0.1)
GROUP BY o_orderstatus
""",
    category="J",
)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped custom aggregate via applyInPandas: 10%-trimmed mean of
    order value per status. Trimming cuts by count over sorted values, so
    boundary ties keep the same value multiset as the oracle's window
    formulation; the sum runs in exact Decimal → bit-identical mean."""

    def trimmed(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = sorted(pdf["o_totalprice"].tolist())
        n = len(vals)
        k = int(n * 0.1)
        kept = vals[k : n - k] if n - 2 * k > 0 else vals
        total = sum((Decimal(repr(v)) for v in kept), Decimal(0))
        return pd.DataFrame(
            {
                "o_orderstatus": [pdf["o_orderstatus"].iloc[0]],
                "trimmed_mean": [float(total) / len(kept)],
                "n_kept": [len(kept)],
            }
        )

    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").applyInPandas(
        trimmed, "o_orderstatus string, trimmed_mean double, n_kept bigint"
    )


@query(
    "udtf_python",
    oracle="""
SELECT event_id, k AS key, json_extract_string(props, '$.' || k) AS value
FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events)
""",
    category="J",
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (DB2 external table function analog): one row → many,
    parsing the ``props`` JSON object into (key, value) rows via a LATERAL
    join in SQL."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="key string, value string")
    class ParseProps:
        def eval(self, props: str):
            for k, v in json.loads(props).items():
                yield k, str(v)

    spark.udtf.register("parse_props", ParseProps)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT e.event_id, p.key, p.value
        FROM events e, LATERAL parse_props(e.props) p
        """
    )


@query(
    "udf_arrow_scalar",
    oracle="""
SELECT o_orderkey,
       CAST(floor(o_totalprice / 1000) * 1000 AS DOUBLE) AS price_bucket,
       upper(o_orderpriority) AS prio_uc
FROM orders
""",
    category="J",
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Arrow-optimized Python UDF (``useArrow=True``): scalar
    semantics like the classic row UDF but with Arrow-batch transfer —
    the recommended replacement when pandas-UDF typing is overkill.
    Bucketing math is floor/multiply in IEEE double → engine-exact; the
    oracle proves SQL-expressibility (what a hot path should use)."""

    @F.udf(returnType="double", useArrow=True)
    def price_bucket(p: float) -> float:
        # math.floor(p / 1000), not p // 1000: floordiv computes via fmod
        # (exact) while SQL floor(x/1000) floors the IEEE quotient — they
        # disagree for doubles an ulp below a multiple of 1000.
        import math

        return math.floor(p / 1000) * 1000.0

    @F.udf(returnType="string", useArrow=True)
    def prio_uc(s: str) -> str:
        return s.upper()

    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        price_bucket("o_totalprice").alias("price_bucket"),
        prio_uc("o_orderpriority").alias("prio_uc"),
    )


@query(
    "udtf_analyze_polymorphic",
    oracle="""
SELECT event_id, 'event_type' AS col_name, event_type AS col_value
FROM events WHERE event_id % 10 = 0
UNION ALL
SELECT event_id, 'user_id', CAST(user_id AS VARCHAR)
FROM events WHERE event_id % 10 = 0
UNION ALL
SELECT event_id, 'value', CAST(CAST(floor(value * 1000000) AS BIGINT) AS VARCHAR)
FROM events WHERE event_id % 10 = 0
""",
    category="J",
)
def udtf_analyze_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 polymorphic UDTF: the ``analyze()`` static method computes
    the output schema FROM THE CALL SITE (here: which columns to unpivot,
    passed as a constant), the table-function analog of DB2's generic
    table functions. The UDTF melts the selected columns to
    (col_name, col_value) rows; doubles are rendered as floored
    micro-unit integers (``floor(v * 1e6)``) because the IEEE product and
    floor are bit-identical in Python and DuckDB, whereas double→DECIMAL
    casts round ties differently across engines. NULLs melt to SQL NULL,
    not the string 'None'.

    Scale: per-row generation inside Arrow batches, no shuffle; schema
    resolution happens once at analysis time, not per row."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class MeltColumns:
        @staticmethod
        def analyze(row: AnalyzeArgument, cols: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for f in row.dataType.fields:
                if f.name == "event_id":
                    schema = schema.add("event_id", f.dataType)
            schema = schema.add("col_name", "string")
            schema = schema.add("col_value", "string")
            return AnalyzeResult(schema=schema)

        def eval(self, row, cols: str):
            import math as _m

            for name in cols.split(","):
                v = row[name]
                if v is None:
                    sv = None  # SQL NULL, not the string 'None'
                elif isinstance(v, float):
                    # floored micro-units: v * 1e6 is the same IEEE
                    # product on both engines and floor is exact, so the
                    # rendering is bit-identical to the oracle's
                    # CAST(floor(value * 1000000) AS BIGINT)
                    sv = str(_m.floor(v * 1_000_000))
                else:
                    sv = str(v)
                yield row["event_id"], name, sv

    spark.udtf.register("melt_columns", MeltColumns)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT m.event_id, m.col_name, m.col_value
        FROM (SELECT * FROM events WHERE event_id % 10 = 0) e,
             LATERAL melt_columns(struct(e.event_id, e.event_type,
                                         e.user_id, e.value),
                                  'event_type,user_id,value') m
        """
    )


@query(
    "udf_pandas_iter_scalar",
    oracle="""
SELECT doc_id,
       round(CAST(n_chars AS DOUBLE) / (1.0 + abs(ln(1.0 + n_chars))), 6)
           AS model_score
FROM documents
""",
    category="J",
)
def udf_pandas_iter_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series pandas UDF (``Iterator[pd.Series] ->
    Iterator[pd.Series]``) — the batched-inference surface: expensive
    per-worker setup (model load, tokenizer init) runs ONCE before the
    batch loop instead of per batch, which is the shape every
    LLM-scoring pipeline uses on Spark. The 'model' here is a
    deterministic closed-form scorer so the oracle can replay it in SQL;
    swapping in a real forward pass changes only the loop body.

    Scale: identical Arrow batch transfer to the scalar pandas UDF, plus
    amortized initialization; state lives per python worker, never per
    row."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def model_score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        # Expensive one-time setup would go here (model/tokenizer load);
        # the deterministic stand-in keeps the oracle closed-form.
        def forward(x: pd.Series) -> pd.Series:
            v = x.astype("float64")
            return (v / (1.0 + np.abs(np.log1p(v)))).round(6)

        for batch in batches:
            yield forward(batch)

    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", model_score(F.col("n_chars")).alias("model_score")
    )


@query(
    "udf_map_in_arrow",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(n_chars % 97 AS BIGINT) AS checksum_mod
FROM documents
""",
    category="J",
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the zero-copy batch surface below pandas: the
    function receives raw ``pyarrow.RecordBatch``es (no pandas
    conversion, no index materialization) and emits batches, the right
    level for byte-oriented work (hashing, codec framing, feature
    packing) where pandas object-dtype overhead dominates. Computes
    UTF-8 byte lengths and a modular checksum per document with Arrow
    compute kernels only.

    Scale: per-partition streaming over Arrow batches, no shuffle; the
    batch size rides ``spark.sql.execution.arrow.maxRecordsPerBatch``,
    so memory per task is bounded regardless of corpus size."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def arrow_features(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            text = tbl.column("text")
            n_bytes = pc.binary_length(
                pc.cast(text, pa.binary())
            ).cast(pa.int64())
            checksum = pc.cast(
                pc.subtract(
                    tbl.column("n_chars"),
                    pc.multiply(
                        pc.divide(tbl.column("n_chars"), pa.scalar(97)),
                        pa.scalar(97),
                    ),
                ),
                pa.int64(),
            )
            out = pa.table(
                {
                    "doc_id": tbl.column("doc_id"),
                    "n_bytes": n_bytes,
                    "checksum_mod": checksum,
                }
            )
            yield from out.to_batches()

    d = t(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    return d.mapInArrow(
        arrow_features,
        "doc_id bigint, n_bytes bigint, checksum_mod bigint",
    )


@query(
    "udx_pandas_cogrouped",
    oracle="""
WITH ev AS (
  SELECT user_id AS key_id, COUNT(*) AS n_events,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np
  FROM events GROUP BY 1),
od AS (
  SELECT o_custkey AS key_id, COUNT(*) AS n_orders
  FROM orders GROUP BY 1)
SELECT COALESCE(ev.key_id, od.key_id) AS key_id,
       CAST(COALESCE(ev.n_events, 0) AS BIGINT) AS n_events,
       CAST(COALESCE(ev.np, 0) AS BIGINT) AS n_purchases,
       CAST(COALESCE(od.n_orders, 0) AS BIGINT) AS n_orders
FROM ev FULL OUTER JOIN od ON ev.key_id = od.key_id
""",
    category="J",
)
def udx_pandas_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped ``applyInPandas`` — the two-sided custom-merge surface
    (``groupBy().cogroup()``): both tables co-partition on the key and
    each key's two pandas frames arrive together, the hook for custom
    as-of merges, interleaved sessionization, or per-entity
    reconciliation that SQL joins can't express row-wise. Demonstrated
    with an integer-only per-key activity/order profile so the oracle is
    a plain FULL OUTER of two group-counts (counting is order-free, so
    the pandas path is trivially engine-exact).

    Scale: one hash shuffle per side on the shared key, Arrow-batched
    transfer, per-key memory bounded by that key's rows — the same
    co-partitioning a SQL full-outer would plan, plus arbitrary Python
    semantics inside."""
    e = t(spark, sf_dir, "events").select("user_id", "event_type")
    o = t(spark, sf_dir, "orders").select("o_custkey")

    def profile(key, ev: pd.DataFrame, od: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key_id": [key[0]],
                "n_events": [len(ev)],
                "n_purchases": [int((ev["event_type"] == "purchase").sum())
                                if len(ev) else 0],
                "n_orders": [len(od)],
            }
        )

    return (
        e.groupBy("user_id")
        .cogroup(o.groupBy("o_custkey"))
        .applyInPandas(
            profile,
            "key_id bigint, n_events bigint, n_purchases bigint, "
            "n_orders bigint",
        )
    )


@query(
    "udf_pandas_window_agg",
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
       CAST(sum(CAST(l_quantity AS BIGINT)) OVER w AS DOUBLE)
         / count(*) OVER w AS roll_mean_qty
FROM lineitem
WINDOW w AS (PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber,
                      l_quantity, l_extendedprice
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
""",
    category="J",
)
def udf_pandas_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF evaluated over a bounded window frame —
    the Spark surface for custom rolling aggregates when no built-in
    fits (each frame's values arrive as one pandas Series per row). Here
    the custom aggregate is a rolling mean of an INTEGRAL measure, so
    the Arrow-side float64 sum is exact (values ≤ 50, frames of ≤ 4) and
    the single division matches the SQL twin bit-for-bit; a real
    deployment swaps the body for the custom statistic.

    Scale: bounded-frame pandas aggregation ships one Arrow batch per
    partition — the frame never crosses partitions, and the 10-or-fewer
    row frames keep the per-row Python cost at vectorized-batch rates.
    The frame sort reuses the fixture's non-unique-key tiebreak
    discipline (see win_rolling_ols_slope)."""
    li = t(spark, sf_dir, "lineitem")

    @F.pandas_udf("double")
    def roll_mean(v: pd.Series) -> float:
        return float(v.sum()) / len(v)

    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(
            "l_shipdate", "l_orderkey", "l_linenumber",
            "l_quantity", "l_extendedprice",
        )
        .rowsBetween(-3, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        roll_mean("l_quantity").over(w).alias("roll_mean_qty"),
    )
