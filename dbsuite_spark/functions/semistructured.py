"""Category H (part 3) — array / map / JSON / explode batteries (SURVEY §2H).

These extend the reference's scalar surface to the nested types the fixture
tables carry (``embeddings.embedding`` array<float>, ``events.props`` JSON)
— driver-mandated extensions [SURVEY §2H provenance column].

Scale notes: higher-order array functions (transform/filter/aggregate) run
inside codegen on the JVM — per-row lambdas never touch Python, so a 64-dim
fold costs the same relative overhead at 100 TB. Explode multiplies rows
(64× here): at scale, explode into an aggregation in the same stage (no
shuffle of the exploded form) — exactly the shape `fn_explode_unnest` uses.

Cross-engine notes (probed on DuckDB 1.0.0):
- Spark `array_distinct` keeps first-occurrence order, DuckDB
  `list_distinct` doesn't guarantee order → both wrapped in a sort.
- Element arithmetic is cast to DOUBLE on both sides before folding —
  float32 accumulation order/width would otherwise diverge.
- Folds are sequential left-to-right in both engines → bit-identical
  double sums.
- double→string rendering differs between engines, so map values carried
  as strings are round-tripped back to DOUBLE before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsuite_spark.registry import query
from dbsuite_spark.tables import fan_out, t


@query(
    "fn_array_core",
    oracle="""
WITH base AS (
  SELECT vec_id,
         CAST(len(embedding) AS BIGINT)                 AS dim,
         CAST(embedding[1] AS DOUBLE)                   AS first_elem,
         list_contains(embedding, embedding[1])         AS has_first,
         list_transform(list_slice(embedding, 1, 3),
                        x -> CAST(x AS DOUBLE))         AS h3,
         list_sort(list_transform(list_slice(embedding, 1, 5),
                                  x -> CAST(x AS DOUBLE))) AS h5s,
         list_sort(list_distinct(
             list_transform(list_slice(embedding, 1, 8),
                            x -> CAST(x AS DOUBLE))))   AS dd
  FROM embeddings
)
SELECT vec_id, dim, first_elem, has_first,
       h3[1] AS h3_1, h3[2] AS h3_2, h3[3] AS h3_3,
       h5s[1] AS h5s_1, h5s[2] AS h5s_2, h5s[3] AS h5s_3,
       h5s[4] AS h5s_4, h5s[5] AS h5s_5,
       CAST(len(dd) AS BIGINT) AS dd_n,
       dd[1] AS dd_min, dd[len(dd)] AS dd_max
FROM base
""",
    category="H",
)
def fn_array_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / element_at / slice / array_contains / array_sort /
    array_distinct on the 64-dim embedding column. Spark slice(col, 1, 3) ≡
    DuckDB list_slice(col, 1, 3) (both 1-based, length vs end — probed).
    The array intermediates are probed element-wise in the final select —
    no array column survives to the projection (driver-hash discipline);
    float32 elements are cast to DOUBLE (exact) so both engines hash the
    same 64-bit value."""
    e = t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    as_dbl = lambda a: F.transform(a, lambda x: x.cast("double"))  # noqa: E731
    h3 = as_dbl(F.slice(emb, 1, 3))
    h5s = F.array_sort(as_dbl(F.slice(emb, 1, 5)))
    dd = F.array_sort(F.array_distinct(as_dbl(F.slice(emb, 1, 8))))
    return e.select(
        "vec_id",
        F.size(emb).cast("bigint").alias("dim"),
        F.element_at(emb, 1).cast("double").alias("first_elem"),
        F.array_contains(emb, F.element_at(emb, 1)).alias("has_first"),
        F.element_at(h3, 1).alias("h3_1"),
        F.element_at(h3, 2).alias("h3_2"),
        F.element_at(h3, 3).alias("h3_3"),
        F.element_at(h5s, 1).alias("h5s_1"),
        F.element_at(h5s, 2).alias("h5s_2"),
        F.element_at(h5s, 3).alias("h5s_3"),
        F.element_at(h5s, 4).alias("h5s_4"),
        F.element_at(h5s, 5).alias("h5s_5"),
        F.size(dd).cast("bigint").alias("dd_n"),
        F.element_at(dd, 1).alias("dd_min"),
        F.element_at(dd, -1).alias("dd_max"),
    )


@query(
    "fn_array_higher_order",
    oracle="""
SELECT vec_id,
       list_transform(embedding, x -> CAST(x AS DOUBLE) * 2)[1]   AS doubled_1,
       list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * 2),
                   (a, b) -> a + b)                                AS doubled_sum,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT)    AS n_pos,
       list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                   (a, b) -> a + b)                                AS elem_sum,
       sqrt(list_reduce(list_transform(embedding,
                                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                        (a, b) -> a + b))                          AS l2_norm
FROM embeddings
""",
    category="H",
)
def fn_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSFORM / FILTER / AGGREGATE lambdas (L2 norm of the embedding —
    the same fold the category-L similarity keys build on). Sequential
    left-fold in double on both engines → bit-identical. The transformed
    array is probed via its first element + its full sequential fold (every
    element contributes) so no array column reaches the final select."""
    e = t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    doubled = F.transform(emb, lambda x: x.cast("double") * 2)
    as_double = F.transform(emb, lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.element_at(doubled, 1).alias("doubled_1"),
        F.aggregate(doubled, F.lit(0.0), lambda a, x: a + x).alias(
            "doubled_sum"
        ),
        F.size(F.filter(emb, lambda x: x > 0)).cast("bigint").alias("n_pos"),
        F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x).alias(
            "elem_sum"
        ),
        F.sqrt(
            F.aggregate(
                emb,
                F.lit(0.0),
                lambda a, x: a + x.cast("double") * x.cast("double"),
            )
        ).alias("l2_norm"),
    )


@query(
    "fn_explode_unnest",
    oracle="""
SELECT doc_id,
       unnest(string_split(text, ' '))                    AS token
FROM documents
""",
    category="H",
)
def fn_explode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode a token array to rows (UDTF-shaped, built-in generator).
    ~100 tokens/doc → 100× row multiplication; safe at scale because the
    generate happens post-scan with no shuffle of the exploded rows."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.explode(F.split(F.col("text"), " ")).alias("token"),
    )


@query(
    "fn_map_ops",
    oracle="""
SELECT event_id,
       event_type                               AS typ,
       CAST(2 AS BIGINT)                        AS n_keys,
       CAST(3 AS BIGINT)                        AS n_keys2,
       'type,uid'                               AS keys_sorted,
       value                                    AS v_roundtrip
FROM events
""",
    category="H",
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create_map / map_concat / map_keys / element_at(map, k). The oracle
    states the algebraically-expected flattened output (DuckDB MAP fetch
    shapes differ), so the check still hash-verifies every map op's result.
    Doubles round-trip map<string,string> → back to DOUBLE (rendering-safe).
    map_keys is serialized with array_join — no array/map column in the
    final select (driver-hash discipline)."""
    e = t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    m2 = F.map_concat(m, F.create_map(F.lit("v"), F.col("value").cast("string")))
    return e.select(
        "event_id",
        F.element_at(m, "type").alias("typ"),
        F.size(m).cast("bigint").alias("n_keys"),
        F.size(m2).cast("bigint").alias("n_keys2"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m2, "v").cast("double").alias("v_roundtrip"),
    )


@query(
    "fn_json_extract",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k')                  AS k_str,
       CAST(json_extract_string(props, '$.k') AS INT)     AS k_int,
       CAST(json_extract_string(props, '$.missing') AS INT) AS k_missing
FROM events
""",
    category="H",
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse ``events.props`` JSON: string path extraction
    (get_json_object) + schema-typed extraction (from_json). Missing paths
    yield NULL on both engines."""
    # fan_out on the 2-column projection: double JSON parse per row is
    # the CPU; a narrow scan must not run it single-task. Round-14:
    # keyed on event_id — skips the keyless repartition's local
    # sort-before-repartition of the heavy props strings (guide §2.5);
    # the projection is row-local, so results are order-independent.
    e = fan_out(
        t(spark, sf_dir, "events").select("event_id", "props"),
        key="event_id",
    )
    parsed = F.from_json(F.col("props"), "k INT, missing INT")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed["k"].alias("k_int"),
        parsed["missing"].alias("k_missing"),
    )


@query(
    "fn_json_construct",
    oracle="""
SELECT o_orderkey,
       to_json(struct_pack(order_id := o_orderkey,
                           status := o_orderstatus,
                           priority := o_orderpriority)) AS j
FROM orders
""",
    category="H",
)
def fn_json_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a JSON document from columns (to_json over a struct). Field
    order follows struct declaration and rendering is compact in both
    engines ({"a":1,"b":"x"} — probed), so strings compare byte-equal.
    Restricted to int/string fields: double rendering is engine-specific."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("order_id"),
                F.col("o_orderstatus").alias("status"),
                F.col("o_orderpriority").alias("priority"),
            )
        ).alias("j"),
    )


@query(
    "fn_variant_extract",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT)       AS k_int,
       json_extract_string(props, '$.k')                    AS k_str,
       CAST(json_extract_string(props, '$.missing') AS INT) AS k_missing,
       CAST(event_id % 7 AS INT)                            AS a1
FROM events
""",
    category="H",
)
def fn_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path: ``parse_json`` → binary variant encoding →
    typed ``variant_get`` extraction (the modern replacement for
    string-walking ``get_json_object``; variant decode is columnar and
    ~an order of magnitude cheaper on deep JSON at scale). Missing paths
    via ``try_variant_get`` → NULL; a constructed nested document proves
    array indexing inside the variant. DuckDB mirrors with its JSON
    extractors on the same documents."""
    e = t(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    nested = F.parse_json(
        F.concat(
            F.lit('{"a": ['),
            (F.col("event_id") % 5).cast("string"),
            F.lit(", "),
            (F.col("event_id") % 7).cast("string"),
            F.lit("]}"),
        )
    )
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "int").alias("k_missing"),
        F.variant_get(nested, "$.a[1]", "int").alias("a1"),
    )


_STRUCT_ORACLE = """
WITH s AS (
  SELECT o_orderkey,
         struct_pack(status := o_orderstatus,
                     priority := o_orderpriority,
                     total := CAST(o_totalprice AS DOUBLE)) AS o
  FROM orders)
SELECT o_orderkey,
       o.status AS status,
       o.priority AS priority,
       o.total AS total,
       o.status = 'F' AND o.total > 100000 AS big_filled,
       struct_pack(k := o_orderkey, s := o.status) =
         struct_pack(k := o_orderkey, s := 'F') AS is_filled_pair
FROM s
"""


@query("fn_struct_ops", oracle=_STRUCT_ORACLE, category="H")
def fn_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT battery — build (named_struct / struct_pack), field access,
    predicates over fields, and whole-struct equality: the nested-row
    surface every semi-structured warehouse schema leans on (DB2's
    anchored ROW types are the dialect ancestor). The final projection
    flattens to scalars (nested values are not driver-hashable — the
    compare.py contract), so the oracle is a full hash oracle.

    Scale: pure row-local expression work, whole-stage codegen, zero
    shuffle — struct build/access compiles to column references."""
    o = t(spark, sf_dir, "orders")
    s = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").cast("double").alias("total"),
        ).alias("o"),
    )
    return s.select(
        "o_orderkey",
        F.col("o.status").alias("status"),
        F.col("o.priority").alias("priority"),
        F.col("o.total").alias("total"),
        ((F.col("o.status") == "F") & (F.col("o.total") > 100000)).alias(
            "big_filled"
        ),
        (
            F.struct(
                F.col("o_orderkey").alias("k"), F.col("o.status").alias("s")
            )
            == F.struct(
                F.col("o_orderkey").alias("k"), F.lit("F").alias("s")
            )
        ).alias("is_filled_pair"),
    )
