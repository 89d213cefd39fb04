"""Category A — scans, sources, sinks, catalog (SURVEY §2A).

Reference semantics: dbsuite's connectivity surface — DB2 IMPORT/EXPORT OF
DEL (delimited files with declared schemas), LOAD targets, SYSCAT catalog
reads, and native JDBC-style database access [PUBLIC, module-level;
checkout empty — SURVEY §0].

Spark-first design:
- Schemas for CSV/JSON ingest are DECLARED ``StructType``s, never inferred
  (SURVEY §1.1) — at 100 TB, schema inference is an extra full scan.
- Sinks write columnar Parquet partitioned by a pruning-friendly column;
  the read-back goes through partition discovery, which is what a
  downstream consumer would scan (partition pruning on the status column).
- The JDBC key does a real write+read round trip through the embedded
  Derby engine that ships with Spark — the same ``spark.read.jdbc`` path a
  warehouse extract would use, minus the network. On a cluster the same
  code takes ``numPartitions``/``partitionColumn`` to parallelize the pull.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbsuite_spark.etl.io import artifact_path
from dbsuite_spark.exact import DSUM
from dbsuite_spark.registry import query
from dbsuite_spark.tables import FIXTURE_SCHEMA, TABLES, t

ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

EVENTS_JSON_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

@query(
    "scan_parquet",
    oracle="SELECT * FROM lineitem",
    category="A",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Parquet scan of the fact table. The vectorized reader + footer
    schema make this the baseline every other operator builds on."""
    return t(spark, sf_dir, "lineitem")


@query(
    "scan_csv_typed",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       o_orderdate, o_orderpriority
FROM orders
""",
    category="A",
)
def scan_csv_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DB2 ``IMPORT ... OF DEL``: delimited file ingested under a DECLARED
    StructType. The fixture is round-tripped orders→CSV→typed read; the
    oracle is the source table, so the check proves the CSV path is
    lossless (doubles via shortest-repr, timestamps via the ISO-8601
    default shared by writer and reader)."""
    path = artifact_path(sf_dir, "orders_csv")
    src = t(spark, sf_dir, "orders").select(*[f.name for f in ORDERS_SCHEMA])
    src.write.mode("overwrite").option("header", True).csv(path)
    return (
        spark.read.schema(ORDERS_SCHEMA).option("header", True).csv(path)
    )


@query(
    "scan_json",
    oracle="SELECT event_id, event_type, user_id, value FROM events",
    category="A",
)
def scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newline-JSON ingest with declared schema (no inference pass)."""
    path = artifact_path(sf_dir, "events_json")
    src = t(spark, sf_dir, "events").select(*[f.name for f in EVENTS_JSON_SCHEMA])
    src.write.mode("overwrite").json(path)
    return spark.read.schema(EVENTS_JSON_SCHEMA).json(path)


@query(
    "sink_parquet",
    oracle=f"""
SELECT o_orderpriority,
       {DSUM('o_totalprice')} AS total_price,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       o_orderstatus
FROM orders
GROUP BY o_orderstatus, o_orderpriority
""",
    category="A",
)
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOAD/EXPORT replacement: aggregate → Parquet partitioned by status →
    read back through partition discovery. Partitioning by the low-cardinality
    status column is what enables partition pruning for downstream scans at
    100 TB (date-derived columns in real fact loads, SURVEY §4)."""
    path = artifact_path(sf_dir, "orders_summary_parquet")
    agg = (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_price"),
            F.count("*").alias("n_orders"),
        )
    )
    agg.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    return spark.read.parquet(path)


@query(
    "sink_csv",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
FROM lineitem
WHERE l_returnflag = 'R'
""",
    category="A",
)
def sink_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DB2 ``EXPORT ... OF DEL``: header CSV write + typed read-back."""
    path = artifact_path(sf_dir, "lineitem_r_csv")
    schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_quantity", T.DoubleType()),
        ]
    )
    src = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(*[f.name for f in schema])
    )
    src.write.mode("overwrite").option("header", True).csv(path)
    return spark.read.schema(schema).option("header", True).csv(path)


@query(
    "catalog_introspect",
    oracle="""
SELECT table_name, column_name
FROM information_schema.columns
WHERE table_name IN ('region','nation','customer','supplier','part',
                     'orders','lineitem','events','documents','embeddings')
""",
    category="A",
)
def catalog_introspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SYSCAT.COLUMNS equivalent: enumerate (table, column) pairs through
    ``spark.catalog`` — the in-scope remnant of dbmakedoc's input plugins.
    Catalog metadata is tiny and driver-side by nature; the DataFrame is
    built from it for uniformity with the rest of the contract."""
    from dbsuite_spark.tables import register_views

    register_views(spark, sf_dir)
    rows = [
        (tbl, col.name)
        for tbl in TABLES
        for col in spark.catalog.listColumns(tbl)
    ]
    return spark.createDataFrame(rows, "table_name string, column_name string")


@query(
    "scan_jdbc",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    category="A",
)
def scan_jdbc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External-RDBMS access (dbsuite's native mode was a DB2 client
    connection): write ``nation`` into the embedded Derby engine bundled
    with Spark, then ``spark.read.jdbc`` it back. Derby uppercases
    unquoted identifiers, so the read-back columns are re-lowered —
    after which the round-trip is lossless and carries a FULL hash oracle
    (the nation table itself). On a real cluster the same reader
    parallelizes with partitionColumn/numPartitions."""
    url = f"jdbc:derby:{artifact_path(sf_dir, 'derby_db')};create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    src = t(spark, sf_dir, "nation")
    src.write.mode("overwrite").jdbc(url, "nation_jdbc", properties=props)
    df = spark.read.jdbc(url, "nation_jdbc", properties=props)
    return df.select([F.col(c).alias(c.lower()) for c in df.columns])


@query(
    "scan_orc",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem WHERE l_quantity < 10
""",
    category="A",
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip (the second columnar format DB2 LOAD ecosystems
    commonly exchange): write a lineitem projection as ORC, read it back
    with a quantity predicate — Spark's ORC reader pushes the filter into
    stripe/row-group elimination exactly as Parquet does (search-argument
    pushdown), so format choice doesn't change the 100 TB scan story."""
    path = artifact_path(sf_dir, "lineitem_orc")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    li.write.mode("overwrite").orc(path)
    return spark.read.orc(path).filter(F.col("l_quantity") < 10)


@query(
    "scan_python_datasource",
    oracle="""
SELECT i AS row_id,
       CAST((i * 37) % 1000 AS DOUBLE) / 10.0 AS score,
       'p' || CAST(i % 4 AS VARCHAR) AS part_tag
FROM range(0, 2000) t(i)
WHERE (i * 37) % 1000 >= 500
""",
    category="A",
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python DataSource API — the extensibility path for custom
    connectors (the analog of the reference's pluggable input readers):
    a DataSource subclass declares the schema and a partition-parallel
    reader; each InputPartition generates its slice independently, so the
    source scales out like any file format. Rows are a deterministic
    arithmetic sequence, making the source fully hash-verifiable against
    a ``range()``-based oracle. Per-partition generation is pure Python
    yielding tuples — Spark batches them through Arrow."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    n_rows, n_parts = 2000, 4

    class _SyntheticReader(DataSourceReader):
        def partitions(self):
            return [InputPartition(p) for p in range(n_parts)]

        def read(self, partition):
            # Partition p owns rows where i % n_parts == p: deterministic,
            # disjoint, order-free — the same rows on any executor layout.
            for i in range(partition.value, n_rows, n_parts):
                yield (i, float((i * 37) % 1000) / 10.0, f"p{i % n_parts}")

    class SyntheticSource(DataSource):
        @classmethod
        def name(cls):
            return "dbsuite_synthetic"

        def schema(self):
            return StructType(
                [
                    StructField("row_id", LongType()),
                    StructField("score", DoubleType()),
                    StructField("part_tag", StringType()),
                ]
            )

        def reader(self, schema):
            return _SyntheticReader()

    spark.dataSource.register(SyntheticSource)
    return (
        spark.read.format("dbsuite_synthetic")
        .load()
        .filter(F.col("score") >= 50.0)
    )


# Neutral type names shared by the catalog_document key and its oracle —
# the Spark side DERIVES these from the live schema (so fixture type
# drift breaks the hash loudly), the oracle hard-codes the expectation.
_NEUTRAL_TYPES = {
    "int": "int32",
    "bigint": "int64",
    "float": "float32",
    "double": "float64",
    "string": "string",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "array<float>": "array<float32>",
}

# Derived from the single canonical descriptor in tables.FIXTURE_SCHEMA
# (ADVICE r02: the schema-drift canary and this oracle must not be two
# hand-maintained copies that can drift apart).
_DOC_SCHEMA: dict[str, list[tuple[str, str]]] = {
    tbl: [(col, _NEUTRAL_TYPES[st]) for col, st in cols]
    for tbl, cols in FIXTURE_SCHEMA.items()
}


def _catalog_document_oracle() -> str:
    parts = []
    for tbl, cols in _DOC_SCHEMA.items():
        for i, (col, ntype) in enumerate(cols, start=1):
            parts.append(f"""
SELECT '{tbl}' AS table_name, '{col}' AS column_name,
       {i} AS ordinal, '{ntype}' AS data_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT "{col}") AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN "{col}" IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_count
FROM {tbl}""")
    return "\nUNION ALL".join(parts)


@query(
    "catalog_document",
    oracle=_catalog_document_oracle(),
    category="A",
)
def catalog_document(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full schema-documentation dataset — the dbmakedoc analog: one row
    per column of every fixture table with its neutral type name, table
    row count, exact distinct count, and null count. The type column is
    DERIVED from the live Spark schema (fixture type drift breaks the
    hash loudly, same spirit as tests/test_fixture_schemas.py).

    Scale: one single-pass aggregation per table computes all per-column
    distinct/null counts map-side (Catalyst's multi-distinct expand),
    emitted as two name→count MAP columns so the ten 1-row aggregates
    union into one tiny frame; the per-column rows come from a single
    map-explode joined to a broadcast literal descriptor table (explode
    over an array of structs referencing aggregate columns would
    duplicate the whole aggregate subtree — two scans per table,
    verified in tests/test_plans.py). No per-column re-scans, no
    driver-side data movement."""
    frames = []
    descriptors = []
    for tbl in TABLES:
        df = t(spark, sf_dir, tbl)
        fields = df.schema.fields
        names = [f.name for f in fields]
        descriptors.extend(
            (tbl, f.name, i + 1, _NEUTRAL_TYPES[f.dataType.simpleString()])
            for i, f in enumerate(fields)
        )
        agg = df.agg(
            F.count(F.lit(1)).alias("__n"),
            *[F.countDistinct(n).alias(f"__d_{n}") for n in names],
            *[
                F.sum(F.when(F.col(n).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias(f"__z_{n}")
                for n in names
            ],
        )
        frames.append(
            agg.select(
                F.lit(tbl).alias("table_name"),
                F.col("__n").alias("n_rows"),
                F.map_from_arrays(
                    F.array(*[F.lit(n) for n in names]),
                    F.array(*[F.col(f"__d_{n}") for n in names]),
                ).alias("dmap"),
                F.map_from_arrays(
                    F.array(*[F.lit(n) for n in names]),
                    F.array(*[F.col(f"__z_{n}") for n in names]),
                ).alias("zmap"),
            )
        )
    stats = frames[0]
    for fr in frames[1:]:
        stats = stats.unionAll(fr)
    desc = spark.createDataFrame(
        descriptors, "table_name string, column_name string, "
        "ordinal int, data_type string"
    )
    exploded = stats.select(
        "table_name",
        "n_rows",
        F.explode("dmap").alias("column_name", "n_distinct"),
        "zmap",
    ).select(
        "table_name",
        "column_name",
        "n_rows",
        "n_distinct",
        F.element_at("zmap", F.col("column_name")).alias("null_count"),
    )
    return exploded.join(
        F.broadcast(desc), ["table_name", "column_name"]
    ).select(
        "table_name", "column_name", "ordinal", "data_type",
        "n_rows", "n_distinct", "null_count",
    )


BINFILE_MOD = 10  # doc_id % 10 == 0 → the media subset


@query(
    "scan_binaryfile",
    oracle=f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5
FROM documents WHERE doc_id % {BINFILE_MOD} = 0
""",
    category="A",
)
def scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary ingestion through Spark's ``binaryFile`` source — the
    entry point of every multimodal pipeline (images/audio land as whole
    files; Spark lists the directory in parallel and each task reads its
    files into a ``content: binary`` column, no Python in the scan).

    The fixture media store is materialized from the documents table
    (each selected doc's UTF-8 bytes as ``doc_<id>.bin`` — deterministic,
    so the oracle recomputes byte length and md5 closed-form from
    ``text``; the file writes are test scaffolding, same as
    ``scan_jdbc``'s embedded-Derby load). The id is recovered from the
    file path, the payload is fingerprinted JVM-side (``md5(content)``)
    without ever decoding it — the schema/partitioning plumbing a real
    decode stage (``pipeline/media.py``) plugs into.

    Scale: directory listing is distributed and the per-file read is
    embarrassingly parallel; ``pathGlobFilter`` prunes non-matching files
    at listing time. Files ≫ 128 MB would need splitting upstream —
    binaryFile reads a file per task by design."""
    import os as _os
    import shutil as _shutil

    path = artifact_path(sf_dir, "doc_binfiles")
    _shutil.rmtree(path, ignore_errors=True)  # drop stale generations
    _os.makedirs(path, exist_ok=True)
    rows = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % BINFILE_MOD == 0)
        .select("doc_id", "text")
        .collect()  # bounded subset; scaffolding write, not the operator
    )
    for r in rows:
        with open(_os.path.join(path, f"doc_{r.doc_id}.bin"), "wb") as f:
            f.write(r.text.encode("utf-8"))

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(path)
    )
    return df.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


XML_MOD = 100  # o_orderkey % 100 == 0 → the XML exchange slice


@query(
    "scan_xml",
    oracle=f"""
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders WHERE o_orderkey % {XML_MOD} = 0
""",
    category="A",
)
def scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML exchange round-trip — Spark 4's built-in XML source (the
    ``rowTag`` reader previously in spark-xml), the B2B/legacy-feed
    format a DB2 shop's IMPORT pipelines commonly carry. A typed slice of
    orders is written as XML rows and read back under a DECLARED schema
    (inference over XML is an extra full scan at 100 TB, same rule as
    CSV/JSON here).

    Scale: XML files split per-file (not by byte range), so upstream
    should shard into many row-group-sized files — the write side here
    does that naturally via task parallelism; the read distributes one
    file per task."""
    path = artifact_path(sf_dir, "orders_xml")
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    )
    src = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % XML_MOD == 0)
        .select(*[f.name for f in schema])
    )
    (
        src.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "orders")
        .option("rowTag", "order")
        .save(path)
    )
    return (
        spark.read.format("xml")
        .option("rowTag", "order")
        .schema(schema)
        .load(path)
    )


CSV_CORRUPT_MOD = 10  # every 10th exported row is malformed
# Deterministic feed bound: the scaffolding collect() below is capped at
# CAP/20 rows NO MATTER the scale factor (a .limit() would be a
# nondeterministic subset and desync the closed-form oracle; a key-range
# cut is the same rows on every run and both engines).
CSV_FEED_KEY_CAP = 200_000


@query(
    "scan_csv_corrupt_permissive",
    oracle=f"""
WITH sliced AS (
  SELECT o_orderkey, o_totalprice,
         (o_orderkey % {CSV_CORRUPT_MOD} = 0) AS corrupt
  FROM orders WHERE o_orderkey % 20 = 0 AND o_orderkey < {CSV_FEED_KEY_CAP})
SELECT CAST(COUNT(*) FILTER (WHERE NOT corrupt) AS BIGINT) AS n_parsed,
       CAST(COUNT(*) FILTER (WHERE corrupt) AS BIGINT) AS n_corrupt,
       {DSUM('CASE WHEN NOT corrupt THEN o_totalprice END')} AS total_price
FROM sliced
""",
    category="A",
)
def scan_csv_corrupt_permissive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Malformed-input tolerance — DB2 IMPORT's rejected-row handling,
    Spark-style: a CSV feed where every {mod}th row carries an unparsable
    price is read in PERMISSIVE mode with ``columnNameOfCorruptRecord``;
    bad rows surface as (NULL-typed fields + raw line) instead of failing
    the load, and the summary separates parsed mass from the reject
    count. FAILFAST on the same file is the load-abort variant;
    DROPMALFORMED the silent one — PERMISSIVE is the only mode that
    preserves the evidence for a reject-side table at 100 TB.

    The corrupt file is generated deterministically from the orders slice
    (scaffolding write, like scan_jdbc's Derby load), so the oracle
    recomputes both populations closed-form."""
    import os as _os
    import shutil as _shutil

    path = artifact_path(sf_dir, "orders_corrupt_csv")
    _shutil.rmtree(path, ignore_errors=True)
    _os.makedirs(path, exist_ok=True)
    rows = (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderkey") % 20 == 0)
            & (F.col("o_orderkey") < CSV_FEED_KEY_CAP)
        )
        .select("o_orderkey", "o_totalprice")
        .collect()  # bounded by the key cap: ≤10k rows at ANY scale
    )
    with open(_os.path.join(path, "feed.csv"), "w") as f:
        f.write("o_orderkey,o_totalprice\n")
        for r in rows:
            if r.o_orderkey % CSV_CORRUPT_MOD == 0:
                f.write(f"{r.o_orderkey},NOT_A_PRICE,extra\n")
            else:
                f.write(f"{r.o_orderkey},{r.o_totalprice!r}\n")

    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )
    return df.agg(
        F.count(F.when(F.col("_corrupt").isNull(), 1)).alias("n_parsed"),
        F.count(F.col("_corrupt")).alias("n_corrupt"),
        F.sum(
            F.when(
                F.col("_corrupt").isNull(), F.col("o_totalprice")
            ).cast("decimal(18,6)")
        )
        .cast("double")
        .alias("total_price"),
    )


# Candidate foreign-key relations of the star schema: child column →
# parent key. dbmakedoc drew these from SYSCAT.REFERENCES; parquet lakes
# have no declared constraints, so the profiler PROVES them from data.
_FK_CANDIDATES: tuple[tuple[str, str, str, str], ...] = (
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("embeddings", "vec_id", "documents", "doc_id"),
)


def _fk_oracle() -> str:
    parts = []
    for child, ccol, parent, pcol in _FK_CANDIDATES:
        parts.append(f"""
SELECT '{child}.{ccol}' AS child_col, '{parent}.{pcol}' AS parent_key,
       (SELECT CAST(COUNT(DISTINCT {ccol}) AS BIGINT) FROM {child})
           AS n_child_distinct,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {parent}) AS n_parent_rows,
       (SELECT COUNT(*) = COUNT(DISTINCT {pcol}) FROM {parent})
           AS parent_unique,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM
          (SELECT DISTINCT {ccol} FROM {child}) c
          LEFT JOIN {parent} p ON c.{ccol} = p.{pcol}
          WHERE p.{pcol} IS NULL) AS n_orphans""")
    return "\nUNION ALL\n".join(parts)


@query("catalog_fk_inference", oracle=_fk_oracle(), category="A")
def catalog_fk_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity profiling — the data-derived half of
    dbmakedoc's relationship diagrams: parquet lakes declare no
    constraints, so each candidate foreign key is PROVEN from data
    (parent-key uniqueness + orphan count via a distinct-child anti
    join). ``parent_unique`` and ``n_orphans = 0`` together certify the
    relation; a broken load shows up as orphans, which is also the
    etl_data_quality contract.

    Scale: per relation, one distinct-reduce of the child column
    (map-side combine collapses the fact table to its key cardinality
    BEFORE the join) and a broadcast of the parent key set where small —
    never a fact×dim shuffle of raw rows. Relations profile
    independently — on a cluster they run as parallel jobs."""
    from functools import reduce

    out = []
    for child, ccol, parent, pcol in _FK_CANDIDATES:
        c = t(spark, sf_dir, child).select(F.col(ccol).alias("ck"))
        p = t(spark, sf_dir, parent).select(F.col(pcol).alias("pk"))
        c_dist = c.distinct()
        orphans = c_dist.join(p, c_dist.ck == p.pk, "left_anti")
        stats = (
            c_dist.agg(F.count("*").alias("n_child_distinct"))
            .crossJoin(
                p.agg(
                    F.count("*").alias("n_parent_rows"),
                    (
                        F.count("*") == F.countDistinct("pk")
                    ).alias("parent_unique"),
                )
            )
            .crossJoin(orphans.agg(F.count("*").alias("n_orphans")))
            .select(
                F.lit(f"{child}.{ccol}").alias("child_col"),
                F.lit(f"{parent}.{pcol}").alias("parent_key"),
                "n_child_distinct",
                "n_parent_rows",
                "parent_unique",
                "n_orphans",
            )
        )
        out.append(stats)
    return reduce(lambda a, b: a.unionAll(b), out)


@query(
    "scan_text_lines",
    oracle="SELECT doc_id, lang, text FROM documents",
    category="A",
)
def scan_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented text source (``spark.read.text``) — the log/raw-crawl
    ingestion surface: each line is one record, parsed by a row-local
    split into typed columns. The fixture round-trips documents →
    tab-delimited lines → parse; the oracle is the source table, so the
    check proves the text path is lossless (document text contains no
    tabs or newlines — pinned by the write producing exactly one line per
    document).

    Scale: the text source splits files on line boundaries per HDFS-style
    block, so a 100 TB crawl parallelizes by block with no schema pass;
    parsing stays in codegen (split + element_at), never Python."""
    path = artifact_path(sf_dir, "documents_text_lines")
    src = t(spark, sf_dir, "documents").select(
        F.concat_ws(
            "\t",
            F.col("doc_id").cast("string"),
            F.col("lang"),
            F.col("text"),
        ).alias("value")
    )
    src.write.mode("overwrite").text(path)
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t", 3)
    return lines.select(
        F.element_at(parts, 1).cast("long").alias("doc_id"),
        F.element_at(parts, 2).alias("lang"),
        F.element_at(parts, 3).alias("text"),
    )


# --- generator source (round 5) ----------------------------------------

@query(
    "scan_range_source",
    oracle="""
SELECT CAST(i AS BIGINT) AS id,
       CAST(i * i AS BIGINT) AS sq,
       CAST(i % 7 AS BIGINT) AS bucket,
       'row_' || CAST(i AS VARCHAR) AS tag
FROM generate_series(1, 10000) t(i)
""",
    category="A",
)
def scan_range_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generator source: ``spark.range`` — the zero-I/O way to
    synthesize dimension scaffolds, calendar spines, and test loads
    (DuckDB twin: ``generate_series``). At cluster scale ``range()``
    splits the interval across partitions with no storage read at all;
    derived columns stay in whole-stage codegen."""
    return spark.range(1, 10001).select(
        F.col("id").cast("bigint").alias("id"),
        (F.col("id") * F.col("id")).cast("bigint").alias("sq"),
        (F.col("id") % 7).cast("bigint").alias("bucket"),
        F.concat(F.lit("row_"), F.col("id").cast("string")).alias("tag"),
    )


# --- schema-merged parquet scan (round 5) ------------------------------

@query(
    "scan_parquet_schema_merge",
    oracle="""
SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
FROM orders WHERE EXTRACT(year FROM o_orderdate) <= 1997
UNION ALL
SELECT o_orderkey, CAST(NULL AS DOUBLE) AS o_totalprice, o_orderpriority
FROM orders WHERE EXTRACT(year FROM o_orderdate) > 1997
""",
    category="A",
)
def scan_parquet_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution scan: two parquet generations with different
    column sets (an old extract carrying o_totalprice, a new one
    carrying o_orderpriority) read back in ONE scan with
    ``mergeSchema=true`` — absent columns null-fill per file, the
    standard way a 100 TB lake absorbs additive schema change without
    rewriting history. The oracle states the same union semantics over
    the source table.

    Scale note: mergeSchema reconciles footers at planning time (cost
    scales with file count, not data); steady-state readers pin the
    merged schema explicitly instead of re-inferring per query."""
    o = t(spark, sf_dir, "orders")
    base = artifact_path(sf_dir, "schema_merge_parquet")
    old_gen = o.filter(F.year("o_orderdate") <= 1997).select(
        "o_orderkey", "o_totalprice"
    )
    new_gen = o.filter(F.year("o_orderdate") > 1997).select(
        "o_orderkey", "o_orderpriority"
    )
    old_gen.write.mode("overwrite").parquet(f"{base}/gen=1")
    new_gen.write.mode("overwrite").parquet(f"{base}/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{base}/gen=1", f"{base}/gen=2"
    )
    return merged.select("o_orderkey", "o_totalprice", "o_orderpriority")


@query(
    "scan_csv_multiline",
    oracle="""
SELECT c_custkey,
       c_name || ',' || chr(10) || c_mktsegment AS note
FROM customer
""",
    category="A",
)
def scan_csv_multiline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip with embedded delimiters AND newlines inside
    quoted fields (``multiLine=true`` + quote/escape handling) — the
    messy-export case that breaks naive line-splitting readers. The
    writer quotes the field; the reader must reassemble records across
    physical lines. Oracle recomputes the embedded-newline value from
    the source table, proving byte-exact round-trip.

    Scale note: multiLine CSV parsing is NOT line-splittable, so each
    file parses as one task — keep such files many-and-small (the write
    side here inherits the source partitioning); columnar formats remain
    the real answer for 100 TB."""
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat(
            F.col("c_name"), F.lit(","), F.lit("\n"), F.col("c_mktsegment")
        ).alias("note"),
    )
    path = artifact_path(sf_dir, "customer_multiline_csv")
    c.write.mode("overwrite").option("header", "true").option(
        "quoteAll", "true"
    ).csv(path)
    return (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .schema("c_custkey BIGINT, note STRING")
        .csv(path)
    )


@query(
    "sink_partition_overwrite_dynamic",
    oracle="""
WITH full_agg AS (
  SELECT o_orderstatus, o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1, 2)
SELECT o_orderpriority, n_orders, o_orderstatus
FROM full_agg WHERE o_orderstatus <> 'F'
UNION ALL
SELECT o_orderpriority, n_orders, o_orderstatus
FROM full_agg WHERE o_orderstatus = 'F' AND n_orders >= 100
""",
    category="A",
)
def sink_partition_overwrite_dynamic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dynamic partition overwrite — the incremental-reload primitive:
    a full partitioned write, then a second write that touches ONLY the
    'F' partition (recomputed with a filter), with
    ``partitionOverwriteMode=dynamic`` so untouched partitions survive.
    The read-back proves it: non-F partitions hold the first write's
    rows, F holds the second's. Static mode (the default) would have
    wiped the whole table — the difference between reloading one day
    and re-writing 100 TB.

    The mode rides a per-write option (no session mutation). At sf0.001
    the n_orders >= 100 refresh filter keeps some F rows and drops
    others, so both behaviors are exercised."""
    path = artifact_path(sf_dir, "orders_dynpart_parquet")
    agg = (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )
    agg.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    refresh = agg.filter(
        (F.col("o_orderstatus") == "F") & (F.col("n_orders") >= 100)
    )
    (
        refresh.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderstatus")
        .parquet(path)
    )
    return spark.read.parquet(path)


@query(
    "scan_parquet_bloom_filter",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders WHERE o_custkey = 42
""",
    category="A",
)
def scan_parquet_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet bloom-filter round-trip: write orders with a bloom
    filter on the point-lookup column, read back with an equality
    predicate. At 100 TB the footer bloom filter is what lets a point
    query skip row groups that column statistics (min/max on an
    unsorted column) cannot prune — the storage-side complement of
    ``join_bloom_filtered``'s runtime filter. The predicate still
    pushes to the scan (plan-pinned); correctness is the plain
    relational result."""
    path = artifact_path(sf_dir, "orders_bloom_parquet")
    (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#o_custkey", "true")
        .option("parquet.bloom.filter.expected.ndv#o_custkey", "100000")
        .parquet(path)
    )
    return spark.read.parquet(path).filter(F.col("o_custkey") == 42)


@query(
    "sink_jsonl",
    oracle="""
SELECT doc_id, lang, n_chars, source, text FROM documents
""",
    category="A",
)
def sink_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-Lines corpus export + typed read-back — THE interchange
    format of LLM training pipelines (every public corpus release ships
    as .jsonl[.zst]): one JSON object per line, schema carried by an
    explicit read schema rather than inference (inference would scan
    twice and can widen types between shards). The round trip is
    lossless for the document corpus, so the key carries the full
    source-table hash oracle.

    Scale: writer parallelism = partition count (each task streams its
    shard; no driver materialization); readers split by line boundaries,
    so a 100 TB corpus fans out to byte-range tasks exactly like the
    text-lines source. Compression (zstd via option) and date-keyed
    directory layout are one option away — deliberately not exercised
    here to keep the artifact greppable."""
    path = artifact_path(sf_dir, "documents_jsonl")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("source", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    src = t(spark, sf_dir, "documents").select(*[f.name for f in schema])
    src.write.mode("overwrite").json(path)
    return spark.read.schema(schema).json(path)


def _ddl_oracle() -> str:
    parts = []
    for tbl, cols in _DOC_SCHEMA.items():
        body = ", ".join(f"{col} {ntype}" for col, ntype in cols)
        ddl = f"CREATE TABLE {tbl} ({body})"
        parts.append(
            f"SELECT '{tbl}' AS table_name,\n"
            f"       CAST({len(cols)} AS INT) AS n_columns,\n"
            f"       '{ddl}' AS ddl"
        )
    return "\nUNION ALL\n".join(parts)


@query("catalog_ddl_generate", oracle=_ddl_oracle(), category="A")
def catalog_ddl_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDL generation — the other half of the dbmakedoc surface next to
    ``catalog_document``: one CREATE TABLE statement per fixture table,
    rendered from the LIVE Spark schema in the neutral type vocabulary
    (int64/float64/...), so the emitted DDL is engine-portable and any
    fixture type drift breaks the hash loudly instead of silently
    documenting the wrong schema. The oracle renders the same statements
    from the canonical FIXTURE_SCHEMA descriptor.

    Catalog metadata is tiny and driver-side by nature (the
    ``catalog_introspect`` precedent); no table data is read at all."""
    rows = []
    for tbl in TABLES:
        fields = t(spark, sf_dir, tbl).schema.fields
        body = ", ".join(
            f"{f.name} {_NEUTRAL_TYPES[f.dataType.simpleString()]}"
            for f in fields
        )
        rows.append((tbl, len(fields), f"CREATE TABLE {tbl} ({body})"))
    return spark.createDataFrame(
        rows, "table_name string, n_columns int, ddl string"
    )


@query(
    "scan_csv_delimiter_quote",
    oracle="""
SELECT n_nationkey, n_name,
       n_name || '|' || '"' || n_name || '"' AS tricky
FROM nation
""",
    category="A",
)
def scan_csv_delimiter_quote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom-delimiter CSV round trip under adversarial content: a
    column whose VALUES contain the delimiter ('|') and the quote
    character itself is written pipe-delimited with RFC-4180
    quote-doubling, then read back typed. The hash oracle recomputes
    the tricky values from base data, so any quoting/escaping loss in
    either direction (the classic silent-corruption bug of ad-hoc CSV
    exports) breaks the gate. Completes the CSV battery next to the
    typed, multiline, and PERMISSIVE corrupt-record scans.

    Scale: ordinary splittable CSV scan/sink either way; quoting is
    row-local."""
    n = t(spark, sf_dir, "nation").select(
        "n_nationkey",
        "n_name",
        F.concat(
            F.col("n_name"), F.lit('|"'), F.col("n_name"), F.lit('"')
        ).alias("tricky"),
    )
    path = artifact_path(sf_dir, "nation_pipe_csv")
    (
        n.write.mode("overwrite")
        .options(sep="|", quote='"', escape='"', header=True)
        .csv(path)
    )
    return (
        spark.read.options(sep="|", quote='"', escape='"', header=True)
        .schema("n_nationkey bigint, n_name string, tricky string")
        .csv(path)
    )
