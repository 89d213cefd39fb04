"""Category K extensions — table-maintenance operators a 100 TB lakehouse
needs: small-file compaction and clustered (sorted-within-partition) writes.

Reference semantics: dbexec's REORG/RUNSTATS-style maintenance scripts
[PUBLIC, module-level; checkout empty — SURVEY §0] — DB2 reorganized tables
for scan locality; the Parquet-lake equivalents are file compaction and
sort-clustered layout.

Both keys return the post-maintenance table contents, so their SQL oracle
is simply the source rows — the driver's order-insensitive hash proves the
rewrite is content-preserving while the file layout (the actual point)
is asserted in tests/test_extras.py.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsuite_spark.etl.io import artifact_path
from dbsuite_spark.registry import query
from dbsuite_spark.tables import t

COMPACT_TARGET_FILES = 4


@query(
    "etl_compaction",
    oracle="SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice "
    "FROM lineitem",
    category="K",
)
def etl_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (DB2 REORG analog): a fragmented landing zone
    (64 tiny files) is rewritten into a few right-sized files with
    ``repartitionByRange`` on the natural scan key, preserving content.

    Scale design: at 100 TB the target is ~128 MB per file
    (``spark.sql.files.maxRecordsPerFile`` + range repartition on the
    cluster key); range partitioning keeps each output file covering a
    tight key interval → Parquet min/max row-group stats prune like an
    index on later scans. Content equality is the oracle; file-count
    reduction is asserted in tests."""
    cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"]
    src = t(spark, sf_dir, "lineitem").select(*cols)

    frag = artifact_path(sf_dir, "compact_fragmented")
    # Round-14: fragment by hash(l_orderkey) instead of round-robin —
    # same 64-way fragmentation (the fixture this key compacts), minus
    # the keyless repartition's local sort-before-repartition pass
    # (guide §2.5). Content equality is the oracle either way.
    src.repartition(64, "l_orderkey").write.mode("overwrite").parquet(frag)

    compacted = artifact_path(sf_dir, "compact_out")
    (
        spark.read.parquet(frag)
        .repartitionByRange(COMPACT_TARGET_FILES, "l_orderkey")
        .write.mode("overwrite")
        .parquet(compacted)
    )
    return spark.read.parquet(compacted).select(*cols)


def parquet_file_count(path: str) -> int:
    """Number of data files in a Parquet directory (layout assertion)."""
    return len(glob.glob(os.path.join(path, "*.parquet")))


@query(
    "sort_within_partitions",
    oracle="SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice "
    "FROM lineitem",
    category="K",
)
def sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustered write layout: hash-repartition on the join/filter key,
    then ``sortWithinPartitions`` — the bucketed-table write discipline
    without a metastore. No global sort (no range-shuffle barrier): each
    partition sorts locally, which is what Parquet needs for run-length
    encoding + min/max stats. At 100 TB this is how you lay out a fact
    table so later merge-joins and key-range scans skip data."""
    cols = ["l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice"]
    li = t(spark, sf_dir, "lineitem").select(*cols)
    clustered = li.repartition(8, "l_orderkey").sortWithinPartitions(
        "l_orderkey", "l_linenumber"
    )
    out = artifact_path(sf_dir, "clustered_lineitem")
    clustered.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out).select(*cols)


Z_BITS = 8
Z_FILES = 8


def _zvalue(x, y, minx, maxx, miny, maxy):
    """Morton/Z-value of two columns quantized to Z_BITS bits each; ``y``
    takes the odd (higher) bit positions. Bounds are Columns (from a
    broadcast 1-row stats aggregate — no driver-side collect). A constant
    column (max == min) quantizes to 0 rather than dividing by zero."""
    qx = F.floor(
        (x - minx) * ((1 << Z_BITS) - 1) / F.greatest(maxx - minx, F.lit(1))
    ).cast("long")
    qy = F.floor(
        (y - miny) * ((1 << Z_BITS) - 1) / F.greatest(maxy - miny, F.lit(1))
    ).cast("long")
    z = F.lit(0).cast("long")
    for i in range(Z_BITS):
        z = (
            z.bitwiseOR(
                F.shiftleft(F.shiftright(qx, i).bitwiseAND(F.lit(1)), 2 * i)
            ).bitwiseOR(
                F.shiftleft(
                    F.shiftright(qy, i).bitwiseAND(F.lit(1)), 2 * i + 1
                )
            )
        )
    return z


@query(
    "etl_zorder_cluster",
    oracle="SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey "
    "FROM lineitem",
    category="K",
)
def etl_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering on (l_partkey, l_suppkey): both
    keys are quantized to 8 bits, bit-interleaved into a Z-value, and the
    table is range-partitioned + sorted on it. Each output file then covers
    a tight rectangle in BOTH dimensions — parquet min/max stats prune
    scans filtered on either key, which a single-column sort gives you for
    only one key. This is the multi-dimensional layout discipline (DB2 MDC
    tables' analog) for 100 TB fact tables with two hot filter columns.
    The quantization bounds come from a 1-row min/max aggregate broadcast
    back onto the table (the numbers ANALYZE would hold) — no driver-side
    collect, the whole plan stays on executors; content equality is the
    oracle, the per-file rectangle property is asserted in
    tests/test_extras.py."""
    cols = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]
    li = t(spark, sf_dir, "lineitem").select(*cols)
    bounds = li.agg(
        F.min("l_partkey").alias("minp"),
        F.max("l_partkey").alias("maxp"),
        F.min("l_suppkey").alias("mins"),
        F.max("l_suppkey").alias("maxs"),
    )
    z = _zvalue(
        F.col("l_partkey"),
        F.col("l_suppkey"),
        F.col("minp"),
        F.col("maxp"),
        F.col("mins"),
        F.col("maxs"),
    )
    out = artifact_path(sf_dir, "zorder_lineitem")
    (
        li.crossJoin(F.broadcast(bounds))
        .withColumn("zval", z)
        .drop("minp", "maxp", "mins", "maxs")
        .repartitionByRange(Z_FILES, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(out)
    )
    return spark.read.parquet(out).select(*cols)
