"""Spark-native function checks that have no DuckDB twin (SURVEY §2H):
xxhash64 / crc32 / hash are engine-specific, so their contract here is
determinism + dtype, not cross-engine equality (fn_hash_funcs covers the
cross-engine pair md5/sha256)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbsuite_spark.tables import t


def test_engine_specific_hashes_deterministic(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.xxhash64("text").alias("h_xx"),
        F.crc32("text").alias("h_crc"),
        F.hash("text").alias("h_murmur"),
    )
    a = {r.doc_id: (r.h_xx, r.h_crc, r.h_murmur) for r in d.collect()}
    b = {r.doc_id: (r.h_xx, r.h_crc, r.h_murmur) for r in d.collect()}
    assert a == b and len(a) > 0
    schema = dict(d.dtypes)
    assert schema == {
        "doc_id": "bigint",
        "h_xx": "bigint",
        "h_crc": "bigint",
        "h_murmur": "int",
    }
