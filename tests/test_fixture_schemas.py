"""Fixture schema-drift canary (round-2 lesson).

The round driver REGENERATES /root/testdata between rounds and the
physical parquet schemas can change — at round-2 start, ``events.ts``
switched from TIMESTAMP(NANOS) to TIMESTAMP(MICROS, NTZ) and every
events-based key failed at analysis time until ``tables.t()`` learned
both layouts. This test pins the *normalized* schema every operator
actually sees (as of the 2026-08-13 round-2 fixtures), so the first
pytest run of a round points straight at the drifted table instead of
failing obscurely deep inside some operator.

If this test fails: the fixtures changed. Prefer normalizing in
``dbsuite_spark/tables.py`` (NOT in operators) so downstream code keeps
seeing stable types, then update this expectation if the change is
intentional and benign.
"""

from __future__ import annotations

import pytest

from dbsuite_spark.tables import TABLES, t

EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {
        "n_nationkey": "int",
        "n_name": "string",
        "n_regionkey": "int",
    },
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # tables.t() normalizes nanos/micros/NTZ here
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("table", TABLES)
def test_normalized_fixture_schema(spark, sf_dir, table):
    got = {f.name: f.dataType.simpleString()
           for f in t(spark, sf_dir, table).schema.fields}
    assert got == EXPECTED[table], (
        f"fixture drift in '{table}' — the driver regenerated testdata "
        f"with a different schema; normalize it in dbsuite_spark/tables.t() "
        f"(got {got})"
    )
