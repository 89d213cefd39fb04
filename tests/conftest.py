"""Shared fixtures: one SparkSession and one DuckDB connection per test run."""

from __future__ import annotations

import os

import duckdb
import pytest

from dbsuite_spark.session import get_spark
from dbsuite_spark.tables import TABLES

SF_DIR = os.environ.get("DIFF_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="dbsuite-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
