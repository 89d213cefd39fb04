"""Differential oracle tests — every SQL-oracle key in the registry is run
on Spark and DuckDB at sf0.001 and compared with the driver's
order-insensitive semantics (SURVEY §5.3.2). Weak (no-oracle) keys get a
rows-run smoke check here; their deeper checks live in dedicated test files.
"""

from __future__ import annotations

import pytest

import dbsuite_spark
from tests.compare import assert_match

SPECS = dbsuite_spark.all_specs()
SQL_KEYS = sorted(n for n, s in SPECS.items() if s.oracle)
WEAK_KEYS = sorted(n for n, s in SPECS.items() if not s.oracle)


@pytest.mark.parametrize("key", SQL_KEYS)
def test_oracle_match(key, spark, ddb, sf_dir):
    spec = SPECS[key]
    df = spec.fn(spark, sf_dir)
    assert_match(df, ddb, spec.oracle, key=key)


@pytest.mark.parametrize("key", WEAK_KEYS)
def test_weak_runs(key, spark, sf_dir):
    spec = SPECS[key]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
