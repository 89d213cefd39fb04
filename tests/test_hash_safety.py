"""Driver-hash-safety gate (round-2 contract discipline, VERDICT r01):
no array, map, struct, decimal, or float32 column may appear in ANY
registered key's final projection. The real driver canonicalizes results
through a pandas frame + sort_values + value hash; nested types crash it
and Decimal/float32 render engine-specifically — all five round-1 red keys
were exactly this failure mode. This test builds every registered query
and inspects its output schema, failing on the first unsafe column, so a
regression never reaches the driver. Building is lazy for pure
DataFrame keys; execution-eager keys (streaming runs, sink round-trips,
iterative CC) do execute here a second time — the double coverage is the
accepted cost of gating ALL 186 keys with zero exemptions.
"""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

import dbsuite_spark

UNSAFE = (
    T.ArrayType,
    T.MapType,
    T.StructType,
    T.DecimalType,
    T.FloatType,  # float32 → pandas float32; hash differs from oracle float64
    T.BinaryType,  # bytearray → pandas sort_values crash (round-4 red key)
)

_SPECS = sorted(dbsuite_spark.all_specs())


@pytest.mark.parametrize("key", _SPECS)
def test_final_schema_is_hash_safe(spark, sf_dir, key):
    spec = dbsuite_spark.all_specs()[key]
    df = spec.fn(spark, sf_dir)
    unsafe = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, UNSAFE)
    ]
    assert not unsafe, (
        f"{key} emits driver-hash-unsafe final columns {unsafe} — "
        "serialize/explode arrays+maps, flatten structs, cast decimal and "
        "float32 to double (see tests/compare.py docstring)"
    )
