"""dbsuite_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of waveform-computing/dbsuite, re-expressed
Spark-first (SURVEY.md §2 is the operator contract).

Importing this package registers every operator into
``dbsuite_spark.registry``; ``__spark_entry__.py`` re-exports the driver
contract from there.
"""

from __future__ import annotations

from dbsuite_spark import (  # noqa: F401  (importing registers every key)
    etl,
    functions,
    operators,
    pipeline,
    streaming,
    udx,
    workloads,
)
from dbsuite_spark import _order, registry
from dbsuite_spark.registry import all_specs, oracle_sql, queries  # noqa: F401

# The driver verifies keys in registration order under a per-round budget —
# put not-yet-driver-verified keys first, round-1-green keys last
# (see _order.py for the rotation discipline).
registry.reorder(_order.VERIFY_FIRST, _order.VERIFY_LAST)

__all__ = ["queries", "oracle_sql", "all_specs"]
