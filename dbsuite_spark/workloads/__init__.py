"""Composite workload queries — multi-operator TPC-H-shaped analytics
(SURVEY §2N): what a reference user's *real* reports look like, end to end.
"""

from dbsuite_spark.workloads import ssb, tpch  # noqa: F401
