"""Operator modules — importing each module registers its query keys."""

from dbsuite_spark.operators import aggregates  # noqa: F401
