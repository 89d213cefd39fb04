"""Category I — Structured Streaming operators (SURVEY §2I)."""

from dbsuite_spark.streaming import streams  # noqa: F401
