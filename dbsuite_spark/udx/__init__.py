"""Category J — UDF / UDAF / UDTF surface (SURVEY §2J)."""

from dbsuite_spark.udx import udfs  # noqa: F401
