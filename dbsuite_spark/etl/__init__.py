"""ETL surface (SURVEY §2A sources/sinks + §2K dbexec-equivalents)."""

from dbsuite_spark.etl import loaders, quality, scripts, sources  # noqa: F401
