"""ETL surface (SURVEY §2A sources/sinks + §2K dbexec-equivalents)."""

from dbsuite_spark.etl import (  # noqa: F401
    incremental,
    loaders,
    maintenance,
    quality,
    scripts,
    sources,
    sql_format,
)
