"""Scalar function batteries (SURVEY §2H) — importing registers the keys."""

from dbsuite_spark.functions import (  # noqa: F401
    extras,
    geo,
    numeric,
    semistructured,
    strings_dates,
)
