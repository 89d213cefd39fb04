"""Scalar function batteries (SURVEY §2H) — importing registers the keys."""

from dbsuite_spark.functions import (  # noqa: F401
    extras,
    numeric,
    semistructured,
    strings_dates,
)
