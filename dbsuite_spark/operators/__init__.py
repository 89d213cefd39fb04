"""Operator modules — importing each module registers its query keys."""

from dbsuite_spark.operators import (  # noqa: F401
    aggregates,
    analytics,
    cte,
    extras,
    joins,
    relational,
    scale,
    setops,
    sorting,
    stats,
    stats_extra,
    windows,
)
