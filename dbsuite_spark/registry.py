"""Central query registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2 registers itself here as a ``QuerySpec``:
a callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a
DuckDB oracle SQL string. ``__spark_entry__.py`` re-exports ``queries()``
and ``oracle_sql()`` from this module.

Design notes (100 TB discipline):
- Specs are *declarative plans*: each callable builds a DataFrame lazily and
  never calls ``collect()``; the driver materializes.
- Oracle SQL strings follow the alias/rounding discipline of SURVEY §7.4:
  aggregated doubles go through ``CAST(.. AS DECIMAL(18,6))`` before SUM so
  results are summation-order-independent and hash-stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    category: str
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    category: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame callable."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query key: {name}")

        def tuned_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver may call any query against a vanilla session
            # (200-wide shuffles, no UTC pin); tune once per session.
            from dbsuite_spark.session import ensure_tuned

            ensure_tuned(spark)
            return fn(spark, sf_dir)

        tuned_fn.__name__ = fn.__name__
        tuned_fn.__doc__ = fn.__doc__
        _REGISTRY[name] = QuerySpec(
            name=name,
            fn=tuned_fn,
            oracle=oracle,
            category=category,
            doc=(fn.__doc__ or "").strip(),
            tags=tuple(tags),
        )
        return fn

    return deco


def reorder(first: list[str], last: list[str]) -> None:
    """Rebuild registration order: ``first`` keys lead (in list order),
    unlisted keys keep their original relative order in the middle, and
    ``last`` keys trail. The driver walks keys in registration order under
    a per-round budget (round 1 stopped at 50 of 156), so keys that most
    need a real driver run must register first; already-driver-green keys
    go last. Unknown names fail loudly so the lists can't drift."""
    global _REGISTRY
    unknown = [k for k in [*first, *last] if k not in _REGISTRY]
    if unknown:
        raise KeyError(f"reorder: unknown keys {unknown}")
    overlap = set(first) & set(last)
    if overlap:
        # The rotation's likely drift mode: a newly-green key added to
        # `last` without removal from `first` would otherwise silently
        # keep its front-of-budget slot.
        raise KeyError(f"reorder: keys in both first and last: {overlap}")
    listed = set(first) | set(last)
    middle = [k for k in _REGISTRY if k not in listed]
    _REGISTRY = {k: _REGISTRY[k] for k in [*first, *middle, *last]}


def spec(name: str) -> QuerySpec:
    return _REGISTRY[name]


def all_specs() -> dict[str, QuerySpec]:
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in _REGISTRY.items() if s.oracle is not None}
