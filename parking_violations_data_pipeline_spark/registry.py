"""Query registry: the single source of truth wiring SURVEY.md §2
operators to the driver protocol (queries() + oracle_sql()).

Each registered query is a pair:
  - a Spark callable (spark, sf_dir) -> DataFrame, built on the
    DataFrame API (Catalyst-optimized), and
  - an equivalent DuckDB SQL oracle string (or None for ops the
    oracle can't express — the driver then records a rows-only check).

Authoring rules (SURVEY.md §5, learned from measurement):
  - alias every computed column identically on both sides;
  - deterministic tie-breakers on every top-k / LIMIT;
  - round double aggregates on BOTH sides so the order-insensitive
    value-hash can't flap on summation-order ulps;
  - exact aggregates in oracle-checked queries; approximate variants
    registered as rows-only.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a (spark_fn, oracle_sql) pair under `name`."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, tuple(tags), fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    import parking_violations_data_pipeline_spark.queries  # noqa: F401 (populates REGISTRY)

    return {n: q.fn for n, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    import parking_violations_data_pipeline_spark.queries  # noqa: F401

    return {n: q.oracle for n, q in REGISTRY.items() if q.oracle is not None}
