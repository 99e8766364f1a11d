"""Central query registry.

Every operator the engine claims (SURVEY.md §2 / §7) lands here as a
named query: a builder ``(spark, sf_dir) -> DataFrame`` plus, when the
semantics are ANSI-SQL-expressible, the DuckDB oracle SQL with
*identical* output column names (the driver hash-compares values after
sorting columns by name — see __spark_entry__.py docstring).

Queries with ``oracle=None`` (streaming, LSH, iterative ops) get the
driver's weaker rows-only check and carry self-validating property
tests in tests/ instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}

#: Modules that populate the registry on import.
_PLAN_MODULES = (
    "etl_project_spark.plans.pipeline",
    "etl_project_spark.plans.relational",
    "etl_project_spark.plans.analytic",
    "etl_project_spark.plans.patterns",
    "etl_project_spark.plans.sql_surface",
    "etl_project_spark.plans.scalar",
    "etl_project_spark.plans.text",
    "etl_project_spark.plans.dedup",
    "etl_project_spark.plans.similarity",
    "etl_project_spark.plans.events",
    "etl_project_spark.plans.ingest",
    "etl_project_spark.plans.multimodal",
    "etl_project_spark.plans.temporal",
    "etl_project_spark.plans.graph",
    "etl_project_spark.plans.quality",
    "etl_project_spark.plans.timeseries",
    "etl_project_spark.plans.linkage",
    "etl_project_spark.plans.runtime_filters",
    "etl_project_spark.plans.profiling",
    "etl_project_spark.plans.sketches",
)


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[Builder], Builder]:
    """Decorator: add a query to the registry."""

    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), tuple(tags))
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    """Import all plan modules and return the full registry."""
    import importlib

    for mod in _PLAN_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)
