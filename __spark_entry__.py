"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`etl_project_spark`: the engine's query registry
(etl_project_spark.plans.registry) holds every implemented operator
from SURVEY.md §2/§7 as a (Spark builder, oracle SQL) pair; this module
just re-exposes it in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_project_spark.plans.registry import all_specs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from etl_project_spark.plans.pipeline import build_flagship

    return build_flagship(spark, "/root/testdata/sf0.001")


def _interleaved() -> list[str]:
    """Registry names round-robined across plan modules.

    A prefix sample of any length (the driver checks the first N)
    then spans every query family — relational, text, dedup,
    similarity, events, multimodal… — instead of exhausting one module
    before touching the next.
    """
    from collections import OrderedDict

    specs = all_specs()
    by_module: "OrderedDict[str, list[str]]" = OrderedDict()
    for name, spec in specs.items():
        by_module.setdefault(spec.builder.__module__, []).append(name)
    out: list[str] = []
    queues = list(by_module.values())
    i = 0
    while any(queues):
        q = queues[i % len(queues)]
        if q:
            out.append(q.pop(0))
        i += 1
        if i > 10_000:  # safety: can't happen, but never loop forever
            break
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2/§7,
    interleaved across modules so any prefix sample spans all families."""
    specs = all_specs()
    return {name: specs[name].builder for name in _interleaved()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted → rows-only check."""
    specs = all_specs()
    return {
        name: specs[name].oracle
        for name in _interleaved()
        if specs[name].oracle is not None
    }
