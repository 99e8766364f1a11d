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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2/§7."""
    return {name: spec.builder for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted → rows-only check."""
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
