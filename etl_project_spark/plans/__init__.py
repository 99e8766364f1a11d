"""Query plans: the engine's public query surface.

Each query is registered in :mod:`etl_project_spark.plans.registry`
with a Spark DataFrame builder and (where ANSI-SQL-expressible) an
equivalent oracle SQL string for the driver's DuckDB check.
"""

from etl_project_spark.plans.registry import QuerySpec, all_specs, register

__all__ = ["QuerySpec", "all_specs", "register"]
