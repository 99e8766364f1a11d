"""Custom data sources and sinks.

- :mod:`etl_project_spark.sources.paginated` — the paginated-table
  Python Data Source (≙ the reference's Selenium scrape,
  flows/etl.py:67-183).
- :mod:`etl_project_spark.sources.sinks` — batched JDBC / parquet sink
  wrappers (≙ flows/etl.py:244-286).
"""

from etl_project_spark.sources.paginated import (
    PaginatedTableDataSource,
    register_paginated_source,
)
from etl_project_spark.sources.sinks import write_jdbc, write_parquet

__all__ = [
    "PaginatedTableDataSource",
    "register_paginated_source",
    "write_jdbc",
    "write_parquet",
]
