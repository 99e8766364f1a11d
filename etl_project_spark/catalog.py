"""Parquet table catalog over a scale-factor directory.

The driver corpus (TESTDATA.md / FIXTURES.md §B) is one parquet file
per table under ``{sf_dir}/{name}.parquet``. Reads are plain
``spark.read.parquet`` so Catalyst keeps predicate pushdown, column
pruning and partition pruning — at cluster scale these files become
multi-file partitioned datasets and the same code applies unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: All tables in the driver corpus (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one corpus table. Lazy — no data motion until an action."""
    from etl_project_spark.session import tune_session

    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    tune_session(spark)
    # A registered bucketed layout (sources/bucketed.py) transparently
    # substitutes the pre-hash-partitioned catalog table — same rows,
    # same schema, but joins/aggs on the bucket key skip their
    # Exchange. Registry builders stay layout-agnostic.
    from etl_project_spark.sources.bucketed import bucketed_table_for

    bucketed = bucketed_table_for(sf_dir, name)
    if bucketed is not None:
        return spark.table(bucketed)
    df = spark.read.parquet(table_path(sf_dir, name))
    return normalize_nanos_timestamps(df)


def normalize_nanos_timestamps(df: DataFrame) -> DataFrame:
    """Convert nanos-as-long timestamp columns back to TimestampType.

    With ``spark.sql.legacy.parquet.nanosAsLong`` a TIMESTAMP(NANOS)
    parquet column arrives as int64 nanoseconds. ``ts div 1000`` is
    integer division (no double round-trip — epoch-nanos exceed 2^53),
    truncating to µs exactly like DuckDB's native ns→µs read.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    out = df
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            out = out.withColumn(
                field.name, F.expr(f"timestamp_micros({field.name} div 1000)")
            )
    return out


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for ``spark.sql`` use."""
    for name in TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
