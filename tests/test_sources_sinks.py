"""Source/sink plumbing tests: paginated source partitioning and
row-exactness, parquet sink roundtrip with partition pruning."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_project_spark.sources.paginated import (
    SyntheticShopFetcher,
    register_paginated_source,
)
from etl_project_spark.sources.sinks import write_parquet


def _src(spark, **opts):
    register_paginated_source(spark)
    r = spark.read.format("paginated_table")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_source_rows_match_fetcher_exactly(spark):
    df = _src(spark, n_rows=257, rows_per_page=100)
    got = sorted(tuple(r) for r in df.collect())
    fetcher = SyntheticShopFetcher(n_rows=257, rows_per_page=100)
    want = sorted(
        row for p in range(3) for row in fetcher.fetch_page(p)
    )
    assert got == want
    assert df.columns == list(fetcher.headers())


def test_source_concurrency_caps_partitions(spark):
    df = _src(spark, n_rows=1000, rows_per_page=10, max_concurrency=4)
    assert df.rdd.getNumPartitions() == 4  # 100 pages over 4 partitions
    assert df.count() == 1000


def test_source_single_page_remainder(spark):
    assert _src(spark, n_rows=5, rows_per_page=100).count() == 5


def test_sentinel_mix_is_stable(spark):
    """The sentinel convention (packed / '' / 'No disponible') must stay
    deterministic — enrichment oracle parity depends on it."""
    df = _src(spark, n_rows=1000)
    counts = {
        r.s: r["count"]
        for r in df.groupBy(
            F.when(F.col("Localizar") == "No disponible", "nb")
            .when(F.col("Localizar") == "", "miss")
            .otherwise("packed")
            .alias("s")
        ).count().collect()
    }
    assert counts["packed"] > counts["nb"] > counts["miss"] > 0


def test_parquet_sink_roundtrip_with_partition_pruning(spark, tmp_path):
    df = _src(spark, n_rows=400).withColumn(
        "bucket", (F.length("Comercio") + F.col("Localizar").isNull().cast("int")) % 2
    )
    out = str(tmp_path / "shops")
    write_parquet(df, out, partition_by=["Localidad"], max_records_per_file=100)
    back = spark.read.parquet(out)
    assert back.count() == 400
    # partitioned layout exists and pruning reads a subset of files
    dirs = [d for d in os.listdir(out) if d.startswith("Localidad=")]
    assert len(dirs) > 1
    one = back.filter(F.col("Localidad") == "Locality 7")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert one.count() > 0


def test_csv_json_roundtrip(spark, tmp_path):
    from etl_project_spark.catalog import read_table
    from etl_project_spark.sources.sinks import read_text_format, write_text_format
    from tests.conftest import SF_ORACLE

    src = read_table(spark, SF_ORACLE, "nation")
    want = sorted(tuple(r) for r in src.collect())
    for fmt in ("csv", "json"):
        path = str(tmp_path / fmt)
        write_text_format(src, path, format=fmt)
        back = read_text_format(spark, path, format=fmt, schema=src.schema)
        assert back.schema == src.schema
        assert sorted(tuple(r) for r in back.collect()) == want


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitioned parquet write → reads with a partition
    predicate must prune at planning time (PartitionFilters, not a
    post-scan filter) — the layout contract that makes 100 TB scans
    skip data."""
    from etl_project_spark.catalog import read_table
    from tests.conftest import SF_ORACLE

    out = str(tmp_path / "orders_by_status")
    orders = read_table(spark, SF_ORACLE, "orders")
    orders.write.partitionBy("o_orderstatus").parquet(out)

    back = spark.read.parquet(out).filter("o_orderstatus = 'F'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan or "PartitionFilters: [" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters")[1].split("]")[0]
    want = orders.filter("o_orderstatus = 'F'").count()
    assert back.count() == want


def test_catalog_errors_are_clean(spark):
    """Unknown table → KeyError naming the options; missing sf dir →
    Spark's AnalysisException at plan time (not a mid-job task crash)."""
    import pytest
    from pyspark.errors import AnalysisException

    from etl_project_spark.catalog import read_table

    with pytest.raises(KeyError, match="unknown table"):
        read_table(spark, "/root/testdata/sf0.01", "nope")
    with pytest.raises(AnalysisException):
        read_table(spark, "/root/testdata/sf-does-not-exist", "orders")


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """bucketBy co-located join: two tables bucketed 8-ways on the join
    key must sort-merge join with NO Exchange — the pre-partitioned
    layout that turns a 100 TB fact⋈fact into a shuffle-free zip."""
    from etl_project_spark.catalog import read_table
    from tests.conftest import SF_ORACLE

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = read_table(spark, SF_ORACLE, "orders")
        lineitem = read_table(spark, SF_ORACLE, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        for df, name, key in (
            (orders.select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey"),
            (lineitem, "b_lineitem", "l_orderkey"),
        ):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            (
                df.write.bucketBy(8, key)
                .sortBy(key)
                .option("path", str(tmp_path / name))
                .saveAsTable(name)
            )
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
