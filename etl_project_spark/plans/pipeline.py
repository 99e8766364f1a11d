"""Flagship pipeline-shaped query (SURVEY.md §7.1).

Re-expresses the reference's whole dataflow — two source scans → union
→ dedup → conditional enrichment → sink (flows/etl.py:289-311) — as
ONE lazy Catalyst plan over the driver corpus:

    two filtered customer segment scans   ≙ S2/S4 (etl.py:92-183)
      → unionByName                       ≙ T1    (etl.py:304)
      → dropDuplicates (full row)         ≙ T2    (etl.py:304)
      → when(...) tier enrichment         ≙ T4+T6 (etl.py:206-239)
      → join orders + aggregate           (analytics head)

Scale notes: both segment scans push their predicate into the parquet
scan; the full-row dropDuplicates is a hash aggregate on the union
(map-side partial combine, no sort); the customer→orders join shuffles
on the key — at 100 TB, AQE picks broadcast if the deduped segment
stays small, else a shuffle join partitioned on c_custkey/o_custkey.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_project_spark.catalog import read_table
from etl_project_spark.plans.registry import register
from etl_project_spark.session import tune_session

_ORACLE = """
WITH u AS (
  SELECT DISTINCT * FROM (
    SELECT * FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT * FROM customer WHERE c_acctbal > 1000.0
  )
), e AS (
  SELECT *,
         CASE WHEN c_acctbal < 0 THEN 'DEBT'
              WHEN c_acctbal < 5000 THEN 'STANDARD'
              ELSE 'PREMIUM' END AS acct_tier
  FROM u
)
SELECT e.acct_tier,
       o.o_orderstatus,
       COUNT(*) AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS total_revenue,
       COUNT(DISTINCT e.c_custkey) AS n_customers
FROM e JOIN orders o ON e.c_custkey = o.o_custkey
GROUP BY e.acct_tier, o.o_orderstatus
"""


def build_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")

    seg_building = customer.filter(F.col("c_mktsegment") == "BUILDING")
    seg_rich = customer.filter(F.col("c_acctbal") > 1000.0)

    # Overlapping rows are bit-identical (same source row), so full-row
    # dedup is deterministic — mirrors pd.concat(...).drop_duplicates()
    # at flows/etl.py:304.
    unioned = seg_building.unionByName(seg_rich).dropDuplicates()

    enriched = unioned.withColumn(
        "acct_tier",
        F.when(F.col("c_acctbal") < 0, F.lit("DEBT"))
        .when(F.col("c_acctbal") < 5000, F.lit("STANDARD"))
        .otherwise(F.lit("PREMIUM")),
    )

    return (
        enriched.join(orders, enriched.c_custkey == orders.o_custkey)
        .groupBy("acct_tier", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
            F.countDistinct("c_custkey").alias("n_customers"),
        )
    )


register(
    "pipeline_flagship",
    oracle=_ORACLE,
    doc="scan→union→dedup→enrich→join→agg in one plan (≙ flows/etl.py:289-311)",
    tags=("pipeline", "flagship"),
)(build_flagship)
