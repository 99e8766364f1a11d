"""Runtime-filter patterns: an explicit distributed Bloom-filter
semi-join reduction.

At 100 TB the dominant cost of a selective join is shuffling probe-side
rows that can never match. Spark's AQE injects bloom runtime filters
automatically in some shapes; this module builds the pattern explicitly
— a bitmap the size of a config value, built with one aggregation over
the small side, broadcast, and applied as a pre-shuffle filter — so the
engine exposes it as a first-class, testable operator. The final answer
always goes through the EXACT semi-join; the Bloom stage only discards
guaranteed non-matches, so false positives cost work, never
correctness (asserted in tests/test_linkage.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_project_spark.catalog import read_table
from etl_project_spark.plans.registry import register
from etl_project_spark.session import tune_session

#: Bitmap geometry: 2^16 bits = 1024 longs ≈ 8 KB broadcast; 3 hashes.
_BLOOM_BITS = 1 << 16
_BLOOM_WORDS = _BLOOM_BITS // 64
_BLOOM_K = 3


def _pos_expr(key: str, seed: int) -> str:
    """SQL text for the (key, seed) bit position inside the bitmap."""
    return f"pmod(xxhash64({key}, {seed}), {_BLOOM_BITS})"


def _word_col(key: str, seed: int) -> Column:
    return F.expr(f"CAST({_pos_expr(key, seed)} / 64 AS INT)")


def _mask_col(key: str, seed: int) -> Column:
    return F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({_pos_expr(key, seed)} % 64 AS INT))"
    )


def bloom_build(df: DataFrame, key: str) -> DataFrame:
    """Aggregate the build side into a (word_idx, bits) bitmap table.

    One explode of K seeds per build row, then a BIT_OR hash-agg keyed
    on the word index — the result is ≤ _BLOOM_WORDS rows regardless
    of build cardinality, i.e. broadcastable by construction.
    """
    seeded = df.select(
        F.col(key),
        F.explode(F.array(*[F.lit(s) for s in range(_BLOOM_K)])).alias("seed"),
    )
    pos = f"pmod(xxhash64({key}, seed), {_BLOOM_BITS})"
    return (
        seeded.select(
            F.expr(f"CAST({pos} / 64 AS INT)").alias("word_idx"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({pos} % 64 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_prefilter(probe: DataFrame, key: str, bloom: DataFrame) -> DataFrame:
    """Keep only probe rows whose K bloom bits are all set.

    K aliased broadcast joins against the tiny bitmap table — no
    fan-out, no re-aggregation of the probe side; rows missing a word
    (left join null) or with an unset bit are discarded before any
    expensive downstream shuffle.
    """
    out = probe
    for s in range(_BLOOM_K):
        b = bloom.select(
            F.col("word_idx").alias(f"w{s}"), F.col("bits").alias(f"b{s}")
        )
        out = (
            out.join(F.broadcast(b), _word_col(key, s) == F.col(f"w{s}"), "left")
            .where(
                F.col(f"b{s}").isNotNull()
                & (F.col(f"b{s}").bitwiseAND(_mask_col(key, s)) != 0)
            )
            .drop(f"w{s}", f"b{s}")
        )
    return out


@register(
    "q_bloom_prefilter_semi_join",
    oracle="""
SELECT l.l_returnflag,
       COUNT(*) AS n_items,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
WHERE EXISTS (
  SELECT 1 FROM supplier s
  WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal > 9000
)
GROUP BY l.l_returnflag
""",
    tags=("join", "bloom", "runtime-filter"),
)
def q_bloom_prefilter_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from rich-supplier lineitems, with an explicit Bloom
    runtime filter ahead of the exact semi-join.

    Build: suppliers with acctbal > 9000 → 8 KB bitmap. Probe:
    lineitem keeps only rows passing all 3 hash checks, THEN the exact
    broadcast left-semi join removes bloom false positives. The
    aggregate is identical to the plain EXISTS oracle — the bloom
    stage is provably answer-neutral.
    """
    tune_session(spark)
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 9000)
    bloom = bloom_build(supp, "s_suppkey")
    candidates = bloom_prefilter(li, "l_suppkey", bloom)
    exact = candidates.join(
        F.broadcast(supp.select("s_suppkey")),
        candidates.l_suppkey == F.col("s_suppkey"),
        "left_semi",
    )
    return exact.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )


@register(
    "q_zorder_tile_rollup",
    oracle="""
WITH cells AS (
  SELECT c_custkey,
         CAST(FLOOR(ROUND(CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR) || '/geo'), 1, 8)) AS BIGINT) % 2000 / 100.0 - 40.0, 2)) + 40 AS BIGINT) AS ca,
         CAST(FLOOR(ROUND(CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR) || '/geo'), 9, 8)) AS BIGINT) % 2000 / 100.0 - 60.0, 2)) + 60 AS BIGINT) AS cb
  FROM customer
),
coded AS (
  SELECT c_custkey,
         (((ca >> 0) & 1) << 0)
       | (((cb >> 0) & 1) << 1)
       | (((ca >> 1) & 1) << 2)
       | (((cb >> 1) & 1) << 3)
       | (((ca >> 2) & 1) << 4)
       | (((cb >> 2) & 1) << 5)
       | (((ca >> 3) & 1) << 6)
       | (((cb >> 3) & 1) << 7)
       | (((ca >> 4) & 1) << 8)
       | (((cb >> 4) & 1) << 9)
       | (((ca >> 5) & 1) << 10)
       | (((cb >> 5) & 1) << 11)
       | (((ca >> 6) & 1) << 12)
       | (((cb >> 6) & 1) << 13)
       | (((ca >> 7) & 1) << 14)
       | (((cb >> 7) & 1) << 15)
           AS morton
  FROM cells
)
SELECT CAST(morton AS BIGINT) AS morton,
       COUNT(*) AS n_customers,
       MIN(c_custkey) AS min_custkey
FROM coded
GROUP BY morton
""",
    tags=("layout", "zorder", "morton"),
)
def q_zorder_tile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (z-order) tile occupancy of the customer geo grid: the
    interleaved code per 1°×1° cell and how many customers share each
    z-tile.

    The code itself is the point — the same bit-interleave expression
    drives sources/sinks.py::write_zordered, whose file-pruning effect
    is asserted in tests/test_sources_sinks.py; this query pins its
    arithmetic against an SQL replay (both engines run identical
    shift/AND/OR ops on the md5-derived cells).
    """
    from etl_project_spark.plans.linkage import _coord_spark
    from etl_project_spark.sources.sinks import morton_interleave

    tune_session(spark)
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.floor(_coord_spark(F.col("c_custkey"), 1, 40.0)) + 40).alias("ca"),
        (F.floor(_coord_spark(F.col("c_custkey"), 9, 60.0)) + 60).alias("cb"),
    )
    coded = c.withColumn("morton", morton_interleave("ca", "cb", bits=8).cast("long"))
    return coded.groupBy("morton").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("c_custkey").alias("min_custkey"),
    )


# --------------------------------------------------------------------------
# Exact global median WITHOUT a global sort: the two-phase selection
# pattern. Phase 1 histograms values into 1024 range buckets (hash-agg,
# map-side combinable); phase 2 finds which bucket(s) hold the middle
# ranks from the tiny cumulative table; phase 3 sorts ONLY inside those
# buckets (n/1024 of the data) to extract the exact order statistics.
# At 100 TB the full sort never happens — the only per-row work is two
# scans of a single column with an arithmetic bucket id.
# --------------------------------------------------------------------------
@register(
    "q_distributed_exact_median",
    oracle="""
SELECT COUNT(*) AS n_rows,
       ROUND(MEDIAN(l_extendedprice), 4) AS median_price
FROM lineitem
""",
    tags=("selection", "median", "two-phase"),
)
def q_distributed_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median of lineitem extended price by histogram selection.

    DuckDB's MEDIAN (avg of the two middle order statistics on even n)
    is the oracle; the Spark plan computes the same statistic through
    bucket counts + in-bucket ranking, never sorting more than the
    target buckets. Window note: the cumulative runs over the
    ≤1024-row bucket table; the in-bucket row_number partitions by
    bucket id, so no single task ever sees more than one bucket.
    """
    tune_session(spark)
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v")
    )
    from pyspark.sql import Window as W

    nb = 1024
    b = li.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / float(nb)
    bucketed = li.crossJoin(F.broadcast(b)).select(
        "v",
        F.least(F.floor((F.col("v") - F.col("lo")) / width), F.lit(nb - 1))
        .cast("int")
        .alias("bk"),
    )
    counts = bucketed.groupBy("bk").agg(F.count(F.lit(1)).alias("c"))
    wcum = W.orderBy("bk").rowsBetween(W.unboundedPreceding, -1)
    cum = counts.select(
        "bk", "c", F.coalesce(F.sum("c").over(wcum), F.lit(0)).alias("before")
    )
    tot = counts.agg(F.sum("c").alias("n"))
    # middle ranks: k1 = ceil(n/2), k2 = floor(n/2) + 1 (equal on odd n)
    ranks = tot.select(
        "n",
        ((F.col("n") + 1) / 2).cast("long").alias("k1"),
        ((F.col("n") + 2) / 2).cast("long").alias("k2"),
    )
    target = (
        cum.crossJoin(F.broadcast(ranks))
        .where(
            (F.col("before") < F.col("k2"))
            & ((F.col("before") + F.col("c")) >= F.col("k1"))
        )
        .select("bk", "before", "n", "k1", "k2")
    )
    win = W.partitionBy("bk").orderBy("v")
    picked = (
        bucketed.join(F.broadcast(target), "bk")
        .withColumn("rank", F.row_number().over(win) + F.col("before"))
        .where((F.col("rank") == F.col("k1")) | (F.col("rank") == F.col("k2")))
    )
    return picked.groupBy().agg(
        F.max("n").alias("n_rows"),
        F.round(F.avg("v"), 4).alias("median_price"),
    )
