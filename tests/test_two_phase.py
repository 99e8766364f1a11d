"""Property tests for the two-phase bucketed window replacements:
the distributed forms must equal the single-partition window forms
exactly, including ties, degenerate (all-equal) ranges, descending
order, and n < k NTILE edge cases."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_project_spark.plans.two_phase import (
    bucketed_global_rank,
    bucketed_prefix_sum,
    ntile_from_rank,
)


def _rows(seed: int, n: int, dup_every: int):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        v = rng.randint(0, n // dup_every)  # heavy ties
        out.append((i, v, float(v) * 1.5 - 7.0))
    return out


@pytest.mark.parametrize("descending", [False, True])
def test_bucketed_global_rank_matches_window(spark, descending):
    df = spark.createDataFrame(_rows(1, 500, 7), "k long, v long, x double").repartition(8)
    order = [F.desc("v") if descending else F.asc("v"), F.asc("k")]
    expect = df.select("k", F.row_number().over(W.orderBy(*order)).alias("i"))
    got = bucketed_global_rank(df, "v", ["k"], nb=16, descending=descending).select(
        "k", "i"
    )
    assert sorted(got.collect()) == sorted(expect.collect())


def test_bucketed_global_rank_degenerate_all_equal(spark):
    df = spark.createDataFrame([(i, 42) for i in range(50)], "k long, v long")
    got = bucketed_global_rank(df, "v", ["k"], nb=8).select("k", "i")
    assert sorted((r.k, r.i) for r in got.collect()) == [(i, i + 1) for i in range(50)]


def test_bucketed_prefix_sum_matches_window(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 11) for i in range(400)], "k long, n long"
    ).repartition(8)
    w = W.orderBy("k").rowsBetween(W.unboundedPreceding, -1)
    expect = df.select("k", F.coalesce(F.sum("n").over(w), F.lit(0)).alias("off"))
    got = bucketed_prefix_sum(df, "k", "n", nb=16).select("k", "off")
    assert sorted(got.collect()) == sorted(expect.collect())


@pytest.mark.parametrize("n,k", [(100, 10), (37, 10), (7, 10), (10, 10), (1, 4)])
def test_ntile_from_rank_matches_ntile(spark, n, k):
    df = spark.createDataFrame([(i,) for i in range(n)], "v long")
    expect = df.select("v", F.ntile(k).over(W.orderBy("v")).alias("t"))
    got = df.select(
        "v",
        ntile_from_rank(
            F.row_number().over(W.orderBy("v")), F.lit(n).cast("long"), k
        ).alias("t"),
    )
    assert sorted(got.collect()) == sorted(expect.collect())
