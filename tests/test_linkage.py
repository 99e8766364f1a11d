"""Property tests for the record-linkage family: the Jaro-Winkler
scorer's bit-parity with DuckDB, and grid-join completeness against the
brute-force cross product.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_project_spark.plans.linkage import jaro_winkler
from etl_project_spark.plans.registry import all_specs
from tests.conftest import SF_ORACLE

_ALPHA = "abcdefgz "


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet=_ALPHA, min_size=0, max_size=24),
    st.text(alphabet=_ALPHA, min_size=0, max_size=24),
)
def test_jaro_winkler_matches_duckdb(a, b):
    """The pandas-UDF scorer must agree with DuckDB's native
    jaro_winkler_similarity bit-for-bit — that is what makes the
    oracle comparison exact rather than tolerance-based."""
    (got,) = duckdb.execute("SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()
    assert jaro_winkler(a, b) == pytest.approx(got, abs=0.0, rel=0.0)


def test_jaro_winkler_known_values():
    # canonical textbook pairs
    assert jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611111111111111)
    assert jaro_winkler("DWAYNE", "DUANE") == pytest.approx(0.84)
    assert jaro_winkler("x", "x") == 1.0
    assert jaro_winkler("", "x") == 0.0


def test_spatial_grid_join_complete_vs_bruteforce(spark):
    """The 3×3 neighbor-cell equi-join must find EXACTLY the pairs the
    O(n·m) cross product finds — grid blocking is a pure optimization,
    never a recall trade."""
    from etl_project_spark.plans.linkage import (
        _GEO_RADIUS_KM,
        _coord_spark,
        _GEO_EARTH_KM,
    )
    from etl_project_spark.catalog import read_table
    from pyspark.sql import functions as F

    c = read_table(spark, SF_ORACLE, "customer").select(
        "c_custkey",
        _coord_spark(F.col("c_custkey"), 1, 40.0).alias("c_lat"),
        _coord_spark(F.col("c_custkey"), 9, 60.0).alias("c_lng"),
    )
    s = read_table(spark, SF_ORACLE, "supplier").select(
        "s_suppkey",
        _coord_spark(F.col("s_suppkey"), 1, 40.0).alias("s_lat"),
        _coord_spark(F.col("s_suppkey"), 9, 60.0).alias("s_lng"),
    )
    dphi = F.radians(F.col("c_lat") - F.col("s_lat")) / 2.0
    dlmb = F.radians(F.col("c_lng") - F.col("s_lng")) / 2.0
    a = F.sin(dphi) * F.sin(dphi) + F.cos(F.radians(F.col("s_lat"))) * F.cos(
        F.radians(F.col("c_lat"))
    ) * F.sin(dlmb) * F.sin(dlmb)
    km = F.round(2.0 * _GEO_EARTH_KM * F.asin(F.sqrt(a)), 3)
    brute = {
        (r.c_custkey, r.s_suppkey)
        for r in c.crossJoin(s)
        .withColumn("km", km)
        .where(F.col("km") <= _GEO_RADIUS_KM)
        .collect()
    }
    spec = all_specs()["q_spatial_grid_join"]
    grid = {
        (r.c_custkey, r.s_suppkey) for r in spec.builder(spark, SF_ORACLE).collect()
    }
    assert grid == brute
    assert len(brute) > 0, "fixture produced no in-radius pairs — test is vacuous"


def test_snm_no_python_udf(spark):
    """The SNM plan must stay entirely JVM-side (no BatchEvalPython /
    ArrowEvalPython nodes)."""
    spec = all_specs()["q_sorted_neighborhood_pairs"]
    plan = spec.builder(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_bloom_prefilter_prunes_and_is_answer_neutral(spark):
    """The bloom stage must (a) discard a meaningful share of
    non-matching probe rows pre-join and (b) never discard a true
    match — candidates ⊇ exact matches, candidates ≪ probe."""
    from pyspark.sql import functions as F

    from etl_project_spark.catalog import read_table
    from etl_project_spark.plans.runtime_filters import bloom_build, bloom_prefilter

    li = read_table(spark, SF_ORACLE, "lineitem")
    supp = read_table(spark, SF_ORACLE, "supplier").where(F.col("s_acctbal") > 9000)
    bloom = bloom_build(supp, "s_suppkey")
    n_words = bloom.count()
    assert n_words <= 1024, "bitmap table must stay broadcast-sized"

    total = li.count()
    candidates = bloom_prefilter(li, "l_suppkey", bloom)
    n_cand = candidates.count()
    true_matches = li.join(
        F.broadcast(supp.select("s_suppkey")),
        li.l_suppkey == F.col("s_suppkey"),
        "left_semi",
    )
    n_true = true_matches.count()
    assert n_true <= n_cand, "bloom dropped a true match — that's a correctness bug"
    # with |build| ≪ 2^16 bits the FP rate is tiny; require real pruning
    assert n_cand < total * 0.5, f"bloom pruned nothing: {n_cand}/{total}"
    # false positives must be eliminated by the exact semi-join
    n_after = candidates.join(
        F.broadcast(supp.select("s_suppkey")),
        candidates.l_suppkey == F.col("s_suppkey"),
        "left_semi",
    ).count()
    assert n_after == n_true
