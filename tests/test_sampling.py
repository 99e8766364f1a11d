"""Property tests for the sampling/sketch queries (rows-only in the
oracle gate): bounds that must hold for any correct implementation."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_project_spark.catalog import read_table
from etl_project_spark.plans.registry import all_specs
from tests.conftest import SF_ORACLE

SPECS = all_specs()


def test_stratified_sample_fractions_and_subset(spark):
    docs = read_table(spark, SF_ORACLE, "documents")
    sample = SPECS["q_stratified_sample_docs"].builder(spark, SF_ORACLE)
    got = {r.lang: r.n for r in sample.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    pop = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    fractions = {"en": 0.5, "es": 0.25, "fr": 0.25, "de": 0.25}
    for lang, frac in fractions.items():
        if pop.get(lang, 0) < 50:
            continue
        ratio = got.get(lang, 0) / pop[lang]
        assert abs(ratio - frac) < 0.15, (lang, ratio, frac)
    # sample ⊆ population by key
    assert sample.join(docs, "doc_id", "left_anti").count() == 0
    # reproducible under the fixed seed
    again = SPECS["q_stratified_sample_docs"].builder(spark, SF_ORACLE)
    assert sorted(r.doc_id for r in sample.select("doc_id").collect()) == sorted(
        r.doc_id for r in again.select("doc_id").collect()
    )


def test_approx_distinct_within_5pct_of_exact(spark):
    """The query now emits the error check itself (within_5pct) plus
    the exact count; verify both against an independent recompute."""
    e = read_table(spark, SF_ORACLE, "events")
    rows = {
        r.event_type: r
        for r in SPECS["q_approx_distinct_users"].builder(spark, SF_ORACLE).collect()
    }
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(rows) == set(exact)
    for k, ex in exact.items():
        assert rows[k].exact_users == ex
        assert rows[k].within_5pct, (k, ex)
