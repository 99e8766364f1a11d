"""Property tests for the training-pipeline composition operators
added in round 5: splits, mixture resampling, canonical dedup, SCD2
intervals, attribution, and the quality audit. The value-level parity
with DuckDB lives in test_oracle_parity; these assert the SEMANTIC
contracts that a hash match alone can't express (e.g. intervals
partition the timeline, canonical is a member of its own cluster).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_project_spark.plans.registry import all_specs
from tests.conftest import SF_ORACLE

SPECS = all_specs()


def test_split_is_exhaustive_and_disjoint(spark):
    """Every document lands in exactly one split; shares are near
    80/10/10 (hash uniformity, ±15pp at small SF)."""
    out = SPECS["q_train_val_test_split"].builder(spark, SF_ORACLE).collect()
    totals: dict[str, int] = {}
    for r in out:
        totals[r.split] = totals.get(r.split, 0) + r.n_docs
    n = sum(totals.values())
    from etl_project_spark.catalog import read_table

    assert n == read_table(spark, SF_ORACLE, "documents").count()
    assert set(totals) == {"train", "val", "test"}
    assert 0.65 <= totals["train"] / n <= 0.95


def test_mixture_resample_never_upsamples(spark):
    out = SPECS["q_mixture_resample"].builder(spark, SF_ORACLE).collect()
    assert out
    for r in out:
        assert 0 <= r.n_after <= r.n_before
        assert 0.0 < r.target_rate <= 1.0
    # the dominant language must actually be down-sampled
    biggest = max(out, key=lambda r: r.n_before)
    if biggest.target_rate < 1.0:
        assert biggest.n_after < biggest.n_before


def test_canonical_is_cluster_member_with_max_chars(spark):
    canon = SPECS["q_dedup_canonical_docs"].builder(spark, SF_ORACLE)
    labels = SPECS["q_dedup_cluster_labels"].builder(spark, SF_ORACLE)
    joined = (
        canon.join(
            labels.withColumnRenamed("id", "canonical_id"),
            ["cluster", "canonical_id"],
            "left_semi",
        )
    ).count()
    assert joined == canon.count()  # every canonical belongs to its cluster
    # cluster sizes in the canonical output match the label counts
    sizes = {r.cluster: r.n for r in labels.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    for r in canon.collect():
        assert sizes[r.cluster] == r.n_members


def test_scd2_intervals_partition_each_user_timeline(spark):
    rows = SPECS["q_scd2_user_state_intervals"].builder(spark, SF_ORACLE).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r.valid_from)
        # exactly one open interval, and it is the last one
        open_ivs = [r for r in ivs if r.valid_to is None]
        assert len(open_ivs) == 1 and ivs[-1].valid_to is None, user
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from, user  # gapless chain
        # adjacent intervals never carry the same state (they'd be merged)
        for a, b in zip(ivs, ivs[1:]):
            assert a.state != b.state, user


def test_attribution_total_bounded_by_purchase_revenue(spark):
    out = SPECS["q_attribution_last_touch"].builder(spark, SF_ORACLE)
    attributed = out.agg(F.sum("attributed_value")).collect()[0][0]
    from etl_project_spark.catalog import read_table

    purchases = (
        read_table(spark, SF_ORACLE, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(F.sum("value"))
        .collect()[0][0]
    )
    assert attributed is not None and purchases is not None
    assert attributed <= purchases + 1e-6  # only view-preceded purchases count
    assert attributed > 0


def test_quality_audit_detects_planted_violations(spark):
    """The audit must FIRE, not just pass: the corpus ships a real
    temporal inconsistency (items shipped before their order date)."""
    out = {
        r.check_name: r.n_violations
        for r in SPECS["q_data_quality_audit"].builder(spark, SF_ORACLE).collect()
    }
    assert out["lineitem_shipped_before_ordered"] > 0
    assert out["orders_pk_unique"] == 0
    assert out["orders_orphan_custkey"] == 0


def test_pagerank_hub_structure_and_mass(spark):
    """Structural invariants of the integer PageRank: every node beats
    the base rank, suppliers (100 hubs serving 1500 customers) carry
    far higher rank than customers, and total mass stays below the
    float ideal of n_nodes×1e6 (floor division only leaks downward)."""
    rows = SPECS["q_pagerank_order_graph"].builder(spark, SF_ORACLE).collect()
    assert rows
    by_type: dict[str, list[int]] = {}
    for r in rows:
        assert r.rank_units >= 150_000  # damping base is a floor
        by_type.setdefault(r.node_type, []).append(r.rank_units)
    assert set(by_type) == {"customer", "supplier"}
    avg = {t: sum(v) / len(v) for t, v in by_type.items()}
    assert avg["supplier"] > 5 * avg["customer"]  # bipartite hub structure
    total = sum(r.rank_units for r in rows)
    assert total <= len(rows) * 1_000_000  # floor-div mass never inflates


def test_curation_pipeline_plan_reuses_persisted_survivors(spark):
    """The dedup stage boundary must be persisted: the executed plan
    shows the survivors InMemoryRelation consumed by multiple
    InMemoryTableScans (classifier branches + scoring projection)
    instead of re-running the dedup window per consumer."""
    from etl_project_spark.plans.registry import all_specs
    from etl_project_spark.session import release_persists
    from tests.conftest import SF_ORACLE

    df = all_specs()["q_curation_pipeline_sharded"].builder(spark, SF_ORACLE)
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") >= 2, plan[:2000]
    finally:
        release_persists()
