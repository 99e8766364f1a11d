"""Bucketed co-located join: the pay-the-shuffle-once layout must (a)
produce identical results to the flat join and (b) plan with ZERO
Exchange and ZERO per-query Sort — the claim sources/bucketed.py makes
for the 100 TB repeated-join workload."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_project_spark.catalog import read_table
from etl_project_spark.sources.bucketed import colocated_join, write_bucketed
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    import shutil

    # clear both the catalog entry and any orphaned managed location
    # (a crashed prior run leaves the dir without the metastore row)
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("bt_docs", "bt_sizes"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    docs = read_table(spark, SF_SMOKE, "documents").select("doc_id", "source")
    sizes = read_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.length("text").alias("n")
    )
    write_bucketed(docs, "bt_docs", "doc_id", n_buckets=8)
    write_bucketed(sizes, "bt_sizes", "doc_id", n_buckets=8)
    yield "bt_docs", "bt_sizes"
    spark.sql("DROP TABLE IF EXISTS bt_docs")
    spark.sql("DROP TABLE IF EXISTS bt_sizes")


def test_bucketed_join_matches_flat_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    got = sorted(
        (r.doc_id, r.source, r.n) for r in colocated_join(spark, lt, rt, "doc_id").collect()
    )
    docs = read_table(spark, SF_SMOKE, "documents")
    want = sorted(
        (r.doc_id, r.source, r.n)
        for r in docs.select(
            "doc_id", "source", F.length("text").alias("n")
        ).collect()
    )
    assert got == want and len(got) > 0


def test_bucketed_join_plan_has_no_exchange(spark, bucketed_tables):
    """The whole point of the layout: both sides arrive hash-placed and
    sorted, so the merge join needs no shuffle and no sort.

    Broadcast is disabled for the assertion because the layout models
    the large-×-large regime (at 100 TB neither side broadcasts); at
    test scale the planner would otherwise broadcast the tiny side and
    skip bucketed reads entirely — which is also correct, and exactly
    the fallback behavior colocated_join documents."""
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            colocated_join(spark, lt, rt, "doc_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert "Bucketed: true" in plan and "SelectedBucketsCount: 8 out of 8" in plan
    # NOTE a partition-local Sort remains: since Spark 3.0 the bucketed
    # scan no longer reports write-time sort order (legacy-gated), so
    # the merge join re-sorts each bucket locally — O(bucket) memory,
    # no network. The scale cost being eliminated is the Exchange.


def test_flat_same_join_does_shuffle(spark):
    """Control: the identical join over non-bucketed frames plans an
    Exchange — proving the bucketed layout, not AQE, removed it."""
    docs = read_table(spark, SF_SMOKE, "documents")
    a = docs.select("doc_id", "source")
    b = docs.select("doc_id", F.length("text").alias("n"))
    plan = a.join(b, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan or "BroadcastHashJoin" in plan


def test_registry_query_runs_shuffle_free_on_bucketed_family(spark):
    """END-TO-END layout claim: persist the order-fact family
    (orders + lineitem) bucketed on orderkey, register the layout, and
    the UNCHANGED q03 registry builder must (a) return identical rows
    and (b) plan its lineitem-orders join with NO Exchange on either
    side — the pay-the-shuffle-once story from a real workload query,
    not a synthetic join."""
    import re
    import shutil

    from etl_project_spark.plans.registry import all_specs
    from etl_project_spark.sources.bucketed import (
        clear_bucketed_layout,
        persist_bucketed_family,
    )

    q03 = all_specs()["q03_shipping_priority"].builder
    flat = q03(spark, SF_SMOKE)
    flat_rows = [tuple(r) for r in flat.collect()]
    flat_plan = flat._jdf.queryExecution().executedPlan().toString()

    import hashlib
    import os

    tag = hashlib.sha256(os.path.abspath(SF_SMOKE).encode()).hexdigest()[:8]
    tables = (f"bkt_{tag}_orders", f"bkt_{tag}_lineitem")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    try:
        made = persist_bucketed_family(
            spark,
            SF_SMOKE,
            {"orders": "o_orderkey", "lineitem": "l_orderkey"},
            n_buckets=8,
            prefix="bkt",
        )
        assert sorted(made.values()) == sorted(tables)
        # re-persisting the same family must re-read the parquet, not
        # resolve through its own just-registered layout (r10 review)
        persist_bucketed_family(
            spark,
            SF_SMOKE,
            {"orders": "o_orderkey"},
            n_buckets=8,
            prefix="bkt",
        )
        bucketed = q03(spark, SF_SMOKE)
        assert [tuple(r) for r in bucketed.collect()] == flat_rows
        plan = bucketed._jdf.queryExecution().executedPlan().toString()
        orderkey_exchanges = re.findall(
            r"Exchange hashpartitioning\((?:l_|o_)orderkey", plan
        )
        assert not orderkey_exchanges, plan
        # the flat plan DOES shuffle on orderkey — otherwise this test
        # proves nothing
        assert re.search(r"Exchange hashpartitioning\((?:l_|o_)orderkey", flat_plan)
    finally:
        clear_bucketed_layout()
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_dedup_query_runs_docid_shuffle_free_on_bucketed_documents(spark):
    """Second bucketed family (r14 verdict stretch #8): persist
    DOCUMENTS bucketed on doc_id, register the layout, and the
    UNCHANGED q_minhash_near_dup_pairs builder must (a) return
    identical pairs and (b) plan ZERO doc_id/_id-keyed Exchanges —
    the signing aggregation and both verify join-backs inherit the
    scan's bucket partitioning straight through the doc_id→_id alias
    and the gram explode (narrow ops preserve hash partitioning).
    Bucket count must equal defaultParallelism here: below it,
    ensure_parallelism's small-file guard repartitions and the layout
    is (correctly) discarded — the same no-op condition real
    multi-file inputs satisfy at scale. Measured at sf1: 10 → 0
    doc_id exchanges, steady 12.4 s → 8.1 s, write cost 1.5 s
    (BASELINE.md §r15)."""
    import hashlib
    import os
    import re
    import shutil

    from etl_project_spark.plans.registry import all_specs
    from etl_project_spark.sources.bucketed import (
        clear_bucketed_layout,
        persist_bucketed_family,
    )

    q = all_specs()["q_minhash_near_dup_pairs"].builder
    flat = q(spark, SF_SMOKE)
    # Canon-sorted comparison: the pair queries no longer carry a
    # terminal output orderBy (r17 — harness/oracle compare sorted
    # rows), so row ORDER is plan-dependent; the pair SET is the
    # contract.
    flat_rows = sorted(tuple(r) for r in flat.collect())
    flat_plan = flat._jdf.queryExecution().executedPlan().toString()

    tag = hashlib.sha256(os.path.abspath(SF_SMOKE).encode()).hexdigest()[:8]
    table = f"bkd_{tag}_documents"
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
    try:
        made = persist_bucketed_family(
            spark,
            SF_SMOKE,
            {"documents": "doc_id"},
            n_buckets=spark.sparkContext.defaultParallelism,
            prefix="bkd",
        )
        assert made == {"documents": table}
        bucketed = q(spark, SF_SMOKE)
        assert sorted(tuple(r) for r in bucketed.collect()) == flat_rows
        plan = bucketed._jdf.queryExecution().executedPlan().toString()
        assert not re.findall(
            r"Exchange hashpartitioning\((?:doc_id|_id)#", plan
        ), plan
        # the flat plan DOES shuffle on the doc key — otherwise this
        # test proves nothing
        assert re.search(
            r"Exchange hashpartitioning\((?:doc_id|_id)#", flat_plan
        )
    finally:
        clear_bucketed_layout()
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_cdc_incremental_elides_docid_exchanges_on_bucketed_documents(spark):
    """Third doc_id-keyed beneficiary (r15 verdict #6): the r16 family
    A/B found the bucketed documents layout elides doc_id Exchanges
    ONLY for q_cdc_incremental_chunk_dedup among the candidates tested
    — simhash and the CDC pair query shuffle exclusively on derived
    keys (postings / chunk digests / pair ids), so there is nothing
    for the layout to remove there (sf1 A/B: 6→6 and 0→0 exchanges;
    their small steady deltas are file-layout noise, not elision).
    Here the batch chunking and the per-doc store-hit aggregation
    inherit the scan's bucket partitioning: measured 4 → 2 doc_id
    exchanges with identical rows (sf1 steady 2.72 → 2.18 s,
    BASELINE.md §r16). The residual 2 are the history-side digest
    store build — keyed on chunk digest, correctly untouched."""
    import hashlib
    import os
    import re
    import shutil

    from etl_project_spark.plans.registry import all_specs
    from etl_project_spark.sources.bucketed import (
        clear_bucketed_layout,
        persist_bucketed_family,
    )

    q = all_specs()["q_cdc_incremental_chunk_dedup"].builder
    flat = q(spark, SF_SMOKE)
    flat_rows = sorted(tuple(r) for r in flat.collect())
    flat_plan = flat._jdf.queryExecution().executedPlan().toString()
    flat_n = len(
        re.findall(r"Exchange hashpartitioning\((?:doc_id|_id)#", flat_plan)
    )

    tag = hashlib.sha256(os.path.abspath(SF_SMOKE).encode()).hexdigest()[:8]
    table = f"bkc_{tag}_documents"
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
    try:
        made = persist_bucketed_family(
            spark,
            SF_SMOKE,
            {"documents": "doc_id"},
            n_buckets=spark.sparkContext.defaultParallelism,
            prefix="bkc",
        )
        assert made == {"documents": table}
        bucketed = q(spark, SF_SMOKE)
        # sorted: the audit rows are set-equal, but their arrival order
        # shifts with the scan partitioning (no trailing orderBy here)
        assert sorted(tuple(r) for r in bucketed.collect()) == flat_rows
        plan = bucketed._jdf.queryExecution().executedPlan().toString()
        bucketed_n = len(
            re.findall(r"Exchange hashpartitioning\((?:doc_id|_id)#", plan)
        )
        # positive anchor: the flat plan must still carry doc_id
        # exchanges, or the elision assertion is vacuous
        assert flat_n >= 3
        assert bucketed_n <= flat_n - 2, (flat_n, bucketed_n)
    finally:
        clear_bucketed_layout()
        spark.sql(f"DROP TABLE IF EXISTS {table}")
