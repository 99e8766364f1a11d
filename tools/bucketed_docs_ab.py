#!/usr/bin/env python
"""Bucketed-layout A/B for the DOCUMENTS family (round-14 verdict
stretch #8 — the second family after r10's orderkey pair).

Persists ``documents`` bucketed+sorted on ``doc_id`` and times an
UNCHANGED registry query against flat parquet vs the bucketed layout in
the same session, counting doc_id-keyed Exchanges in each physical
plan. The near-dup/dedup family is the intended beneficiary: their
signing/gram frames key every aggregate and verify join on ``_id``
aliased straight from ``doc_id``, so a scan that already reports
hashpartitioning(doc_id) lets Catalyst elide the first shuffle of the
signing aggregation — the same pay-once-at-ingest economics as the
orderkey family (BASELINE.md §r10).

Usage: python tools/bucketed_docs_ab.py [sf_dir] [query] [n_buckets] [passes] [table] [key] [aliases]
       (defaults: /tmp/sf1, q_minhash_near_dup_pairs, 32, 3,
        documents, doc_id, "doc_id,_id" — table/key/aliases generalize
        the A/B to other layouts, e.g. embeddings vec_id
        "vec_id,_id,_lid,_rid" for the ANN join-back family)

Writes managed tables into the session's spark-warehouse — run with a
throwaway cwd (or export SPARK_GRAFT_DRIVER_MEM for sf10).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    query = sys.argv[2] if len(sys.argv) > 2 else "q_minhash_near_dup_pairs"
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    passes = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    # round-16 generalization (verdict #6): A/B any table:key layout,
    # counting Exchanges on any of the key's in-plan alias spellings —
    # e.g. `embeddings vec_id vec_id,_id,_lid,_rid` for the ANN
    # join-back family. Defaults preserve the original documents run.
    table = sys.argv[5] if len(sys.argv) > 5 else "documents"
    key = sys.argv[6] if len(sys.argv) > 6 else "doc_id"
    aliases = (
        sys.argv[7].split(",") if len(sys.argv) > 7 else [key, "_id"]
    )

    from etl_project_spark.plans.registry import all_specs
    from etl_project_spark.session import get_spark, release_persists
    from etl_project_spark.sources.bucketed import (
        clear_bucketed_layout,
        persist_bucketed_family,
    )

    spark = get_spark("bucketed-docs-ab")
    builder = all_specs()[query].builder
    alias_re = re.compile(
        r"Exchange hashpartitioning\((?:" + "|".join(map(re.escape, aliases)) + r")#"
    )

    def docid_exchanges(df) -> int:
        # the dedup family aliases doc_id to _id before its first
        # shuffle; count every alias spelling so the elision is visible
        plan = df._jdf.queryExecution().executedPlan().toString()
        return len(alias_re.findall(plan))

    def run() -> dict:
        times = []
        for _ in range(passes):
            release_persists(blocking=True)
            spark.catalog.clearCache()
            t = time.time()
            builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t, 3))
        return {
            "passes": times,
            "steady": sorted(times)[len(times) // 2],
            "docid_exchanges": docid_exchanges(builder(spark, sf_dir)),
        }

    flat = run()

    t0 = time.time()
    tables = persist_bucketed_family(
        spark, sf_dir, {table: key}, n_buckets=n_buckets
    )
    build_s = round(time.time() - t0, 3)
    try:
        bucketed = run()
    finally:
        clear_bucketed_layout()
        for t in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "query": query,
                "table": table,
                "key": key,
                "n_buckets": n_buckets,
                "bucketed_write_s": build_s,
                "flat": flat,
                "bucketed": bucketed,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
