#!/usr/bin/env python
"""Bucketed-layout A/B on a real registry query (round-10 verdict #5).

Persists the order-fact family (orders, lineitem) bucketed+sorted on
orderkey, then times the UNCHANGED q03_shipping_priority builder
against flat parquet vs the bucketed layout in the same session, and
counts orderkey Exchanges in each physical plan. The layout switch is
the catalog hook in sources/bucketed.py — the builder is not told.

Usage: python tools/bucketed_ab.py [sf_dir] [n_buckets] [passes]
       (defaults: /tmp/sf10, 32, 3)

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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from etl_project_spark.plans.registry import all_specs
    from etl_project_spark.session import get_spark
    from etl_project_spark.sources.bucketed import (
        clear_bucketed_layout,
        persist_bucketed_family,
    )

    spark = get_spark("bucketed-ab")
    q03 = all_specs()["q03_shipping_priority"].builder

    def orderkey_exchanges(df) -> int:
        plan = df._jdf.queryExecution().executedPlan().toString()
        return len(re.findall(r"Exchange hashpartitioning\((?:l_|o_)orderkey", plan))

    def run(tag: str) -> dict:
        times = []
        for _ in range(passes):
            spark.catalog.clearCache()
            t = time.time()
            q03(spark, sf_dir).count()
            times.append(round(time.time() - t, 3))
        return {
            "passes": times,
            "steady": sorted(times)[len(times) // 2],
            "orderkey_exchanges": orderkey_exchanges(q03(spark, sf_dir)),
        }

    flat = run("flat")
    t0 = time.time()
    persist_bucketed_family(
        spark,
        sf_dir,
        {"orders": "o_orderkey", "lineitem": "l_orderkey"},
        n_buckets=n_buckets,
        prefix="ab",
    )
    write_s = round(time.time() - t0, 3)
    bucketed = run("bucketed")
    clear_bucketed_layout()

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_buckets": n_buckets,
                "flat": flat,
                "bucketed": bucketed,
                "bucketed_write_s": write_s,
            }
        )
    )


if __name__ == "__main__":
    main()
