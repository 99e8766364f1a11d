#!/usr/bin/env python
"""A/B the persisted MinHash index: repeat-sweep cost served vs inflight.

Round-14 verdict task #4. Protocol: in one session, run
q_minhash_near_dup_pairs inflight (3 passes, cache released between),
then persist_minhash_index once (its build time reported separately),
then run the same query served (3 passes). Row-set equality between
the two modes is asserted on the first pass of each.

Usage: python tools/minhash_ab.py [sf_dir]   (default /tmp/sf1)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    from etl_project_spark.plans.registry import all_specs
    from etl_project_spark.session import get_spark, release_persists
    from etl_project_spark.sources import dedup_index as DX

    spark = get_spark("minhash-ab", driver_memory="20g")
    q = all_specs()["q_minhash_near_dup_pairs"].builder

    def timed_passes(label):
        passes = []
        first_rows = None
        for i in range(3):
            release_persists(blocking=True)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            out = q(spark, sf_dir)
            if i == 0:
                first_rows = sorted(tuple(r) for r in out.collect())
            else:
                out.write.format("noop").mode("overwrite").save()
            passes.append(round(time.perf_counter() - t0, 2))
        print(
            json.dumps(
                {
                    "mode": label,
                    "cold": passes[0],
                    "steady": round(min(passes[1:]), 2),
                    "passes": passes,
                    "rows": len(first_rows),
                }
            ),
            flush=True,
        )
        return first_rows

    DX.clear_dedup_indexes()
    inflight = timed_passes("inflight")

    t0 = time.perf_counter()
    DX.persist_minhash_index(spark, sf_dir)
    print(
        json.dumps({"persist_build_s": round(time.perf_counter() - t0, 2)}),
        flush=True,
    )
    try:
        served = timed_passes("served")
        assert served == inflight, "served != inflight"
        print(json.dumps({"equality": "ok"}))
    finally:
        DX.clear_dedup_indexes()
    spark.stop()


if __name__ == "__main__":
    main()
