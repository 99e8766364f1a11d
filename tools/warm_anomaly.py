#!/usr/bin/env python
"""Instrumented repro for the warm>cold anomaly (VERDICT r5 wrong #2).

Runs the four anomalous headline queries for N passes in one session at
$SPARK_GRAFT_SF_DIR, logging per pass: wall time per query, cumulative
JVM GC time, JVM heap used, Python worker count + total RSS. The goal
is to see whether the slowdown correlates with GC, worker RSS growth,
or neither (pure VM noise).

Usage: python tools/warm_anomaly.py [n_passes] [extra confs k=v ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = (
    "q_embedding_near_dup_pairs",
    "q_benchmark_contamination",
    "q_multimodal_payload_profile",
    "q_knn_bruteforce_topk",
)


def jvm_stats(spark) -> dict:
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    gc_ms = 0
    for b in mf.getGarbageCollectorMXBeans():
        gc_ms += b.getCollectionTime()
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    return {"gc_ms": int(gc_ms), "heap_used_mb": int(heap.getUsed() / 1e6)}


def pyworker_rss_mb() -> tuple[int, float]:
    out = subprocess.run(
        ["ps", "-eo", "rss,args"], capture_output=True, text=True
    ).stdout
    n, rss = 0, 0.0
    for line in out.splitlines():
        if "pyspark.daemon" in line or "pyspark.worker" in line:
            n += 1
            rss += float(line.strip().split()[0]) / 1024.0
    return n, round(rss, 1)


def main() -> None:
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    extra = dict(kv.split("=", 1) for kv in sys.argv[2:])

    from pyspark.sql import SparkSession

    from etl_project_spark.plans.registry import all_specs
    from etl_project_spark.session import get_spark

    if extra:
        b = SparkSession.builder
        for k, v in extra.items():
            b = b.config(k, v)
    spark = get_spark("warm-anomaly")
    for k, v in extra.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            print(f"# conf {k} not runtime-settable", file=sys.stderr)
    specs = all_specs()

    from etl_project_spark.catalog import TABLES, read_table

    for t in TABLES:
        read_table(spark, SF_DIR, t).count()

    for p in range(n_passes):
        row: dict = {"pass": p}
        for name in QUERIES:
            t0 = time.perf_counter()
            specs[name].builder(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            row[name] = round(time.perf_counter() - t0, 3)
        row.update(jvm_stats(spark))
        row["n_pyworkers"], row["pyworker_rss_mb"] = pyworker_rss_mb()
        print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
