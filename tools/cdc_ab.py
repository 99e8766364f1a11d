#!/usr/bin/env python
"""A/B the CDC boundary scan: interpreted array-HOF form vs row form.

Round-14 verdict task #1. Both forms build the identical (doc_id,
chunk) frame (asserted via a full digest-ledger comparison first);
then each form's chunk-stats aggregate is timed cold + steady with
cache released between passes, same convention as bench.py.

Usage: python tools/cdc_ab.py [sf_dir]     (default /root/testdata/sf1)
Prints one JSON line per form plus a ratio line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _stats(chunks):
    from pyspark.sql import functions as F

    digests = chunks.groupBy(
        F.md5(F.col("chunk").cast("binary")).alias("dg"),
        F.length("chunk").alias("clen"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return digests.agg(
        F.sum("cnt").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chunks"),
        F.sum((F.col("cnt") - 1) * F.col("clen")).cast("long").alias("chars_saved"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1"
    from etl_project_spark.plans.dedup import (
        _cdc_chunk_frame,
        _cdc_chunk_frame_hof,
    )
    from etl_project_spark.session import get_spark

    spark = get_spark("cdc-ab")

    # Equality gate: identical digest ledgers from both forms.
    row_stats = _stats(_cdc_chunk_frame(spark, sf_dir)).collect()[0].asDict()
    hof_stats = _stats(_cdc_chunk_frame_hof(spark, sf_dir)).collect()[0].asDict()
    assert row_stats == hof_stats, (row_stats, hof_stats)
    print(json.dumps({"equality": "ok", "ledger": row_stats, "sf_dir": sf_dir}))

    def _hof_wide(sp, sd):
        return _cdc_chunk_frame_hof(sp, sd, wide=True)

    for label, builder in (
        ("hof", _cdc_chunk_frame_hof),
        ("hof_wide", _hof_wide),
        ("row", _cdc_chunk_frame),
    ):
        passes = []
        for _ in range(3):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            _stats(builder(spark, sf_dir)).collect()
            passes.append(round(time.perf_counter() - t0, 2))
        print(
            json.dumps(
                {
                    "form": label,
                    "cold": passes[0],
                    "steady": round(min(passes[1:]), 2),
                    "passes": passes,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
