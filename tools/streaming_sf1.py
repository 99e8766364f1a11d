#!/usr/bin/env python
"""Streaming-twin equality AT SCALE (round-14 verdict #7): run the
streaming curation pipeline (availableNow, multi-trigger) over the sf1
corpus and assert its drained state + shared shard-audit rollup equal
the batch twin (``q_incremental_curation_audit``) row-for-row — the
same equality tests/test_streaming.py pins at toy SF, promoted to the
sweep corpus and recorded as round evidence.

Usage:  python tools/streaming_sf1.py [sf_dir]   (default /tmp/sf1)

Prints per-shard rows from both paths, a sorted-rows MD5 for each, and
a MATCH/MISMATCH verdict; exits nonzero on mismatch.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"

    from pyspark.sql import functions as F

    from etl_project_spark.catalog import read_table
    from etl_project_spark.plans.registry import all_specs
    from etl_project_spark.session import get_spark
    from etl_project_spark.streaming import pipeline as SP

    spark = get_spark("streaming-sf1-evidence")
    docs = read_table(spark, sf_dir, "documents")

    work = tempfile.mkdtemp(prefix="stream_sf1_")
    try:
        batch_dir = os.path.join(work, "arriving")
        # 8 files -> 8 micro-batches with maxFilesPerTrigger=1: nkey
        # groups split ACROSS triggers, exercising the cross-trigger
        # min-merge at full sf1 batch volume.
        docs.filter("source = 'src19'").repartition(8).write.parquet(batch_dir)
        hist = SP.history_nkey_index(docs.filter("source <> 'src19'"))

        t0 = time.perf_counter()
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(batch_dir)
        )
        q = (
            SP.stream_curation_canonicals(stream, hist)
            .writeStream.format("memory")
            .queryName("curation_canon_sf1")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(1800):
            print("FAIL: stream did not drain within 1800s")
            return 2
        stream_s = round(time.perf_counter() - t0, 1)
        n_triggers = len(q.recentProgress)

        state = spark.sql("SELECT * FROM curation_canon_sf1")
        final = (
            state.groupBy("nkey")
            .agg(
                F.min("doc_id").alias("doc_id"),
                F.min_by(
                    F.struct("source", "n_chars", "n_feats", "_sw"),
                    F.col("doc_id"),
                ).alias("_p"),
            )
            .select("doc_id", "_p.source", "_p.n_chars", "_p.n_feats", "_p._sw")
        )
        streamed = sorted(
            tuple(r) for r in SP.curation_shard_audit(final).collect()
        )

        t0 = time.perf_counter()
        batch = sorted(
            tuple(r)
            for r in all_specs()["q_incremental_curation_audit"]
            .builder(spark, sf_dir)
            .collect()
        )
        batch_s = round(time.perf_counter() - t0, 1)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    def digest(rows):
        return hashlib.md5(repr(rows).encode()).hexdigest()

    print(f"sf_dir: {sf_dir}")
    print(f"stream: {len(streamed)} shard rows in {stream_s}s "
          f"over {n_triggers} triggers -> {digest(streamed)}")
    print(f"batch:  {len(batch)} shard rows in {batch_s}s "
          f"-> {digest(batch)}")
    for r in streamed:
        print(f"  stream shard row: {r}")
    if streamed == batch and streamed:
        print("MATCH: streaming twin equals batch twin row-for-row at sf1")
        return 0
    print("MISMATCH")
    for r in batch:
        print(f"  batch  shard row: {r}")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
