#!/usr/bin/env python
"""Append-vs-rebuild economics for the persisted dedup indexes
(round-15 verdict #1's ledger row, plus #7's served-repeat probe).

In one session at a given corpus dir, times:

- ``minhash_rebuild_s``   — whole-corpus ``persist_minhash_index``
  (what the non-incremental serving form pays per build)
- ``minhash_history_s``   — history-only build (the once-per-corpus
  cost the incremental topology amortizes)
- ``minhash_append_s``    — ``append_minhash_index`` over the src19
  batch (the per-cycle maintenance cost; the headline comparison is
  append vs rebuild)
- ``probe_served_*``      — the banding + exact-verify near-dup probe
  answered from the GROWN index (cold + steady over ``passes``): the
  repeat-sweep cost once the index exists, completing the
  worst-case-only pricing of ``q_minhash_indexed_pairs``
- ``nkey_rebuild_s`` / ``nkey_append_s`` — same pair for the
  canonical-key set (append = batch canonicalize + anti-join against
  the persisted digest column + append write)

Grown-equals-rebuild is a pinned test fact (tests/test_dedup_index.py)
— this tool measures COST only, on the sweep-scale replicas
(/tmp/sf1, /tmp/sf10), not the oracle corpora.

Usage: python tools/index_append_ab.py [sf_dir] [passes]
       (defaults: /tmp/sf1, 3; export SPARK_GRAFT_DRIVER_MEM for sf10)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from etl_project_spark.catalog import read_table
    from etl_project_spark.operators.dedup import minhash_near_dup_pairs
    from etl_project_spark.session import get_spark, release_persists
    from etl_project_spark.sources import dedup_index as DX

    spark = get_spark("index-append-ab")
    root = tempfile.mkdtemp(prefix="idx_append_ab_")
    out: dict = {"sf_dir": sf_dir, "passes": passes}

    def timed(key: str, fn):
        release_persists(blocking=True)
        spark.catalog.clearCache()
        t0 = time.time()
        r = fn()
        out[key] = round(time.time() - t0, 3)
        print(f"{key}: {out[key]}s", flush=True)
        return r

    # Warmup OUTSIDE the timed section: the first signing job in a
    # session pays whole-stage-codegen JIT + Python-worker spawn; the
    # rebuild (timed first) would otherwise carry it alone and flatter
    # the append ratio.
    wtmp = os.path.join(root, "warm")
    DX.persist_minhash_index(
        spark, sf_dir, path=wtmp, register=False,
        docs=read_table(spark, sf_dir, "documents").limit(2000),
    )
    shutil.rmtree(wtmp, ignore_errors=True)
    release_persists(blocking=True)

    try:
        # -- MinHash ----------------------------------------------------
        timed(
            "minhash_rebuild_s",
            lambda: DX.persist_minhash_index(
                spark, sf_dir, path=os.path.join(root, "full"), register=False
            ),
        )
        hist = timed(
            "minhash_history_s",
            lambda: DX.persist_minhash_index(
                spark,
                sf_dir,
                path=os.path.join(root, "hist"),
                register=False,
                docs=DX._history_docs(spark, sf_dir),
            ),
        )
        timed(
            "minhash_append_s",
            lambda: DX.append_minhash_index(spark, sf_dir, hist),
        )

        # -- served repeat probe against the grown index ----------------
        d = read_table(spark, sf_dir, "documents")

        def probe():
            minhash_near_dup_pairs(
                d, "doc_id", "text", n_hashes=64, bands=32, shingle_k=3,
                threshold=0.5, use_token_ngrams=True, prefilter=False,
                signed=DX.load_minhash_index(spark, hist),
            ).write.format("noop").mode("overwrite").save()

        probe_times = []
        for i in range(passes):
            timed(f"probe_served_p{i}", probe)
            probe_times.append(out[f"probe_served_p{i}"])
        out["probe_served_cold"] = probe_times[0]
        out["probe_served_steady"] = sorted(probe_times)[len(probe_times) // 2]

        # -- nkey -------------------------------------------------------
        timed(
            "nkey_rebuild_s",
            lambda: DX.persist_nkey_index(
                spark, sf_dir, path=os.path.join(root, "nkfull"), register=False
            ),
        )
        from pyspark.sql import functions as F

        older = read_table(spark, sf_dir, "documents").filter(
            (F.col("source") != DX.BATCH_SOURCE) & (F.col("source") != "src18")
        )
        nk = DX.persist_nkey_index(
            spark, sf_dir, path=os.path.join(root, "nkhist"),
            register=False, docs=older,
        )
        timed(
            "nkey_append_s",
            lambda: DX.append_nkey_index(spark, sf_dir, nk, batch_source="src18"),
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        DX.clear_dedup_indexes()

    out["append_vs_rebuild"] = round(
        out["minhash_rebuild_s"] / max(out["minhash_append_s"], 1e-9), 2
    )
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
