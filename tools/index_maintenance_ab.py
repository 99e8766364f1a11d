#!/usr/bin/env python
"""Maintenance-lifecycle economics for the persisted MinHash/nkey
indexes (round-16 verdict #1/#2 ledger rows): K chained appends →
read-amplification curve → compaction recovery, plus DELETE vs
rebuild.

In one session at a given corpus dir:

- ``cycle_k`` (k=1..K) — the src19 batch split into K deterministic
  md5 sub-batches, appended one per cycle via the SHARED
  ``append_minhash_frames`` write body; per cycle records the append
  seconds, the part-file counts of both frames, and (optionally) the
  served whole-corpus probe seconds against the growing index — the
  degradation-vs-cycles curve the small-file problem produces.
- ``compact_s`` / ``probe_postcompact_*`` — ``compact_minhash_index``
  fold + the same probe re-run: the recovery the manifest-rewrite
  pass buys back.
- ``delete_s`` vs ``delete_rebuild_s`` — tombstone one sub-batch back
  out of the grown index (``delete_from_minhash_index`` — the
  affected-file rewrite) vs rebuilding the index over
  corpus-minus-tombstones (what a deployment without a delete path
  pays per takedown wave); same pair for the nkey ledger
  (``delete_from_nkey_index`` = O(tomb) blind append of negative
  owner counts).

Grown/shrunk ≡ rebuilt are pinned test facts (tests/test_dedup_index)
— this tool measures COST on the sweep replicas, not correctness.

Usage: python tools/index_maintenance_ab.py [sf_dir] [cycles] [probe_passes]
       (defaults: /tmp/sf1, 8, 2; probe_passes=0 skips per-cycle
       probes — use at sf10 where each probe is ~90 s; export
       SPARK_GRAFT_DRIVER_MEM=40g for sf10)
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


def part_count(path: str) -> int:
    return len([f for f in os.listdir(path) if f.startswith("part-")])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    probe_passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from pyspark.sql import functions as F

    from etl_project_spark.catalog import read_table
    from etl_project_spark.operators.dedup import minhash_near_dup_pairs
    from etl_project_spark.session import get_spark, release_persists
    from etl_project_spark.sources import dedup_index as DX

    spark = get_spark("index-maintenance-ab")
    root = tempfile.mkdtemp(prefix="idx_maint_ab_")
    out: dict = {"sf_dir": sf_dir, "cycles": cycles, "probe_passes": probe_passes}

    def timed(key, fn):
        release_persists(blocking=True)
        spark.catalog.clearCache()
        t0 = time.time()
        r = fn()
        out[key] = round(time.time() - t0, 3)
        print(f"{key}: {out[key]}s", flush=True)
        return r

    d = read_table(spark, sf_dir, "documents")
    batch = d.filter(F.col("source") == DX.BATCH_SOURCE)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % cycles
    )

    # warm JIT/python workers outside every timed section
    wtmp = os.path.join(root, "warm")
    DX.persist_minhash_index(
        spark, sf_dir, path=wtmp, register=False, docs=d.limit(2000)
    )
    shutil.rmtree(wtmp, ignore_errors=True)
    release_persists(blocking=True)

    try:
        idx = timed(
            "history_build_s",
            lambda: DX.persist_minhash_index(
                spark, sf_dir, path=os.path.join(root, "hist"),
                register=False, docs=DX._history_docs(spark, sf_dir),
            ),
        )

        def probe():
            minhash_near_dup_pairs(
                d, "doc_id", "text", n_hashes=64, bands=32, shingle_k=3,
                threshold=0.5, use_token_ngrams=True, prefilter=False,
                signed=DX.load_minhash_index(spark, idx),
            ).write.format("noop").mode("overwrite").save()

        def probe_steady(tag):
            times = []
            for p in range(probe_passes):
                timed(f"probe_{tag}_p{p}", probe)
                times.append(out[f"probe_{tag}_p{p}"])
            if times:
                out[f"probe_{tag}_steady"] = sorted(times)[len(times) // 2]

        files_rows, files_sig, append_s = [], [], []
        for k in range(cycles):
            sub = batch.filter(bucket == k)
            timed(f"append_c{k}_s", lambda: DX.append_minhash_frames(idx, sub))
            append_s.append(out.pop(f"append_c{k}_s"))
            files_rows.append(part_count(idx.rows_path))
            files_sig.append(part_count(idx.sig_path))
            if probe_passes:
                probe_steady(f"c{k}")
        out["append_per_cycle_s"] = append_s
        out["files_rows_per_cycle"] = files_rows
        out["files_sig_per_cycle"] = files_sig
        if probe_passes:
            out["probe_cycle_steady_s"] = [
                out.pop(f"probe_c{k}_steady") for k in range(cycles)
            ]

        timed("compact_s", lambda: DX.compact_minhash_index(spark, idx))
        out["files_rows_postcompact"] = part_count(idx.rows_path)
        out["files_sig_postcompact"] = part_count(idx.sig_path)
        probe_steady("postcompact")

        # -- DELETE one sub-batch back out vs rebuild-without-it --------
        tomb = batch.filter(bucket == 0).select(F.col("doc_id").alias("_id"))
        timed(
            "minhash_delete_s",
            lambda: DX.delete_from_minhash_index(spark, idx, tomb),
        )
        alive = d.join(
            tomb.select(F.col("_id").alias("doc_id")), "doc_id", "left_anti"
        )
        timed(
            "minhash_delete_rebuild_s",
            lambda: DX.persist_minhash_index(
                spark, sf_dir, path=os.path.join(root, "alive"),
                register=False, docs=alive,
            ),
        )

        # -- nkey ledger: delete vs rebuild -----------------------------
        nk = DX.persist_nkey_index(
            spark, sf_dir, path=os.path.join(root, "nk"), register=False,
            docs=d,
        )
        tomb_docs = d.join(
            tomb.select(F.col("_id").alias("doc_id")), "doc_id", "left_semi"
        )
        timed(
            "nkey_delete_s",
            lambda: DX.delete_from_nkey_index(spark, nk, tomb_docs),
        )
        timed(
            "nkey_delete_rebuild_s",
            lambda: DX.persist_nkey_index(
                spark, sf_dir, path=os.path.join(root, "nkalive"),
                register=False, docs=alive,
            ),
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        DX.clear_dedup_indexes()

    out["delete_vs_rebuild"] = round(
        out["minhash_delete_rebuild_s"] / max(out["minhash_delete_s"], 1e-9), 2
    )
    out["nkey_delete_vs_rebuild"] = round(
        out["nkey_delete_rebuild_s"] / max(out["nkey_delete_s"], 1e-9), 2
    )
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
