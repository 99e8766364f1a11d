#!/usr/bin/env python
"""Recall-vs-append-fraction for the frozen-centroid IVF index, and
what the drift-aware rebalance buys back (round-16 verdict #4's
measured half).

Scenario: the index is built over history (``vec_id % 10 != 3``) with
centroids frozen at build time. Arriving batches are the held-out
slice with a DISTRIBUTION SHIFT — each vector's components rotated by
one position (deterministic, norm-preserving; rotation preserves the
slice's internal neighbor structure while moving it off the build
centroids' manifold, the "new domain arrives" failure mode). Batches
append in growing md5 sub-slices; after each fraction the tool
records mean recall@10 of the 4-probe indexed search vs exact brute
force over the CURRENT corpus, for two 20-vector probe panels:

- ``recall_hist`` — 20 deterministic history vectors
  (in-distribution: the frozen layout should keep serving these).
- ``recall_drift`` — 20 drifted vectors (their true neighbors are
  other drifted vectors; the frozen centroids never learned that
  region, so routing is arbitrary — THE recall the freeze silently
  loses).

Then ``ivf_rebalance_cells`` splits the flagged cells (profile-pair
drift detection) and both panels re-measure with the grown centroid
list at the SAME n_probe — any recovery is bought by the repair, not
by probing wider. Correctness of append==rebuild and of the repair
cycle are pinned tests (tests/test_ann_index.py); this tool measures
the recall economics at corpus scale for BASELINE.md.

Two modes (both reported in BASELINE.md — they answer different
halves of the question):

- ``corpus`` (default): the natural embeddings table. This corpus is
  measured ISOTROPIC (within-label mean cosine 8e-4 ≈ cross-label
  -3e-5 at sf0.1), so rotation "drift" moves nothing off any
  manifold: the correct detector behavior is to flag NOTHING and the
  correct recall behavior is no change — the no-false-positive half.
- ``planted N``: a deterministic structured corpus (N history
  vectors in 16 clusters: one-hot spike + md5 jitter, no RNG); the
  arriving batch is a coherent NEW cluster on unused dimensions.
  With exact in-cell rerank, a coherent drift CO-ROUTES queries and
  their targets (both argmax to the same frozen cell), so IVF-flat
  recall largely survives the freeze — what the fat cell actually
  costs is PROBE SCAN MASS: every probe that touches it reranks the
  buried batch too. The tool therefore records, for the drifted
  panel, both recall@10 AND the mean scanned-row fraction per probe;
  the rebalance should restore the scan economy (split cell → the
  batch gets its own cell → probes shrink back toward n_probe/n_cells
  of the corpus) at equal-or-better recall and the SAME n_probe.
  (The geometry where drift DOES cost recall — query leaning to a
  different cell than its buried targets — is pinned at unit scale in
  tests/test_ann_index.py; it needs a routing mismatch this
  panel-mean measurement would average away.)

Usage: python tools/ivf_drift_ab.py [sf_dir] [planted N]
       (default: corpus mode at /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from etl_project_spark.catalog import read_table
    from etl_project_spark.operators import similarity as SIM
    from etl_project_spark.session import get_spark

    spark = get_spark("ivf-drift-ab")
    planted = len(sys.argv) > 2 and sys.argv[2] == "planted"
    out: dict = {
        "sf_dir": sf_dir,
        "mode": "planted" if planted else "corpus",
        "n_cells": 16,
        "n_probe": 4,
        "k": 10,
    }
    path = os.path.join(tempfile.mkdtemp(prefix="ivf_drift_"), "ivf")

    if planted:
        n_hist = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
        out["n_hist"] = n_hist
        dim, n_clusters = 64, 16

        def jitter(k):
            # deterministic per-(vector, dim) noise in [-0.175, 0.175]
            h = F.conv(
                F.substring(
                    F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(f"_{k}"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("double")
            return (h % 1000) / 1000.0 * 0.35 - 0.175

        def clustered(base, spike_dims):
            cl = F.col("vec_id") % n_clusters
            comps = []
            for k in range(dim):
                c = jitter(k)
                if spike_dims is None:
                    c = c + F.when(cl == k, F.lit(1.0)).otherwise(F.lit(0.0))
                elif k in spike_dims:
                    c = c + F.lit(1.0)
                comps.append(c.cast("float"))
            return base.select("vec_id", F.array(*comps).alias("embedding"))

        hist = clustered(spark.range(n_hist).withColumnRenamed("id", "vec_id"), None)
        # the arriving batch: one coherent NEW cluster on dims history
        # never used (40/41) — 10% of history size
        shifted = clustered(
            spark.range(1_000_000, 1_000_000 + n_hist // 10).withColumnRenamed(
                "id", "vec_id"
            ),
            spike_dims={40, 41},
        )
        hist = hist.persist()
        shifted = shifted.persist()
        hist.count(), shifted.count()
    else:
        e = read_table(spark, sf_dir, "embeddings")
        hist = e.filter(F.col("vec_id") % 10 != 3).select("vec_id", "embedding")
        rot = lambda c: F.concat(F.slice(c, 2, 1 << 20), F.slice(c, 1, 1))  # noqa: E731
        shifted = (
            e.filter(F.col("vec_id") % 10 == 3)
            .select("vec_id", rot(F.col("embedding")).alias("embedding"))
        )
    bucket = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 4
    )

    cents = SIM.deterministic_centroids(hist, "embedding", "vec_id", n_cells=16)
    if planted:
        # clean per-cluster cells: Lloyd-refine the strided seeds so the
        # build-time layout is the tight one a production build trains
        cents = SIM.kmeans_refine(hist, "embedding", cents, n_iter=3)
    SIM.ivf_write_index(hist, "embedding", cents, path, id_col="vec_id")
    build_profile = SIM.ivf_cell_profile(
        spark.read.parquet(path), "embedding", cents
    )
    build_profile.persist().count()

    # probe panels: 20 deterministic vectors each, fixed for the run
    hist_panel = [
        (r.vec_id, list(map(float, r.embedding)))
        for r in hist.orderBy("vec_id").limit(200).collect()
    ][::10]
    drift_panel = [
        (r.vec_id, list(map(float, r.embedding)))
        for r in shifted.orderBy("vec_id").limit(200).collect()
    ][::10]

    def corpus(upto):
        return hist.unionByName(shifted.filter(bucket < upto))

    def cell_sizes():
        return {
            int(r["_cell"]): r["n"]
            for r in spark.read.parquet(path)
            .groupBy("_cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    def mean_recall(panel, centroids, upto):
        """(mean recall@10, mean scanned-row fraction) for a probe
        panel — the fraction is what each 4-probe rerank actually
        reads of the index, the cost axis fat drifted cells move."""
        full = corpus(upto).persist()
        full.count()
        sizes = cell_sizes()
        total_rows = sum(sizes.values())
        try:
            total, scanned = 0.0, 0.0
            for qid, qv in panel:
                truth = {
                    r.vec_id
                    for r in SIM.brute_force_topk(
                        full, "embedding", qv, k=10, id_col="vec_id"
                    ).collect()
                }
                got = {
                    r.vec_id
                    for r in SIM.ivf_topk_indexed(
                        spark, path, "embedding", qv, centroids,
                        k=10, id_col="vec_id", n_probe=4,
                    ).collect()
                }
                total += len(got & truth) / 10.0
                probe = SIM.probe_cells(qv, centroids, 4)
                scanned += sum(sizes.get(c, 0) for c in probe) / total_rows
            return (
                round(total / len(panel), 3),
                round(scanned / len(panel), 3),
            )
        finally:
            full.unpersist()

    steps = []
    appended = 0
    for upto in (1, 2, 4):  # 25%, 50%, 100% of the drifted slice
        delta = shifted.filter((bucket >= appended) & (bucket < upto))
        SIM.ivf_append_index(delta, "embedding", cents, path, id_col="vec_id")
        appended = upto
        profile = SIM.ivf_cell_profile(
            spark.read.parquet(path), "embedding", cents
        )
        flagged = SIM.ivf_drifted_cells(build_profile, profile)
        rh, sh = mean_recall(hist_panel, cents, upto)
        rd, sd = mean_recall(drift_panel, cents, upto)
        steps.append(
            {
                "fraction": round(upto / 4.0, 2),
                "appended_rows": shifted.filter(bucket < upto).count(),
                "flagged_cells": flagged,
                "recall_hist": rh,
                "scanfrac_hist": sh,
                "recall_drift": rd,
                "scanfrac_drift": sd,
            }
        )
        print(json.dumps(steps[-1]), flush=True)

    profile = SIM.ivf_cell_profile(spark.read.parquet(path), "embedding", cents)
    flagged = SIM.ivf_drifted_cells(build_profile, profile)
    grown = SIM.ivf_rebalance_cells(
        spark, path, "embedding", cents, flagged, id_col="vec_id"
    )
    out["steps"] = steps
    out["rebalanced_cells"] = flagged
    out["n_centroids_after"] = len(grown)
    rh, sh = mean_recall(hist_panel, grown, 4)
    rd, sd = mean_recall(drift_panel, grown, 4)
    out["recall_hist_after_rebalance"] = rh
    out["scanfrac_hist_after_rebalance"] = sh
    out["recall_drift_after_rebalance"] = rd
    out["scanfrac_drift_after_rebalance"] = sd
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
