#!/usr/bin/env python
"""Headline benchmark: run the engine's flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is timed end-to-end (plan build + execution); the result is
materialized with a count-style action so no rows cross to the driver
(collect would measure driver transfer, not engine throughput). A warmup
query amortizes session/JIT startup out of the per-query numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline set: the flagship pipeline + one per operator family, chosen to
#: stress scan/filter/join/agg/window/dedup/text/similarity paths.
#:
#: ORDER IS PINNED, APPEND-ONLY (round-10 verdict #4): every query's
#: timing includes the session state (JIT, GC pressure, shuffle-file
#: cache) left by the queries BEFORE it, so inserting a query mid-list
#: silently changes what every later number means and mints spurious
#: cross-round "regressions" on untouched queries. New headline
#: queries go at the END; never reorder without recording a
#: same-host A/B of both orders in BASELINE.md.
BENCH_QUERIES = (
    "pipeline_flagship",
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q_window_top3_orders_per_customer",
    "q_sessionize_users",
    "q_asof_last_order_before_event",
    "q_token_stats_per_lang",
    "q_bpe_token_estimate",
    "q_minhash_near_dup_pairs",
    "q_simhash_near_dup_pairs",
    "q_embedding_near_dup_pairs",
    "q_knn_bruteforce_topk",
    "q_multimodal_payload_profile",
    "q_benchmark_contamination",
    "q_bm25_query_scores",
    "q_chunk_documents_overlap",
    "q_training_corpus_pipeline",
    # round-5 additions: iterative graph + cohort analytics families
    "q_pagerank_order_graph",
    "q_monthly_cohort_retention",
    # round-6 additions: real media decode + global boilerplate scrub
    "q_bmp_decoded_stats",
    "q_boilerplate_ngram_scrub",
    # round-6 additions: linkage + association + sweep-line families
    "q_sparse_cosine_doc_pairs",
    "q_copurchase_association_rules",
    "q_jaro_winkler_part_pairs",
    "q_max_concurrent_open_orders",
    # round-6 additions: learned BPE + perceptual-hash image dedup
    "q_bpe_learned_merges",
    "q_image_phash_clusters",
    # round-7 additions: scale-fixed pair families + new operator families
    "q_semantic_dedup_pairs",
    "q_knn_join_lsh",
    "q_kcore_trading_graph",
    "q_rake_keywords_per_source",
    "q_countmin_token_freq",
    "q_png_decoded_stats",
    # round-10 additions: vector quantization family (PQ/IVF-PQ/int8)
    "q_pq_adc_topk",
    "q_knn_ivfpq_topk",
    "q_int8_quantized_recall",
    # round-12 additions (append-only): persisted-index ADC serving +
    # sequence packing
    "q_pq_adc_indexed_topk",
    "q_pack_sequences_nextfit",
    # round-12 additions (append-only): substring-level dedup + k-means
    # cell curation
    "q_repeated_span_extraction",
    "q_kmeans_refined_cells",
    # round 12 additions (appended, order pinned)
    "q_rrf_fusion_topk",
    "q_mmr_diverse_topk",
    "q_adamic_adar_suppliers",
    "q_autocorr_hourly_activity",
    "q_holt_smoothing_user_value",
    "q_gif_decoded_stats",
    "q_domain_quota_cap",
    "q_bpe_encode_words",
    "q_dtw_similar_users",
    "q_dtw_topk_join",
    # round-13 additions (append-only): density-capped spatial serving +
    # incremental dedup on the shared gram-index builder
    "q_spatial_radius_cell_profile",
    "q_incremental_dedup_new_batch",
    # round-13 additions (append-only): curation trio + hashed linear
    # classifier + graph-based ANN serving
    "q_canonicalized_dedup_groups",
    "q_deterministic_shard_assignment",
    "q_per_domain_quantile_filter",
    "q_hashed_linear_quality_score",
    "q_knn_graph_expand_topk",
    # round-13 close additions (append-only): sub-document CDC dedup +
    # the two in-plan numeric folds
    "q_cdc_chunk_dedup_stats",
    "q_cdc_shared_chunk_pairs",
    "q_holt_winters_seasonal",
    "q_pca_power_iteration",
    # round-14 additions (append-only): incremental curation (batch
    # twin of the streaming pipeline) + incremental CDC chunk-store
    "q_incremental_curation_audit",
    "q_cdc_incremental_chunk_dedup",
    # round-15 additions (append-only): build-then-serve registry forms
    # of the MinHash signing index and the history nkey index
    "q_minhash_indexed_pairs",
    "q_nkey_indexed_curation_audit",
    # round-16 addition (append-only): incremental index MAINTENANCE —
    # history build + batch-only append + probe of the grown index
    "q_minhash_index_append_pairs",
    # round-16 addition (append-only): the per-cycle incremental probe
    # (batch-banded x corpus-banded candidates over the grown index)
    "q_minhash_batch_probe_pairs",
)

#: Queries that BUILD a persisted index as part of the query (write
#: parquet to /tmp, then serve from it). In the STEADY passes these are
#: phase-separated: the non-build set runs its 3 passes first, then the
#: build set runs its 3 — so the builds' page-cache/write churn can never
#: tax a non-build neighbor's steady repeat (round-15 verdict #5: the
#: interleaved form explained ~9 pts of r15's steady drift). The COLD
#: pass keeps the pinned append-only order (builds land at the tail
#: there anyway). Steady totals from r16 on are comparable
#: unconditionally; r15-and-earlier steady totals carried the
#: interleave tax (see BASELINE.md round-16 note).
BUILD_QUERIES = frozenset((
    "q_minhash_indexed_pairs",
    "q_nkey_indexed_curation_audit",
    "q_minhash_index_append_pairs",
    "q_minhash_batch_probe_pairs",
))

#: PINNED omission priority for the compact stdout line (round-14
#: verdict #5): when the line exceeds the driver's 2000-char window we
#: shed per-query entries in THIS fixed order, never by
#: cheapest-this-run — so the compact line's query set stays identical
#: round over round and BENCH_rN diffs are like-for-like. The first six
#: are exactly the set r14's line shed (all sub-0.5 s at sf0.1); the
#: tail extends with the next-cheapest sf0.1 queries so future
#: append-only additions don't force an ad-hoc choice. APPEND-ONLY,
#: same rule as BENCH_QUERIES. Every query always appears in
#: BENCH_DETAIL.json regardless.
OMIT_PRIORITY = (
    "q_domain_quota_cap",
    "q_knn_bruteforce_topk",
    "q_chunk_documents_overlap",
    "q_deterministic_shard_assignment",
    "q_per_domain_quantile_filter",
    "q_bmp_decoded_stats",
    "q_bpe_token_estimate",
    "q_image_phash_clusters",
    "q_bpe_encode_words",
    "q_token_stats_per_lang",
    "q_gif_decoded_stats",
    "q_jaro_winkler_part_pairs",
    # round-16 extension (ADVICE r15): next-cheapest sf0.1 queries, so
    # append-only growth of BENCH_QUERIES can't exhaust the pinned list
    # and trip the ad-hoc cheapest-this-run fallback.
    "q_pack_sequences_nextfit",
    "q_png_decoded_stats",
    "q_int8_quantized_recall",
    "q_autocorr_hourly_activity",
    "q_holt_smoothing_user_value",
    "q_knn_ivfpq_topk",
    "q_canonicalized_dedup_groups",
    "q_training_corpus_pipeline",
    "q_holt_winters_seasonal",
    "q_countmin_token_freq",
)


def host_calib() -> dict:
    """CPU microbench so cross-round totals can be normalized: these
    round VMs vary ±25% in wall-clock (BASELINE.md round-5 notes); a
    fixed numpy matmul + pure-Python loop timed on the same host lets
    the judge separate host speed from plan regressions."""
    import numpy as np

    a = np.random.default_rng(7).random((512, 512))
    t0 = time.perf_counter()
    for _ in range(20):
        a = a @ a / np.linalg.norm(a)
    numpy_s = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    s = 0
    for i in range(2_000_000):
        s += i % 7
    python_s = round(time.perf_counter() - t0, 4)
    return {"numpy_matmul_s": numpy_s, "python_loop_s": python_s}


def main() -> None:
    from etl_project_spark.plans.registry import all_specs
    from etl_project_spark.session import get_spark, release_persists

    # Host calib at START as well as end (round-17 verdict #6): calib
    # was measured only at run end, so a mid-run host throttle was
    # invisible in the compact line — r17's driver window degraded 4×
    # and the per-query numbers could not be machine-flagged. Both
    # readings now ship in the line; a large start/end gap marks the
    # window as throttled. Additions-only: the existing
    # calib_numpy_s (= end reading) keeps its meaning for cross-round
    # diffs.
    calib_start = host_calib()

    spark = get_spark("etl-project-spark-bench")
    specs = all_specs()

    # Warmup: touch every bench table once so OS page cache + JVM JIT are
    # warm for all queries equally, and run one trivial pandas UDF so the
    # Python worker pool is spawned (one-time ~4s for 32 workers —
    # steady-state throughput is what the bench measures).
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from etl_project_spark.catalog import TABLES, read_table

    for t in TABLES:
        read_table(spark, SF_DIR, t).count()

    @pandas_udf("long")
    def _noop(s):
        return s

    read_table(spark, SF_DIR, "embeddings").select(
        F.sum(_noop(F.col("vec_id")))
    ).collect()

    def run_all(subset: tuple[str, ...] = BENCH_QUERIES) -> dict[str, float]:
        timings: dict[str, float] = {}
        for name in subset:
            spec = specs[name]
            t0 = time.perf_counter()
            df = spec.builder(spark, SF_DIR)
            # Force full evaluation of every column (count alone lets Spark
            # prune projections); write.noop-style materialization.
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
            # Release caches the query created (pagerank graph, LSH
            # signatures, CC checkpoints) OUTSIDE its timed window: a
            # long-lived session that never unpersists accumulates
            # storage blocks across queries — the round-5 verdict's
            # CacheManager-warning finding — and each query should be
            # timed from a clean cache, same as its cold run.
            # BLOCKING: async eviction bleeds into the next query's
            # timed window and can double-reside with its shuffle —
            # the r13 sweep OOM mechanism (tools/sweep.py).
            release_persists(blocking=True)
        return timings

    timings = run_all()
    # Steady-state: codegen/JIT compiled, shuffle files warm — the
    # per-query cost a long-lived cluster session actually pays.
    # Median of 3 passes per query (round-5 advice): single-pass warm
    # numbers on these VMs carry enough scheduler noise to flip the
    # warm-vs-cold comparison on sub-second queries. Build-then-serve
    # queries run their passes AFTER the non-build set (see
    # BUILD_QUERIES): their index writes churn page cache, and
    # interleaved they taxed every neighbor's steady repeat.
    non_build = tuple(q for q in BENCH_QUERIES if q not in BUILD_QUERIES)
    build = tuple(q for q in BENCH_QUERIES if q in BUILD_QUERIES)
    passes = [run_all(non_build) for _ in range(3)]
    for p, pb in zip(passes, [run_all(build) for _ in range(3)]):
        p.update(pb)
    steady = {
        name: sorted(p[name] for p in passes)[1] for name in BENCH_QUERIES
    }

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "steady_state": {
            "value": round(sum(steady.values()), 3),
            "queries": steady,
        },
        "host_calib": host_calib(),
        "host_calib_start": calib_start,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # Full per-query detail (cold + steady + calib) goes to a side file;
    # the stdout line must stay SHORT. The driver captures only the last
    # 2000 chars of stdout — round 6's full line exceeded that, so the
    # recorded BENCH_r6.json had a beheaded JSON and "parsed": null.
    # Only the DEFAULT scale writes the canonical record: quick contract
    # checks at other SFs (sf0.01 while iterating) used to clobber the
    # committed sf0.1 record — twice in round 12.
    detail_name = (
        "BENCH_DETAIL.json"
        if SF_DIR.rstrip("/") == "/root/testdata/sf0.1"
        else f"BENCH_DETAIL_sf{sf}.json"
    )
    with open(os.path.join(REPO, detail_name), "w") as f:
        json.dump(detail, f, indent=1)
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "steady_total": detail["steady_state"]["value"],
        "calib_numpy_s": detail["host_calib"]["numpy_matmul_s"],
        "calib_start": calib_start["numpy_matmul_s"],
        "calib_end": detail["host_calib"]["numpy_matmul_s"],
        "sf": detail["sf"],
    }
    line = json.dumps(compact, separators=(",", ":"))
    # Belt-and-braces: never exceed the driver's 2000-char tail window.
    # Degrade gracefully — first shed precision, then drop queries one
    # at a time IN THE PINNED OMIT_PRIORITY ORDER (the expensive tail
    # is what gets compared against BASELINE.md) with an explicit
    # omission count, instead of discarding the whole per-query dict
    # (which the driver contract requires). Cheapest-current is only
    # the fallback once the pinned list is exhausted.
    if len(line) > 1900:
        compact["queries"] = {k: round(v, 1) for k, v in timings.items()}
        line = json.dumps(compact, separators=(",", ":"))
    omit_queue = [q for q in OMIT_PRIORITY if q in compact["queries"]]
    while len(line) > 1900 and compact["queries"]:
        if omit_queue:
            victim = omit_queue.pop(0)
        else:
            # Pinned list exhausted — shedding is now cheapest-this-run,
            # i.e. nondeterministic round-over-round. Mark it loudly
            # (ADVICE r15) so a drifting compact line is attributable,
            # and extend OMIT_PRIORITY before this can fire again.
            victim = min(compact["queries"], key=compact["queries"].get)
            compact["queries_omitted_adhoc"] = (
                compact.get("queries_omitted_adhoc", 0) + 1
            )
        del compact["queries"][victim]
        compact["queries_omitted"] = compact.get("queries_omitted", 0) + 1
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
