#!/usr/bin/env python
"""Regenerate PLANS.md: physical-plan evidence for the headline queries.

For each bench query, records the scan pushdown (PushedFilters), pruned
read schemas, join strategies, shuffle (Exchange) count, and
whole-stage-codegen span count — the checkable artifacts of the 100 TB
design rules in README.md.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEADER = """# PLANS — physical-plan evidence for the headline queries

Auto-generated (`python tools/gen_plans.py`) from `.explain("formatted")`
at sf0.01. What to look for, per the 100 TB design rules in README.md:
scans show `PushedFilters` + pruned `ReadSchema`; small dims join as
`BroadcastHashJoin` (no shuffle); `Exchange` nodes are the shuffles —
each one is intentional; `Batched: true` scans are the vectorized
parquet reader. Python stages (`MapInPandas`/`ArrowEvalPython`) appear
only where semantics require Python (external-service enrichment,
binary decode, numpy fingerprints).
"""

#: Non-bench queries whose physical shape is itself the evidence:
#: decorrelated EXISTS/NOT-EXISTS, broadcast-heavy multiway join,
#: hashed-gram contamination join, SQL-text entry, value-based RANGE
#: frame, Arrow grouped-agg UDF, salted skew agg, pushdown-able sample.
EXTRA_PLANS = (
    "q_orders_returned_never_audited",
    "q_nation_pair_volume",
    "q_sql_region_priority_revenue",
    "q_range_frame_price_neighbors",
    "q_grouped_agg_pandas_weighted_disc",
    "q_salted_skew_agg",
    "q_hash_sample_documents",
    # round-5 additions
    "q_pagerank_order_graph",
    "q_monthly_cohort_retention",
    "q_attribution_last_touch",
    "q_scd2_user_state_intervals",
    "q_rolling_7d_distinct_users",
    "q_dedup_canonical_docs",
    "q_data_quality_audit",
    "q_key_skew_profile",
    "q_mixture_resample",
    "q_winsorized_price_stats",
    "q_gopher_repetition_rules",
    "q_unigram_cross_entropy",
    "q_source_token_kl",
    "q_haversine_distance_bands",
    "q_asof_tolerance_error_before_purchase",
    "q_sql_recursive_compound_balance",
    # round-10 additions
    "q_pq_adc_topk",
    "q_knn_ivfpq_topk",
    "q_hard_negative_mining",
    "q_knn_join_labels",
)


#: Queries whose plans legitimately contain an UNPARTITIONED window —
#: each audited to run over a provably bounded frame (post-limit top-k
#: tables, decile/bin/month rollups, the fixed 64-dim spectrum, ≤nb
#: bucket-offset tables). Any query NOT listed here whose headline plan
#: grows an unpartitioned WindowExec fails this script — the structural
#: guard the r9 verdict asked for (the q_bpe_learned_merges full-vocab
#: window shipped precisely because nothing tripped on it).
BOUNDED_UNPARTITIONED_WINDOWS: dict[str, str] = {
    "q_max_concurrent_open_orders": (
        "exclusive carry over the month-totals table (one row per "
        "month; in-month running sums are partitioned by month)"
    ),
    "q_countmin_token_freq": (
        "rank over the 20 survivors of a TakeOrderedAndProject top-k "
        "cut, never the vocabulary table"
    ),
    "q_pq_adc_topk": (
        "rank over the 10 survivors of the ADC TakeOrderedAndProject "
        "cut"
    ),
    "q_knn_ivfpq_topk": (
        "rank over the 10 survivors of the ADC TakeOrderedAndProject "
        "cut"
    ),
    "q_pq_adc_indexed_topk": (
        "rank over the 10 survivors of the ADC TakeOrderedAndProject "
        "cut (served from the persisted code index)"
    ),
}


def _unpartitioned_windows(formatted: str) -> int:
    """Count Window nodes with NO partition spec in a formatted plan.

    In explain('formatted') details, a Window node's Arguments line is
    ``[funcs], [partitionExprs], [orderExprs]`` when partitioned and
    only ``[funcs], [orderExprs]`` when not — two top-level bracket
    lists instead of three. A partitioned-but-UNORDERED window
    (``partitionBy(k)`` + count/sum over the whole frame) also prints
    two lists, but its trailing list is partition columns with no
    ASC/DESC markers — only sort markers in the last list mean the
    sort is global.
    """
    n = 0
    lines = formatted.splitlines()
    for i, line in enumerate(lines):
        if re.match(r"^\(\d+\) Window", line.strip()):
            for arg in lines[i : i + 6]:
                if arg.strip().startswith("Arguments: [") and "windowspecdefinition" in arg:
                    parts = re.split(r"\], \[", arg)
                    if len(parts) == 2 and re.search(r" (ASC|DESC)\b", parts[-1]):
                        n += 1
                    break
    return n


def main() -> None:
    import __spark_entry__ as mod
    from bench import BENCH_QUERIES
    from etl_project_spark.session import get_spark

    spark = get_spark("gen-plans", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    qs = mod.queries()
    sf = os.path.join(os.path.dirname(REPO), "testdata", "sf0.01")
    if not os.path.isdir(sf):
        sf = "/root/testdata/sf0.01"

    out = [HEADER]
    seen: set[str] = set()
    window_failures: list[str] = []
    for name in tuple(BENCH_QUERIES) + ("---",) + EXTRA_PLANS:
        if name == "---":
            out.append(
                "\n---\n\n# Operator-shape evidence (non-bench queries)\n"
            )
            continue
        # A query can sit in both BENCH_QUERIES and EXTRA_PLANS (bench
        # promotion keeps the old EXTRA entry); emit each section once.
        if name in seen:
            continue
        seen.add(name)
        df = qs[name](spark, sf)
        qe = df._jdf.queryExecution()
        formatted = qe.explainString(mode.fromString("formatted"))
        tree = formatted.split("\n\n")[0]

        def uniq(op: str) -> int:
            # The formatted tree reprints an InMemoryRelation's child
            # plan under EVERY InMemoryTableScan referencing it, so raw
            # substring counts inflate with each cache reference (the
            # round-6 pagerank "28 exchanges" was this artifact). Node
            # ids are stable across reprints — count distinct ids.
            return len(set(re.findall(rf"\b{op}(?:\s+\w+)*\s+\((\d+)\)", tree)))

        n_exch = uniq("Exchange")  # \b keeps BroadcastExchange out, as before
        n_bhj = uniq("BroadcastHashJoin")
        n_smj = uniq("SortMergeJoin")
        n_batched = formatted.count("Batched: true")
        pushed = sorted(
            {l.strip() for l in formatted.splitlines() if "PushedFilters" in l and "[]" not in l}
        )
        schemas = sorted(
            {l.strip()[:130] for l in formatted.splitlines() if "ReadSchema" in l}
        )
        pystages = sorted(
            set(
                re.findall(
                    r"(MapInPandas|ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas)",
                    tree,
                )
            )
        )
        out.append(f"## {name}\n")
        stats = (
            f"- shuffles (Exchange): {n_exch} · broadcast joins: {n_bhj}"
            f" · sort-merge joins: {n_smj} · vectorized scans: {n_batched}"
        )
        if pystages:
            stats += " · Python stages: " + ", ".join(pystages)
        n_upw = _unpartitioned_windows(formatted)
        if n_upw:
            reason = BOUNDED_UNPARTITIONED_WINDOWS.get(name)
            if reason is None:
                window_failures.append(name)
                stats += f" · **UNPARTITIONED WINDOWS: {n_upw} (UNAUDITED)**"
            else:
                stats += f" · unpartitioned windows: {n_upw} (bounded: {reason})"
        out.append(stats)
        if pushed:
            out.append("- pushdown: " + "; ".join(p[:140] for p in pushed[:4]))
        if schemas:
            out.append(
                "- read schemas: "
                + " | ".join(s.replace("ReadSchema: ", "") for s in schemas[:4])
            )
        out.append("")
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()
    if window_failures:
        print(
            "FAIL: unpartitioned WindowExec in headline plan(s) with no "
            f"bounded-frame audit entry: {window_failures} — either fix the "
            "plan (orderBy().limit() / two-phase bucket scheme) or add an "
            "audited reason to BOUNDED_UNPARTITIONED_WINDOWS."
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
