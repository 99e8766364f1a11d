#!/usr/bin/env python
"""Interleaved same-session A/B of registry queries under an env flag.

The round-17 host shows intermittent multi-x noise spikes (calib swung
0.07 -> 0.41 between back-to-back bench runs), so sequential A-then-B
timing is worthless here; this harness alternates variants A B B A A B
inside ONE session so host drift hits both arms equally.

Usage: python tools/ab_flag.py <FLAG_ENV_VAR> <query> [query ...]
  variant A: env var unset   (the new code path)
  variant B: env var set "1" (the old code path, guarded in-code)

Prints per-query medians for both variants plus every raw rep.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PATTERN = ("A", "B", "B", "A", "A", "B")


def main() -> None:
    flag, names = sys.argv[1], sys.argv[2:]
    from etl_project_spark.plans.registry import all_specs
    from etl_project_spark.session import get_spark, release_persists

    spark = get_spark("ab-flag")
    specs = all_specs()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        specs[name].builder(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        release_persists(blocking=True)
        return round(dt, 3)

    # one untimed warmup per query (JIT + page cache) under variant A
    os.environ.pop(flag, None)
    for n in names:
        run(n)

    out: dict[str, dict] = {}
    for n in names:
        reps: dict[str, list[float]] = {"A": [], "B": []}
        for v in PATTERN:
            if v == "A":
                os.environ.pop(flag, None)
            else:
                os.environ[flag] = "1"
            reps[v].append(run(n))
        os.environ.pop(flag, None)
        out[n] = {
            "A_median": statistics.median(reps["A"]),
            "B_median": statistics.median(reps["B"]),
            "A": reps["A"],
            "B": reps["B"],
        }
        print(json.dumps({n: out[n]}), flush=True)
    print(json.dumps({"flag": flag, "summary": {
        n: {"A": o["A_median"], "B": o["B_median"]} for n, o in out.items()
    }}))
    spark.stop()


if __name__ == "__main__":
    main()
