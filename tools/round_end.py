#!/usr/bin/env python
"""Round-end ritual, one command (r9 verdict #3: PLANS.md went stale
because regeneration was a memory, not a mechanism).

Runs, in order, failing fast:
  1. tools/gen_plans.py        — regenerate PLANS.md; FAILS if any
                                 headline plan grew an unpartitioned
                                 WindowExec with no bounded-frame audit
  2. tools/verify_driver.py    — driver-contract spot check (sf0.01)
  3. bench.py                  — full headline bench at $SPARK_GRAFT_SF_DIR
                                 (default sf0.1), JSON line to stdout
                                 and /tmp/bench_round_end.json

Usage: python tools/round_end.py
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(tag: str, cmd: list[str], **kw) -> subprocess.CompletedProcess:
    print(f"== {tag}: {' '.join(cmd)}", flush=True)
    r = subprocess.run(cmd, cwd=REPO, **kw)
    if r.returncode != 0:
        print(f"FAIL at {tag} (rc={r.returncode})")
        sys.exit(r.returncode)
    return r


def main() -> None:
    py = sys.executable
    run("plans", [py, "tools/gen_plans.py"])
    run("driver-contract", [py, "tools/verify_driver.py"])
    # keep stderr in a file (not DEVNULL) so a bench failure is
    # diagnosable after the earlier stages already spent minutes
    with open("/tmp/bench_round_end.err", "w") as errf:
        r = run(
            "bench",
            [py, "bench.py"],
            stdout=subprocess.PIPE,
            stderr=errf,
            text=True,
        )
    lines = r.stdout.strip().splitlines()
    if not lines:
        print("FAIL: bench.py exited 0 but printed nothing — see /tmp/bench_round_end.err")
        sys.exit(1)
    line = lines[-1]
    print(line)
    with open("/tmp/bench_round_end.json", "w") as f:
        f.write(line + "\n")
    print("round-end ritual: ALL GREEN")


if __name__ == "__main__":
    main()
