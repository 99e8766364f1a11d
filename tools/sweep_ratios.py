#!/usr/bin/env python
"""Compare two sweep outputs (e.g. sf1 vs sf10) and report per-query
scaling ratios — the adjudication table behind BASELINE.md's scale
sections.

Usage: python tools/sweep_ratios.py <small_sweep.txt> <big_sweep.txt> [threshold]

Parses `tools/sweep.py` output lines (`name   12.34s`), joins on query
name, prints every query whose big/small ratio exceeds `threshold`
(default 10.0) plus summary stats. Remember the round-10 lesson before
filing an outlier: re-measure it ISOLATED and WARM — two of r9's four
"outliers" were late-sweep session artifacts, not plan defects.
"""

from __future__ import annotations

import re
import sys


def parse(path: str) -> dict[str, float]:
    out: dict[str, float] = {}
    with open(path) as f:
        for line in f:
            m = re.match(r"^([a-zA-Z0-9_]+)\s+([0-9.]+)s\s*$", line)
            if m:
                # later occurrences win (sweep prints a sorted recap at
                # the end with identical values)
                out[m.group(1)] = float(m.group(2))
    return out


def main() -> None:
    small = parse(sys.argv[1])
    big = parse(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    common = sorted(set(small) & set(big))
    if not common:
        print("no common queries parsed")
        sys.exit(2)
    ratios = []
    for name in common:
        s, b = small[name], big[name]
        ratios.append((b / max(s, 1e-9), name, s, b))
    ratios.sort(reverse=True)
    n = len(ratios)
    vals = sorted(r[0] for r in ratios)
    med = vals[n // 2]
    mean = sum(vals) / n
    print(f"{n} common queries; ratio median {med:.2f}x mean {mean:.2f}x")
    print(f"over {thr}x:")
    for r, name, s, b in ratios:
        if r >= thr:
            print(f"  {name:45s} {s:8.2f}s -> {b:8.2f}s  ({r:.1f}x)")
    only_small = set(small) - set(big)
    only_big = set(big) - set(small)
    if only_small:
        print(f"only in small: {sorted(only_small)}")
    if only_big:
        print(f"only in big: {sorted(only_big)}")


if __name__ == "__main__":
    main()
