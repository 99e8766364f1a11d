#!/usr/bin/env python
"""Distinct-operator stats for a formatted plan dump: Exchange and join
nodes deduped by plan_id (the cached-relation subtree is re-printed per
InMemoryTableScan, so raw grep-counts overstate shuffles)."""
import re
import sys

for path in sys.argv[1:]:
    txt = open(path).read()
    ex = set(re.findall(r"Arguments: \w*[Hh]ashpartitioning\(([^)]*?), \d+\), (\w+), \[plan_id=(\d+)\]", txt))
    ex_ids = {t[2] for t in ex}
    sp = set(re.findall(r"Arguments: (SinglePartition|rangepartitioning[^\[]*), \[plan_id=(\d+)\]", txt))
    joins = re.findall(r"\(\d+\) (SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|CartesianProduct|BroadcastNestedLoopJoin)", txt)
    py = re.findall(r"\(\d+\) (BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas)", txt)
    from collections import Counter
    print(f"{path.split('/')[-1]}: exchanges={len(ex_ids) + len(sp)} "
          f"joins={dict(Counter(joins))} py={dict(Counter(py))}")
    for cols, kind, pid in sorted(ex, key=lambda t: int(t[2])):
        print(f"   hash({cols.split(chr(44))[0].split('#')[0]},...) {kind} id={pid}")
