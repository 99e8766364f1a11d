#!/usr/bin/env python
"""Scale-up generator for the sf1 sweep (round-7 judge task #3).

The sandbox has no network (DuckDB's tpch extension can't download) and
/root/testdata is read-only, so a 10x dataset is derived from the
driver's sf0.1 drop by key-offset replication into /tmp: replica ``i``
shifts every key column by ``i * (max_key + 1)`` CONSISTENTLY across
fact and dimension tables, so join cardinalities, FK fan-outs, and
group sizes scale linearly — the property a scale sweep needs.

Two columns get per-replica perturbation so content-addressed operators
don't degenerate into a pathological workload the real corpus wouldn't
have:

- ``documents.text``: every 7th word gets a replica tag appended.
  5-gram shingle overlap across replicas drops to ~(6/7)^5 = 0.46 of
  shingles = Jaccard ~0.3, safely below near-dup thresholds — without
  this, every doc would have 9 exact clones and the LSH pair count
  would grow quadratically in the replica count instead of linearly
  with the corpus.
- ``embeddings.embedding``: element roll by replica id — a rolled
  vector is decorrelated from the original, so ANN neighborhoods stay
  sf0.1-shaped instead of every vector acquiring 9 perfect twins.

NOT for correctness oracles: sweep-only data (the oracle gate runs on
the driver's own parquet at sf0.01).

Usage: python tools/make_scale.py [out_dir] [replicas]   (default /tmp/sf1, 10)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

#: table -> {column: stride}; stride = max_key+1 at sf0.1, verified in-run.
KEYED = {
    "customer": {"c_custkey": 15_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
DIMS = ("nation", "region")  # replicated as-is (global dimensions)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied")

    for t, strides in KEYED.items():
        src = f"read_parquet('{SRC}/{t}.parquet')"
        for col, stride in strides.items():
            mx = con.execute(f"SELECT MAX({col}) FROM {src}").fetchone()[0]
            assert mx < stride, f"{t}.{col} max {mx} >= stride {stride}"
        selects = []
        for i in range(reps):
            cols = []
            schema = con.execute(f"SELECT * FROM {src} LIMIT 0").description
            for (name, *_rest) in schema:
                if name in strides:
                    cols.append(f"{name} + {i * strides[name]} AS {name}")
                elif t == "documents" and name == "text" and i > 0:
                    # tag every 7th word; \S/\s keep unicode words intact
                    cols.append(
                        "regexp_replace(text, "
                        r"'((?:\S+\s+){6}\S+)', "
                        f"'\\1_r{i}', 'g') AS text"
                    )
                elif t == "supplier" and name == "s_name":
                    # names must track the shifted keys (as real TPC-H
                    # generation would) — replicating them VERBATIM gave
                    # every name 9 exact clones and made name-blocked
                    # operators' sf1 numbers an artifact of the scale-up
                    # rather than of the plan (round-7 fuzzy-pairs triage)
                    cols.append(
                        f"'Supplier#' || lpad(CAST(s_suppkey + {i * strides['s_suppkey']} "
                        "AS VARCHAR), 9, '0') AS s_name"
                    )
                elif t == "customer" and name == "c_name":
                    cols.append(
                        f"'Customer#' || lpad(CAST(c_custkey + {i * strides['c_custkey']} "
                        "AS VARCHAR), 9, '0') AS c_name"
                    )
                elif t == "part" and name == "p_name" and i > 0:
                    # rotate the first letter per replica (length-stable)
                    cols.append(
                        "chr(97 + (ascii(substr(p_name, 1, 1)) - 97 + "
                        f"{i}) % 26) || substr(p_name, 2) AS p_name"
                    )
                elif t == "embeddings" and name == "embedding" and i > 0:
                    # roll elements by i: decorrelates replicas. dim=64,
                    # so beyond 64 replicas the roll must wrap (i mod 64)
                    # and wrapped cycles need a DIRECTION change beyond
                    # the roll — otherwise replica 64+j clones replica j
                    # and every vector gains perfect twins, collapsing
                    # the ANN sweep into clone detection (r8 sf10 fix).
                    #
                    # Roll + global sign alone admit only 64×2 = 128
                    # distinct direction transforms, so by pigeonhole
                    # replicas ≥ 129 MUST repeat one (the r10 review
                    # caught cycle 0 vs cycle 2 colliding as sets under
                    # the r9-advisory +cyc roll offset). Cycles ≥ 1
                    # therefore apply a per-cycle deterministic ±1
                    # element MASK (seeded by the cycle id): two
                    # replicas share a direction only if they share BOTH
                    # the cycle mask and the roll, and within a cycle
                    # every roll is distinct — no direction twins at ANY
                    # replica count. Magnitudes also shrink per cycle
                    # (1, 1/2, 1/4, …) so no exact value clones either.
                    cyc = i // 64
                    r = i % 64
                    rolled = (
                        f"embedding[{r + 1}:] || embedding[1:{r}]"
                        if r > 0
                        else "embedding"
                    )
                    if cyc > 0:
                        import hashlib

                        mask = []
                        denom = float(2**cyc)
                        for j in range(64):
                            h = hashlib.sha256(f"cycmask:{cyc}:{j}".encode()).digest()
                            mask.append(
                                f"{'-' if h[0] % 2 else ''}{1.0 / denom!r}"
                            )
                        mask_lit = "[" + ", ".join(mask) + "]"
                        rolled = (
                            f"list_transform(list_zip({rolled}, {mask_lit}), "
                            "p -> p[1] * p[2])"
                        )
                    cols.append(f"{rolled} AS embedding")
                else:
                    cols.append(name)
            selects.append(f"SELECT {', '.join(cols)} FROM {src}")
        union = " UNION ALL ".join(selects)
        con.execute(
            f"COPY ({union}) TO '{out}/{t}.parquet' "
            "(FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n, "rows")


if __name__ == "__main__":
    main()
