"""Semantic properties for the round-13 late additions (CDC chunking,
Holt-Winters, PCA power iteration) — assertions the hash-parity gate
can't express: boundary resynchronization, closed-form fixpoints, and
spectral concentration on planted structure.
"""

from __future__ import annotations

import datetime
import hashlib
import os
import tempfile

from pyspark.sql import functions as F


def _varied_text(n_words: int, salt: str) -> str:
    """Deterministic, hash-varied words so CDC boundaries actually fire."""
    return " ".join(
        hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:7] for i in range(n_words)
    )


def _reassemble(base: str, chunks: list[str]) -> list[str]:
    """Order a chunk multiset into partition order by backtracking
    prefix search against ``base`` — deterministic even when two
    chunks have identical content (where ``sort(key=base.find)``
    breaks), and exact when one chunk is a proper prefix of another
    starting at the same offset (where a greedy walk can pick the
    short one, dead-end, and spuriously fail a correct multiset —
    ADVICE r14). Longest-first ordering makes the common case
    first-try; backtracking guarantees that if ANY ordering partitions
    ``base``, it is found. Returns the chunks unordered when no
    ordering works (not a partition), so the caller's join-equality
    assertion still fails with the evidence."""
    from collections import Counter

    remaining = Counter(chunks)
    n_left = len(chunks)
    out: list[str] = []

    def walk(pos: int) -> bool:
        nonlocal n_left
        if pos == len(base):
            return n_left == 0
        for c in sorted(
            (c for c, cnt in remaining.items() if cnt and base.startswith(c, pos)),
            key=len,
            reverse=True,
        ):
            remaining[c] -= 1
            n_left -= 1
            out.append(c)
            if walk(pos + len(c)):
                return True
            out.pop()
            n_left += 1
            remaining[c] += 1
        return False

    return out if walk(0) else list(chunks)


def test_cdc_boundaries_resynchronize_after_prefix_insertion(spark):
    """The CDC selling point, asserted directly: insert bytes at the
    front of a document and every original chunk except (at most) the
    first must reappear verbatim in the perturbed document's chunk set
    — windows 16 bytes past the insertion see identical content, so
    the boundaries re-lock. Fixed-size blocking shares ~nothing."""
    from etl_project_spark.plans.dedup import _cdc_chunk_frame

    base = _varied_text(50, "cdc-resync")  # ~400 chars, ~6 expected chunks
    rows = [
        (1, base, "en", "sA", len(base)),
        (2, "XYZQ INSERTED " + base, "en", "sB", len(base) + 14),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "documents.parquet"))
        chunks = _cdc_chunk_frame(spark, tmp).collect()
    by_doc: dict[int, list[str]] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r.chunk)
    assert len(by_doc[1]) >= 3, "fixture too smooth: no boundaries fired"
    # reconstruction: the chunk multiset partitions the document
    # exactly (find()-keyed ordering would misplace duplicate chunk
    # content — derive offsets deterministically instead, ADVICE r13)
    assert "".join(_reassemble(base, by_doc[1])) == base
    missing = [c for c in by_doc[1] if c not in by_doc[2]]
    # only the first chunk of the original may fail to re-lock
    assert len(missing) <= 1, f"resynchronization failed for {len(missing)} chunks"


def test_cdc_chunks_partition_each_document(spark):
    """Chunks are a partition of the document: they concatenate (in
    offset order) back to the exact text, with no gaps or overlaps."""
    from etl_project_spark.plans.dedup import _cdc_chunk_frame

    base = _varied_text(60, "cdc-partition")
    df = spark.createDataFrame(
        [(1, base, "en", "sA", len(base))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "documents.parquet"))
        got = [r.chunk for r in _cdc_chunk_frame(spark, tmp).collect()]
    # order-independent reassembly: greedy prefix-match over the chunk
    # MULTISET (find()-keyed sorting maps duplicate chunk content to
    # the first occurrence's offset and can mis-order a correct
    # partition, ADVICE r13)
    assert "".join(_reassemble(base, got)) == base


def test_holt_winters_exact_on_perfectly_periodic_series(spark):
    """Closed-form fixpoint: on x_t = pattern[t mod 4] the classical
    seed is already exact, so every update is the identity — final
    level = mean, trend = 0, next season = pattern[next] - mean, and
    the one-step forecast equals the true next value."""
    from etl_project_spark.plans.registry import all_specs

    pattern = [10.0, 20.0, 30.0, 40.0]
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(hours=i), 7, "view", pattern[i % 4], "{}")
        for i in range(12)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "events.parquet"))
        out = (
            all_specs()["q_holt_winters_seasonal"].builder(spark, tmp).collect()
        )
    assert len(out) == 1
    r = out[0]
    assert (r.n_events, r.hw_level, r.hw_trend) == (12, 25.0, 0.0)
    # 12 values consumed -> next position is 13 == 1 (mod 4) -> season 10-25
    assert r.hw_season_next == -15.0
    assert r.forecast_next == 10.0


def test_pca_power_iteration_concentrates_on_planted_direction(spark):
    """Plant one high-variance dim among near-constant dims: the top
    loading must concentrate there (|loading| > 0.99), the Rayleigh
    eigenvalue must approximate that dim's variance, and the loading
    vector must be unit-norm."""
    from etl_project_spark.plans.registry import all_specs

    n = 64
    rows = [
        (
            i,
            [float(10.0 if i % 2 == 0 else -10.0) if d == 4 else 0.01 * ((i * 7 + d) % 5)
             for d in range(64)],
            i % 3,
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "embeddings.parquet"))
        out = all_specs()["q_pca_power_iteration"].builder(spark, tmp).collect()
    assert len(out) == 16
    by_dim = {r.dim_i: r for r in out}
    # planted dim is embedding[5] 1-based (d == 4 zero-based)
    assert abs(by_dim[5].loading) > 0.99
    assert abs(by_dim[5].eigenvalue - 100.0) < 1.0  # var of +/-10 split
    norm = sum(r.loading ** 2 for r in out)
    assert abs(norm - 1.0) < 1e-3
    for r in out:
        assert 0.0 < r.explained_var_ratio <= 1.0
