"""Persisted near-dup serving indexes for the documents table — the
amortization layer the one-shot dedup queries lack (round-12 verdict
task #7).

``q_incremental_dedup_new_batch`` and the stream-static twins re-derive
the HISTORY side's fingerprints on every run: the gram inverted index
(``doc_gram_index``) and the SimHash postings (``history_simhash_index``)
are both pure functions of the history corpus, which in the incremental
topology changes far more slowly than the arriving batches. A real
100 TB serving workload pays the history scan ONCE and answers every
subsequent batch from the persisted index — the same asymmetric
economics as the PQ/IVF layer (:mod:`etl_project_spark.sources.ann_index`).

Mechanism mirrors ``ann_index``: ``persist_gram_index`` /
``persist_simhash_index`` build the frame once with THE shared builder
(so served and inflight rows are definitionally identical), write it to
parquet, and register the layout in a process-local map keyed by the
corpus dir + build parameters. Consumers (the batch incremental plan,
or a caller wiring up the streaming twins) ask ``*_index_for`` and fall
back to the inflight builder when nothing matches. Registration is an
explicit session opt-in, so the driver's correctness runs (no
registration) always exercise the self-contained path; parity between
the two paths is asserted by ``tests/test_dedup_index.py``.

A parameter mismatch means "no index", never "close enough": grams
hashed at a different ``n`` (or postings built for a different Hamming
budget / block split) are not an answer, they are a wrong answer.

In production both tables would be bucketed by their join key (``_g``;
``(_cmask, _key)``) so the per-batch probe join is shuffle-free on the
history side — the plumbing here keeps plain parquet (the bucketed
layout registry in :mod:`etl_project_spark.sources.bucketed` shows the
bucketed variant of the same pattern).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

#: The history predicate of the incremental topology: everything that
#: is not the arriving batch. One definition shared by the persist
#: builders and the batch plan so they can never disagree about what
#: "history" means.
BATCH_SOURCE = "src19"


class GramIndex:
    """Handle for one persisted gram inverted index.

    ``owns_path``: True when the module allocated the temp directory
    itself (caller passed ``path=None``) — such directories are deleted
    when the registry entry is replaced or cleared, so repeat rebuilds
    in a long-lived session cannot accumulate orphaned parquet dirs.
    Caller-supplied paths are never deleted (the caller owns them).
    """

    __slots__ = ("path", "n", "owns_path")

    def __init__(self, path: str, n: int, owns_path: bool = False) -> None:
        self.path = path
        self.n = n
        self.owns_path = owns_path


class SimHashIndex:
    """Handle for one persisted SimHash posting index (same
    ``owns_path`` cleanup contract as :class:`GramIndex`)."""

    __slots__ = ("path", "max_hamming", "eq_blocks", "owns_path")

    def __init__(
        self,
        path: str,
        max_hamming: int,
        eq_blocks: int,
        owns_path: bool = False,
    ) -> None:
        self.path = path
        self.max_hamming = max_hamming
        self.eq_blocks = eq_blocks
        self.owns_path = owns_path


_GRAM: dict[str, GramIndex] = {}
_SIMHASH: dict[str, SimHashIndex] = {}


def _drop(idx) -> None:
    """Delete a module-owned index directory (no-op for caller paths)."""
    if idx is not None and idx.owns_path:
        shutil.rmtree(os.path.dirname(idx.path), ignore_errors=True)


def clear_dedup_indexes() -> None:
    for idx in (*_GRAM.values(), *_SIMHASH.values()):
        _drop(idx)
    _GRAM.clear()
    _SIMHASH.clear()


def _history_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from etl_project_spark.catalog import read_table

    return read_table(spark, sf_dir, "documents").filter(
        F.col("source") != BATCH_SOURCE
    )


def persist_gram_index(
    spark: SparkSession, sf_dir: str, *, n: int = 3, path: str | None = None
) -> GramIndex:
    """Build the history gram inverted index ``(_hid, _szh, _g)`` once
    (``history_gram_index``'s codegen row form over every non-batch
    source), write it to parquet, and register it for ``sf_dir``."""
    from etl_project_spark.streaming.dedup import history_gram_index

    owns = path is None
    if path is None:
        path = tempfile.mkdtemp(prefix="gram_index_")
    target = os.path.join(path, f"grams_n{n}")
    history_gram_index(_history_docs(spark, sf_dir), n=n).write.mode(
        "overwrite"
    ).parquet(target)
    idx = GramIndex(target, n, owns_path=owns)
    key = os.path.abspath(sf_dir)
    _drop(_GRAM.get(key))  # rebuild: reap the replaced module-owned dir
    _GRAM[key] = idx
    return idx


def gram_index_for(sf_dir: str, *, n: int) -> GramIndex | None:
    idx = _GRAM.get(os.path.abspath(sf_dir))
    if idx is not None and idx.n == n:
        return idx
    return None


def load_gram_index(spark: SparkSession, idx: GramIndex) -> DataFrame:
    return spark.read.parquet(idx.path)


def persist_simhash_index(
    spark: SparkSession,
    sf_dir: str,
    *,
    max_hamming: int = 3,
    eq_blocks: int = 2,
    path: str | None = None,
) -> SimHashIndex:
    """Build the history SimHash posting index ``(_hid, _hsim, _cmask,
    _key)`` once (the shared ``history_simhash_index`` layout), write it
    to parquet, and register it for ``sf_dir``."""
    from etl_project_spark.streaming.dedup import history_simhash_index

    owns = path is None
    if path is None:
        path = tempfile.mkdtemp(prefix="simhash_index_")
    target = os.path.join(path, f"postings_h{max_hamming}b{eq_blocks}")
    history_simhash_index(
        _history_docs(spark, sf_dir),
        max_hamming=max_hamming,
        eq_blocks=eq_blocks,
    ).write.mode("overwrite").parquet(target)
    idx = SimHashIndex(target, max_hamming, eq_blocks, owns_path=owns)
    key = os.path.abspath(sf_dir)
    _drop(_SIMHASH.get(key))  # rebuild: reap the replaced module-owned dir
    _SIMHASH[key] = idx
    return idx


def simhash_index_for(
    sf_dir: str, *, max_hamming: int, eq_blocks: int
) -> SimHashIndex | None:
    idx = _SIMHASH.get(os.path.abspath(sf_dir))
    if (
        idx is not None
        and idx.max_hamming == max_hamming
        and idx.eq_blocks == eq_blocks
    ):
        return idx
    return None


def load_simhash_index(spark: SparkSession, idx: SimHashIndex) -> DataFrame:
    return spark.read.parquet(idx.path)
