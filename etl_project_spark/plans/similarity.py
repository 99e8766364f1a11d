"""Similarity-search queries over ``embeddings``.

The brute-force cosine top-k IS oracle-checkable thanks to DuckDB's
``list_cosine_similarity`` — both engines compute the same double-
precision expression, rounded to 4 decimals before ranking ties are
broken by id. The LSH-bucketed ANN variants are ALSO oracle-backed:
each returns the exact result annotated with an in-plan ``lsh_found``
recall boolean that the oracle pins TRUE (the LSH is seeded and
deterministic, so a recall miss is a hard hash failure, not flake).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from etl_project_spark.catalog import read_table
from etl_project_spark.operators import similarity as SIM
from etl_project_spark.plans.registry import register
from etl_project_spark.session import tune_session

#: Deterministic unit-ish query vector: alternating ramp, 64 dims.
#: A fixed literal (not data-derived) so Spark and the oracle agree.
QUERY_VEC = [((i % 7) - 3.0) / 3.0 for i in range(64)]

_QUERY_SQL_ARRAY = "[" + ", ".join(f"{v!r}" for v in QUERY_VEC) + "]"

#: The query vector shifted by +0.01 per coordinate — a planted near-
#: duplicate (cosine ≈ 0.997 to QUERY_VEC, while the corpus maxes out
#: near 0.34).  Computed driver-side in Python doubles and emitted as a
#: repr literal, so Spark and DuckDB hold bit-identical values.
PLANTED_VEC = [v + 0.01 for v in QUERY_VEC]

_PLANTED_SQL_ARRAY = "[" + ", ".join(f"{v!r}" for v in PLANTED_VEC) + "]"


@register(
    "q_knn_bruteforce_topk",
    oracle=f"""
SELECT vec_id, score, CAST(rank AS INTEGER) AS rank FROM (
  SELECT vec_id,
         ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                      CAST({_QUERY_SQL_ARRAY} AS DOUBLE[])), 4) AS score,
         ROW_NUMBER() OVER (ORDER BY ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                      CAST({_QUERY_SQL_ARRAY} AS DOUBLE[])), 4) DESC, vec_id) AS rank
  FROM embeddings
)
WHERE rank <= 10
""",
    tags=("similarity", "topk"),
)
def q_knn_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors of a fixed query vector."""
    tune_session(spark)
    e = read_table(spark, sf_dir, "embeddings")
    return SIM.brute_force_topk(e, "embedding", QUERY_VEC, k=10, id_col="vec_id")


@register(
    "q_knn_lsh_topk",
    oracle=f"""
WITH corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
  UNION ALL
  SELECT 90001, CAST({_PLANTED_SQL_ARRAY} AS DOUBLE[])
)
SELECT vec_id, score, CAST(rank AS INTEGER) AS rank FROM (
  SELECT vec_id,
         ROUND(list_cosine_similarity(emb, CAST({_QUERY_SQL_ARRAY} AS DOUBLE[])), 4) AS score,
         ROW_NUMBER() OVER (ORDER BY ROUND(list_cosine_similarity(emb,
                                      CAST({_QUERY_SQL_ARRAY} AS DOUBLE[])), 4) DESC, vec_id) AS rank
  FROM corpus
)
WHERE rank <= 10 AND score >= 0.9
""",
    tags=("similarity", "ann"),
)
def q_knn_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via multi-table hyperplane LSH (8×6 bits) —
    oracle-backed through a planted near-duplicate.

    The corpus embeddings are near-random w.r.t. the fixed query
    (max cosine ≈ 0.34), an operating point where NO honest LSH prunes
    and recalls — so instead of pinning recall on noise, the query
    plants one near-duplicate of the query vector (id 90001,
    cosine ≈ 0.997) into the corpus in-plan, runs the REAL LSH top-k
    over the union, and returns the ≥0.9-score slice.  A cosine-0.997
    neighbor agrees with the query per hyperplane w.p. ≈ 0.986, so the
    8-table OR misses it w.p. ≈ (1 - 0.986^6)^8 ≈ 2e-10 — and the
    planes are seeded, so the outcome is deterministic.  The oracle
    computes the exact top-10-above-0.9 (just the planted row, with its
    true score and rank 1): any recall miss, score drift, or rank
    corruption in the LSH path flips the value hash.  Rows-only in
    r1/r2."""
    tune_session(spark)
    e = read_table(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding")
    )
    planted = spark.range(1).select(
        F.lit(90001).cast("long").alias("vec_id"),
        F.array(*[F.lit(float(v)) for v in PLANTED_VEC]).alias("embedding"),
    )
    corpus = base.unionByName(planted)
    return SIM.lsh_bucketed_topk(
        corpus, "embedding", QUERY_VEC, dim=64, k=10, id_col="vec_id",
        n_tables=8, planes_per_table=6,
    ).select("vec_id", "score", "rank").filter(F.col("score") >= 0.9)


@register(
    "q_knn_join_labels",
    oracle="""
SELECT probe_id, neighbor_id, score, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT p.vec_id AS probe_id,
         o.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                      CAST(o.embedding AS DOUBLE[])), 4) AS score,
         ROW_NUMBER() OVER (
           PARTITION BY p.vec_id
           ORDER BY ROUND(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                                 CAST(o.embedding AS DOUBLE[])), 4) DESC,
                    o.vec_id) AS rank
  FROM (SELECT * FROM embeddings WHERE vec_id < 20) p,
       (SELECT * FROM embeddings WHERE vec_id >= 20) o
)
WHERE rank <= 3
""",
    tags=("similarity", "knn-join"),
)
def q_knn_join_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch kNN join: 3 nearest neighbors for each of the first 20
    vectors. The broadcast path is EXACT, so unlike the LSH variant it
    is fully oracle-checkable (DuckDB cross join + cosine + row_number
    — same 4-decimal rounding and id tie-break)."""
    tune_session(spark)
    e = read_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 20)
    others = e.filter(F.col("vec_id") >= 20)
    out = SIM.knn_join(
        probes.withColumnRenamed("vec_id", "probe_id"),
        others.withColumnRenamed("vec_id", "neighbor_id"),
        left_id="probe_id",
        right_id="neighbor_id",
        left_vec="embedding",
        right_vec="embedding",
        k=3,
        strategy="broadcast",
        broadcast_side="left",  # 20 probes broadcast; 2M corpus streams
    )
    return out.orderBy("probe_id", "rank")


@register(
    "q_knn_join_lsh",
    oracle="""
WITH pert AS (
  SELECT vec_id + 10000 AS nid,
         list_transform(CAST(embedding AS DOUBLE[]), x -> x + 0.01) AS emb
  FROM embeddings
)
SELECT probe_id, neighbor_id, score, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT p.vec_id AS probe_id,
         o.nid AS neighbor_id,
         ROUND(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]), o.emb), 4) AS score,
         ROW_NUMBER() OVER (
           PARTITION BY p.vec_id
           ORDER BY ROUND(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]), o.emb), 4) DESC,
                    o.nid) AS rank
  FROM embeddings p, pert o
)
WHERE rank <= 1
""",
    tags=("similarity", "knn-join", "ann"),
)
def q_knn_join_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed kNN join (large×large scale path) — FULL output
    hash-checked through planted near-duplicates.

    The right side is a perturbed twin of every embedding (each
    coordinate +0.01, id +10000), built in-plan with arithmetic DuckDB
    reproduces bit-for-bit.  Each probe's true nearest right row is its
    own twin (cosine ≈ 0.997; the best imposter sits near 0.55), and a
    cosine-0.997 pair collides in ≥1 of the 16×5-bit tables w.p.
    1 - (1 - 0.986^5)^16 ≈ 1 - 4e-20 — deterministically, since the
    planes are seeded.  The LSH join therefore returns exactly the
    exact kNN-join's k=1 result, and the oracle is the straight DuckDB
    cross-join + rank twin: every row of the LSH path's OUTPUT (pair,
    score, rank) is value-hashed, not just a recall summary.
    Rows-only in r1/r2."""
    tune_session(spark)
    e = read_table(spark, sf_dir, "embeddings")
    # Spill diet (r14, BASELINE §r14): both sides keep the RAW float32
    # parquet arrays — half the join/shuffle payload of the former
    # pre-cast doubles — and the twin's +0.01 perturbation moves into
    # the scorer (right_score_offset), where it is applied after the
    # exact float→double widening, bit-identical to the old
    # `CAST(x AS DOUBLE) + 0.01D` projection. Signatures now hash the
    # raw vector on BOTH sides, so each probe's twin collides in every
    # table with probability 1 (identical signatures) — strictly
    # stronger than the 1-4e-20 analytic bound the docstring derives.
    probes = e.select(F.col("vec_id").alias("probe_id"), "embedding")
    twins = e.select((F.col("vec_id") + 10000).alias("neighbor_id"), "embedding")
    # Row-count hints: index-build metadata (parquet row-count
    # metadata, no data scan). right_rows lets the LSH path hold its
    # bucket depth constant as the corpus grows — without it, 16×5-bit
    # tables measured 454 s at the sf1 sweep scale (quadratic bucket
    # depth; see knn_join_lsh). Both hints also size the vector
    # join-back broadcasts that keep payload off the pair-stream sorts.
    n = e.count()
    out = SIM.knn_join(
        probes,
        twins,
        left_id="probe_id",
        right_id="neighbor_id",
        left_vec="embedding",
        right_vec="embedding",
        k=1,
        strategy="lsh",
        dim=64,
        right_rows=n,
        left_rows=n,
        right_score_offset=0.01,
    )
    return out


#: DuckDB replay of the whole IVF pipeline: strided centroid pick →
#: per-vector nearest-centroid assignment (ties → lower cell id, the
#: numpy argmax-first contract) → top-4 probe cells for the query →
#: exact rerank inside the probed cells. Both registered IVF queries
#: (in-flight and indexed) return this same result by construction.
_IVF_ORACLE = f"""
WITH cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell_id,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings
        WHERE vec_id % 7 = 0 ORDER BY vec_id LIMIT 16)
), probes AS (
  SELECT cell_id FROM (
    SELECT cell_id,
           ROW_NUMBER() OVER (
             ORDER BY list_cosine_similarity(cvec, CAST({_QUERY_SQL_ARRAY} AS DOUBLE[])) DESC,
                      cell_id) AS rn
    FROM cents)
  WHERE rn <= 4
), assigned AS (
  SELECT vec_id, emb FROM (
    SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb, c.cell_id,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) DESC,
                      c.cell_id) AS rn
    FROM embeddings e CROSS JOIN cents c)
  WHERE rn = 1 AND cell_id IN (SELECT cell_id FROM probes)
)
SELECT vec_id, score, CAST(rank AS INTEGER) AS rank FROM (
  SELECT vec_id,
         ROUND(list_cosine_similarity(emb, CAST({_QUERY_SQL_ARRAY} AS DOUBLE[])), 4) AS score,
         ROW_NUMBER() OVER (
           ORDER BY ROUND(list_cosine_similarity(emb, CAST({_QUERY_SQL_ARRAY} AS DOUBLE[])), 4) DESC,
                    vec_id) AS rank
  FROM assigned)
WHERE rank <= 10
"""


@register(
    "q_knn_ivf_topk",
    oracle=_IVF_ORACLE,
    tags=("similarity", "ivf"),
)
def q_knn_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-pruned approximate top-10 (16 cells, probe 4), in-flight form.

    ORACLE-BACKED since round 6 (rows-only in r1–r5): every stage is
    deterministic arithmetic DuckDB replays — the strided centroid pick
    is plain SQL, nearest-centroid assignment is an argmax whose only
    possible ties (bit-identical duplicate centroids) break to the
    lower cell id in both engines, and the rerank reuses the
    brute-force oracle shape. The probe set is driver-side config
    (stable argsort) mirrored by the oracle's rank-over-centroids CTE.
    """
    tune_session(spark)
    e = read_table(spark, sf_dir, "embeddings")
    cents = SIM.deterministic_centroids(e, "embedding", "vec_id", n_cells=16)
    return SIM.ivf_topk(
        e, "embedding", QUERY_VEC, cents, k=10, id_col="vec_id", n_probe=4
    ).select("vec_id", "score", "rank")


@register(
    "q_knn_ivf_indexed_topk",
    oracle=_IVF_ORACLE,
    tags=("similarity", "ivf", "index"),
)
def q_knn_ivf_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search over a MATERIALIZED index: build (or rebuild) the
    ``partitionBy("_cell")`` parquet index, then probe it — the probe
    scan reads only the 4 probed cells' partitions via planning-time
    partition pruning (the round-5 verdict's missing scale path).

    The index build is part of the query so the registry entry is
    self-contained and deterministic; in production the build runs once
    and probes amortize it. Same oracle as ``q_knn_ivf_topk`` — the
    indexed path must return bit-identical results to the in-flight
    path, so one SQL twin checks both.

    The index lands in a per-process unique temp dir: a path shared
    across processes raced (one session's overwrite deleting
    part-files under another's probe scan). The few-MB leak per
    process is bounded (one dir per (pid, sf)) and lives under the
    OS-reaped /tmp.
    """
    import os as _os
    import tempfile as _tempfile

    tune_session(spark)
    e = read_table(spark, sf_dir, "embeddings")
    cents = SIM.deterministic_centroids(e, "embedding", "vec_id", n_cells=16)
    path = _os.path.join(
        _tempfile.gettempdir(),
        f"etl_project_spark_ivf_{_os.getpid()}",
        _os.path.basename(sf_dir.rstrip("/")) or "sf",
    )
    SIM.ivf_write_index(e, "embedding", cents, path, id_col="vec_id")
    return SIM.ivf_topk_indexed(
        spark, path, "embedding", QUERY_VEC, cents, k=10, id_col="vec_id", n_probe=4
    ).select("vec_id", "score", "rank")


# The appended-index oracle: identical pipeline, but the centroid seed
# pick runs over HISTORY only (vec_id % 10 <> 3 — the arriving-batch
# slice of a sourceless table), because a production index freezes its
# centroids at build time and arriving batches are assigned to them.
# One string surgery on the shared constant so the assignment/probe/
# rerank arithmetic can never drift; assumptions pinned at import
# (the plans/dedup.py ADVICE-r16 convention).
_IVF_SEED_WHERE = "WHERE vec_id % 7 = 0 ORDER BY vec_id LIMIT 16"
assert _IVF_ORACLE.count(_IVF_SEED_WHERE) == 1, (
    "IVF oracle's centroid-seed subquery changed; the history-only "
    "splice below would be malformed"
)
_IVF_APPENDED_ORACLE = _IVF_ORACLE.replace(
    _IVF_SEED_WHERE,
    "WHERE vec_id % 7 = 0 AND vec_id % 10 <> 3 ORDER BY vec_id LIMIT 16",
    1,
)


@register(
    "q_knn_ivf_appended_topk",
    oracle=_IVF_APPENDED_ORACLE,
    tags=("similarity", "ivf", "index", "incremental"),
)
def q_knn_ivf_appended_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search over an INCREMENTALLY GROWN index — the maintenance
    twin of ``q_knn_ivf_indexed_topk`` (round-16 verdict #4): the
    cell-partitioned index is built over HISTORY only (``vec_id % 10
    <> 3``, the arriving-batch slice of a table with no source
    column), centroids are FROZEN from that build, and the batch is
    then assigned in isolation and appended into the matching
    ``_cell=N/`` partitions (``ivf_append_index`` — one O(batch)
    Arrow matmul + an append write; the corpus is never re-assigned).

    With frozen centroids the assignment is a per-vector pure function
    of (vector, centroid matrix), so the grown index is bit-identical
    to a rebuild over the full corpus with the same centroids, and the
    probe returns exactly the rebuilt index's top-k — which is what
    the oracle states (the shared IVF pipeline with the history-only
    seed pick). The silent cost of freezing — recall drift as the
    arriving distribution shifts — is the measured half of this task:
    ``ivf_cell_profile`` / ``ivf_drifted_cells`` /
    ``ivf_rebalance_cells`` detect and repair it (tests/test_ann_index
    pins the drift→rebalance→recall cycle; BASELINE.md round 17
    carries the recall-vs-append-fraction table).

    Same per-(process, corpus) temp-dir + self-contained-build
    contract as the indexed twin.
    """
    import os as _os
    import tempfile as _tempfile

    tune_session(spark)
    e = read_table(spark, sf_dir, "embeddings")
    hist = e.filter(F.col("vec_id") % 10 != 3)
    batch = e.filter(F.col("vec_id") % 10 == 3)
    cents = SIM.deterministic_centroids(hist, "embedding", "vec_id", n_cells=16)
    path = _os.path.join(
        _tempfile.gettempdir(),
        f"etl_project_spark_ivf_app_{_os.getpid()}",
        _os.path.basename(sf_dir.rstrip("/")) or "sf",
    )
    SIM.ivf_write_index(hist, "embedding", cents, path, id_col="vec_id")
    SIM.ivf_append_index(batch, "embedding", cents, path, id_col="vec_id")
    return SIM.ivf_topk_indexed(
        spark, path, "embedding", QUERY_VEC, cents, k=10, id_col="vec_id", n_probe=4
    ).select("vec_id", "score", "rank")


@register(
    "q_label_centroids",
    oracle="""
WITH comp AS (
  SELECT label,
         CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
         CAST(UNNEST(embedding) AS DOUBLE) AS val
  FROM embeddings
)
SELECT label, pos,
       ROUND(AVG(val), 4) AS centroid_val,
       CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM comp GROUP BY label, pos
""",
    tags=("similarity", "centroid", "embedding"),
)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids in long form (label, pos, mean).

    The building block behind class prototypes, nearest-centroid
    classification, and IVF-style cell statistics — computed as a pure
    relational plan: posexplode the vector (in-codegen generator) and
    hash-aggregate per (label, position). The map-side partial combine
    collapses each partition to (n_labels × dim) rows before the one
    shuffle, so 100 TB of vectors reduces to kilobytes of network
    traffic; nothing touches the driver, unlike collect-based
    centroid builds.
    """
    tune_session(spark)
    e = read_table(spark, sf_dir, "embeddings")
    comp = e.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    ).select("label", "pos", F.col("val").cast("double").alias("val"))
    return comp.groupBy("label", "pos").agg(
        F.round(F.avg("val"), 4).alias("centroid_val"),
        F.count(F.lit(1)).alias("n_vectors"),
    )


@register(
    "q_hard_negative_mining",
    oracle=f"""
WITH anchors AS (
  SELECT vec_id AS a_id, CAST(embedding AS DOUBLE[]) AS a_emb, label AS a_label
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT a.a_id, e.vec_id AS neg_id,
         ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), a.a_emb), 4)
             AS score,
         ROW_NUMBER() OVER (
             PARTITION BY a.a_id
             ORDER BY ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                   a.a_emb), 4) DESC, e.vec_id)
             AS rank
  FROM anchors a JOIN embeddings e
    ON e.label <> a.a_label
)
SELECT a_id, neg_id, score, CAST(rank AS INTEGER) AS rank
FROM scored WHERE rank <= 5
""",
    tags=("similarity", "hard-negatives", "contrastive"),
)
def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard negatives for contrastive training: for each anchor vector,
    the 5 most-similar corpus vectors with a DIFFERENT label.

    The mining recipe behind dense-retriever training (in-batch
    negatives are easy; the useful ones are near-misses). This is the
    kNN-join shape with a label-inequality constraint, so it runs on
    the cogroup-einsum kernel (`grouped_probe_topk`): the corpus
    hashes into cells, the 5-anchor batch replicates to each cell, and
    the different-label rule is a score mask inside the kernel — no
    per-pair row ever materializes. The r9 sweep measured the
    join-then-window form at 42× on 10× data (five label-mismatch
    fan-out rows per corpus vector, each dragging two vectors through
    a CodegenFallback HOF cosine); the grouped kernel moves each
    vector once and scores in numpy. The LSH variant (q_knn_join_lsh)
    remains the 100 TB path for large anchor sets.
    """
    from etl_project_spark.operators.similarity import grouped_probe_topk

    tune_session(spark)
    e = read_table(spark, sf_dir, "embeddings")
    anchors = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_label"),
        F.col("embedding").alias("a_emb"),
    )
    corpus = e.select(
        F.col("vec_id").alias("neg_id"), "label", "embedding"
    )
    return grouped_probe_topk(
        corpus,
        anchors,
        corpus_id="neg_id",
        probe_id="a_id",
        corpus_vec="embedding",
        probe_vec="a_emb",
        k=5,
        neq_cols=("label", "a_label"),
    ).select("a_id", "neg_id", "score", "rank")


@register(
    "q_embedding_covariance",
    oracle="""
SELECT CAST(i AS INTEGER) AS dim_i, CAST(j AS INTEGER) AS dim_j,
       ROUND(COVAR_POP(CAST(embedding[CAST(i AS INT)] AS DOUBLE),
                       CAST(embedding[CAST(j AS INT)] AS DOUBLE)), 6) AS cov
FROM embeddings, range(1, 9) r1(i), range(1, 9) r2(j)
WHERE i <= j
GROUP BY i, j
""",
    tags=("similarity", "covariance", "stats"),
)
def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population covariance matrix of the first 8 embedding dims
    (upper triangle, long form) — the input to PCA whitening.

    For small fixed d the best plan is NO fan-out at all: project the
    d components once and compute all d(d+1)/2 COVAR_POP aggregates in
    a single pass (one scan, one 1-row shuffle), then unpivot
    driver-free via stack(). For large d, switch to the posexplode
    outer-product form of q_label_centroids — same output contract.
    """
    tune_session(spark)
    e = read_table(spark, sf_dir, "embeddings")
    d = 8
    # Single parsed expressions (not 36 Column-object aggs) — the py4j
    # plan-construction economy of q_pca_power_iteration, same
    # expressions term for term.
    comps = e.selectExpr(
        *[f"CAST(element_at(embedding, {i}) AS DOUBLE) AS x{i}" for i in range(1, d + 1)]
    )
    cov_members = ", ".join(
        f"covar_pop(x{i}, x{j}) AS c_{i}_{j}"
        for i in range(1, d + 1)
        for j in range(i, d + 1)
    )
    one = comps.agg(F.expr(f"struct({cov_members}) AS _s")).select("_s.*")
    stack_args = ", ".join(
        f"{i}, {j}, c_{i}_{j}" for i in range(1, d + 1) for j in range(i, d + 1)
    )
    n_pairs = d * (d + 1) // 2
    return one.select(
        F.expr(f"stack({n_pairs}, {stack_args}) AS (dim_i, dim_j, cov_raw)")
    ).select(
        F.col("dim_i").cast("integer").alias("dim_i"),
        F.col("dim_j").cast("integer").alias("dim_j"),
        F.round("cov_raw", 6).alias("cov"),
    )


@register(
    "q_matryoshka_distortion",
    oracle="""
WITH pairs AS (
  SELECT o.vec_id,
         CAST(o.embedding AS DOUBLE[]) AS a,
         list_transform(CAST(o.embedding AS DOUBLE[]), x -> x + 0.01) AS b
  FROM embeddings o
),
dims AS (SELECT UNNEST([8, 16, 32, 64]) AS d),
scored AS (
  SELECT d.d, p.vec_id,
         list_cosine_similarity(p.a[1:d.d], p.b[1:d.d]) AS cos_trunc,
         list_cosine_similarity(p.a, p.b) AS cos_full
  FROM pairs p, dims d
)
SELECT CAST(d AS INTEGER) AS dim,
       ROUND(AVG(cos_trunc), 6) AS avg_cosine,
       ROUND(AVG(ABS(cos_trunc - cos_full)), 6) AS avg_abs_distortion,
       ROUND(MAX(ABS(cos_trunc - cos_full)), 6) AS max_abs_distortion
FROM scored
GROUP BY d
""",
    tags=("similarity", "matryoshka", "embedding"),
)
def q_matryoshka_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation audit: how much does the cosine of a
    known near-duplicate pair move when embeddings are truncated to
    their first 8/16/32/64 dims?

    The measurement behind 'can we serve the index at dim 16': each
    vector pairs with its planted +0.01 twin (the deterministic
    near-dup device of q_embedding_near_dup_pairs), cosines compute at
    each prefix length via the same zip_with kernel, and the rollup is
    4 rows. One scan, a 4-way dim explode, no joins — the pair is
    constructed in-row, so the audit is embarrassingly parallel.
    """
    from etl_project_spark.operators.dedup import cosine_similarity

    tune_session(spark)
    e = read_table(spark, sf_dir, "embeddings")
    pairs = e.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("a"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE) + 0.01D)").alias("b"),
    )
    dims = F.explode(F.array(*[F.lit(d) for d in (8, 16, 32, 64)])).alias("dim")
    scored = pairs.select("vec_id", "a", "b", dims).select(
        "vec_id",
        F.col("dim"),
        cosine_similarity(
            F.expr("slice(a, 1, dim)"), F.expr("slice(b, 1, dim)")
        ).alias("cos_trunc"),
        cosine_similarity(F.col("a"), F.col("b")).alias("cos_full"),
    )
    return scored.groupBy(F.col("dim").cast("integer").alias("dim")).agg(
        F.round(F.avg("cos_trunc"), 6).alias("avg_cosine"),
        F.round(F.avg(F.abs(F.col("cos_trunc") - F.col("cos_full"))), 6).alias(
            "avg_abs_distortion"
        ),
        F.round(F.max(F.abs(F.col("cos_trunc") - F.col("cos_full"))), 6).alias(
            "max_abs_distortion"
        ),
    )


@register(
    "q_embedding_energy_spectrum",
    oracle="""
WITH comp AS (
  SELECT CAST(generate_subscripts(embedding, 1) AS INTEGER) AS dim,
         CAST(UNNEST(embedding) AS DOUBLE) AS val
  FROM embeddings
),
pervar AS (
  SELECT dim, var_pop(val) AS v FROM comp GROUP BY dim
),
tot AS (SELECT SUM(v) AS tv FROM pervar),
ranked AS (
  SELECT dim, v, ROW_NUMBER() OVER (ORDER BY v DESC, dim) AS rnk
  FROM pervar
)
SELECT rnk AS energy_rank, dim,
       ROUND(v, 6) AS variance,
       ROUND(SUM(v / tv) OVER (ORDER BY rnk
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
           AS cum_energy_share
FROM ranked, tot
""",
    tags=("similarity", "variance", "spectrum"),
)
def q_embedding_energy_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension variance spectrum of the embeddings, ranked by
    energy with the cumulative share — the poor-man's PCA scree plot
    that answers 'how many dims carry the signal' without an
    eigendecomposition.

    posexplode → per-dim var_pop (64-row aggregate) → ranking and the
    cumulative window over those 64 rows. Companion to
    q_embedding_covariance (off-diagonal structure) and
    q_matryoshka_distortion (truncation effect on similarity).
    """
    tune_session(spark)
    e = read_table(spark, sf_dir, "embeddings")
    comp = e.select(F.posexplode("embedding").alias("pos", "val")).select(
        (F.col("pos") + 1).cast("integer").alias("dim"),
        F.col("val").cast("double").alias("val"),
    )
    pervar = comp.groupBy("dim").agg(F.var_pop("val").alias("v"))
    tot = pervar.agg(F.sum("v").alias("tv"))
    ranked = pervar.withColumn(
        "rnk", F.row_number().over(W.orderBy(F.desc("v"), "dim"))
    )
    w = W.orderBy("rnk").rowsBetween(W.unboundedPreceding, W.currentRow)
    return ranked.crossJoin(F.broadcast(tot)).select(
        F.col("rnk").alias("energy_rank"),
        "dim",
        F.round("v", 6).alias("variance"),
        F.round(F.sum(F.col("v") / F.col("tv")).over(w), 6).alias("cum_energy_share"),
    )


# -- Product quantization ----------------------------------------------------

_PQ_SUB, _PQ_KS, _PQ_DSUB = 8, 16, 8


def _pq_sq_terms(a: str, b: str, s: int) -> str:
    """Explicit left-to-right 8-term squared-distance sum with literal
    1-based indices — the fold order the Spark encoder reproduces."""
    terms = []
    for i in range(_PQ_DSUB):
        idx = s * _PQ_DSUB + i + 1
        terms.append(f"({a}[{idx}] - {b}[{idx}])*({a}[{idx}] - {b}[{idx}])")
    return " + ".join(terms)


def _pq_query_sq_terms(s: int) -> str:
    terms = []
    for i in range(_PQ_DSUB):
        idx = s * _PQ_DSUB + i + 1
        q = repr(QUERY_VEC[idx - 1])
        terms.append(f"(({q}) - cw[{idx}])*(({q}) - cw[{idx}])")
    return " + ".join(terms)


def _pq_codes_ctes() -> str:
    dist_arms = "\n  UNION ALL\n".join(
        f"  SELECT vec_id, {s} AS s, c, {_pq_sq_terms('emb', 'cw', s)} AS d\n"
        "  FROM corpus CROSS JOIN seeds"
        for s in range(_PQ_SUB)
    )
    return f"""
WITH seeds AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c,
         CAST(embedding AS DOUBLE[]) AS cw
  FROM (SELECT vec_id, embedding FROM embeddings
        WHERE vec_id % 7 = 0 ORDER BY vec_id LIMIT {_PQ_KS})
), corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), dists AS (
{dist_arms}
), codes AS (
  SELECT vec_id, s, c, d FROM (
    SELECT vec_id, s, c, d,
           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn
    FROM dists)
  WHERE rn = 1
)"""


def _pq_adc_oracle() -> str:
    qd_arms = "\n  UNION ALL\n".join(
        f"  SELECT {s} AS s, c, ROUND({_pq_query_sq_terms(s)}, 6) AS dq FROM seeds"
        for s in range(_PQ_SUB)
    )
    return (
        _pq_codes_ctes()
        + f""",
qd AS (
{qd_arms}
)
SELECT vec_id, adc, CAST(rank AS INTEGER) AS rank FROM (
  SELECT vec_id, adc,
         ROW_NUMBER() OVER (ORDER BY adc, vec_id) AS rank FROM (
    SELECT k.vec_id, ROUND(SUM(q.dq), 6) AS adc
    FROM codes k JOIN qd q ON q.s = k.s AND q.c = k.c
    GROUP BY k.vec_id))
WHERE rank <= 10
"""
    )


def _pq_recon_oracle() -> str:
    return (
        _pq_codes_ctes()
        + """
SELECT CAST(s AS INTEGER) AS subspace,
       ROUND(AVG(d), 6) AS avg_sq_err,
       CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM codes GROUP BY s
"""
    )


def _pq_encoded(spark: SparkSession, sf_dir: str) -> "tuple[DataFrame, object]":
    # Session-registered persisted index (sources/ann_index.py): serve
    # the codes from the pay-once parquet instead of re-running the
    # corpus encode scan. Parameter-matched or not used at all; the
    # codebook travels with the index so no scan re-derives the seeds.
    from etl_project_spark.sources.ann_index import pq_index_for, read_pq_codes

    idx = pq_index_for(sf_dir, n_cells=_PQ_KS, n_sub=_PQ_SUB)
    if idx is not None:
        return (
            read_pq_codes(spark, idx).select("vec_id", "_pq"),
            SIM.pq_codebooks(idx.seeds, _PQ_SUB),
        )
    e = read_table(spark, sf_dir, "embeddings")
    seeds = SIM.deterministic_centroids(e, "embedding", "vec_id", n_cells=_PQ_KS)
    cbs = SIM.pq_codebooks(seeds, _PQ_SUB)
    return (
        e.select("vec_id", SIM.pq_encode_udf(cbs)(F.col("embedding")).alias("_pq")),
        cbs,
    )


def _adc_topk(enc: DataFrame, cbs, k: int = 10) -> DataFrame:
    """ADC top-k over an encoded frame: 8 element_at lookups into the
    driver-computed distance-table literal, summed left-to-right,
    rounded to the 1e-6 grid, TakeOrderedAndProject cut, rank over the
    bounded survivors. Shared by q_pq_adc_topk and q_knn_ivfpq_topk so
    the ADC arithmetic and tie-break cannot silently diverge between
    the flat and IVF-pruned paths (r10 review)."""
    dt = SIM.pq_adc_table(cbs, QUERY_VEC)
    dtlit = F.array(*[F.array(*[F.lit(v) for v in row]) for row in dt])
    adc = None
    for s in range(_PQ_SUB):
        term = F.element_at(
            F.element_at(dtlit, s + 1),
            F.element_at(F.col("_pq.codes"), s + 1) + F.lit(1),
        )
        adc = term if adc is None else (adc + term)
    top = (
        enc.select("vec_id", F.round(adc, 6).alias("adc"))
        .orderBy("adc", "vec_id")
        .limit(k)
    )
    # rank over the k post-limit survivors — bounded by construction
    return top.withColumn(
        "rank", F.row_number().over(W.orderBy("adc", "vec_id"))
    )


@register(
    "q_pq_adc_topk",
    oracle=_pq_adc_oracle(),
    tags=("similarity", "pq", "quantization", "embedding"),
)
def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC search: top-10 by asymmetric-distance
    (sum of per-subspace query→codeword squared distances) — the
    memory-bound ANN path that serves 100 TB of vectors from 8 bytes
    each.

    64 float dims → 8 codes over 16-codeword subspace codebooks (the
    IVF seed-vector device, sliced — deterministic, no RNG, fully
    SQL-replayable). The encode is one Arrow-batched scan with the
    codebook in the task closure; ADC scoring is 8 JVM element_at
    lookups per row into the driver-computed (8×16) distance-table
    literal — no join, no shuffle; the top-10 cut is a
    TakeOrderedAndProject. Compose with the IVF cell layout
    (q_knn_ivf_indexed_topk) for IVF-PQ: cells prune the scan, codes
    shrink residency 64×.

    Cross-engine determinism: squared distances fold left-to-right in
    both engines (numpy's pairwise .sum could flip an ulp-tie);
    argmin ties break to the lower codeword id; distance-table entries
    pre-round to the 1e-6 grid so the ADC total's final ROUND(·, 6) is
    summation-order-proof.
    """
    tune_session(spark)
    enc, cbs = _pq_encoded(spark, sf_dir)
    return _adc_topk(enc, cbs, k=10)


@register(
    "q_pq_adc_indexed_topk",
    oracle=_pq_adc_oracle(),
    tags=("similarity", "pq", "quantization", "index"),
)
def q_pq_adc_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC search over the PERSISTED code index: build (or rebuild) the
    ``partitionBy("_cell")`` code parquet (sources/ann_index.py), then
    answer the top-10 from the stored codes alone — no vector column,
    no encode UDF, no assignment matmul at query time.

    The index build is part of the query so the registry entry is
    self-contained and deterministic (the q_knn_ivf_indexed_topk
    convention); in production the build runs once at ingest and every
    query amortizes it. Same oracle as ``q_pq_adc_topk``: the served
    path must return bit-identical results to the encode-per-query
    path, so one SQL twin checks both — and the serving scan touches 8
    int codes per vector instead of 64 floats, the 100 TB residency
    win quantization exists for. The build lands in a per-process
    unique dir (shared paths raced across sessions; bounded few-MB
    leak under OS-reaped /tmp). ``register=False``: running this query
    must not flip the OTHER PQ queries into served mode.
    """
    from etl_project_spark.sources.ann_index import (
        persist_pq_index,
        read_pq_codes,
    )

    tune_session(spark)
    idx = persist_pq_index(
        spark, sf_dir, n_cells=_PQ_KS, n_sub=_PQ_SUB, register=False
    )
    cbs = SIM.pq_codebooks(idx.seeds, _PQ_SUB)
    enc = read_pq_codes(spark, idx).select("vec_id", "_pq")
    return _adc_topk(enc, cbs, k=10)


@register(
    "q_pq_reconstruction_error",
    oracle=_pq_recon_oracle(),
    tags=("similarity", "pq", "quantization", "audit"),
)
def q_pq_reconstruction_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subspace PQ reconstruction error (mean squared distance to
    the chosen codeword) — the audit that decides whether a codebook
    is good enough to serve, and which subspaces need more codewords.

    Same one-scan encode as q_pq_adc_topk; the winning distance per
    subspace comes back from the encoder for free, so the rollup is a
    posexplode + 8-group hash agg with map-side combine — kilobytes of
    shuffle at any corpus size.
    """
    tune_session(spark)
    enc, _ = _pq_encoded(spark, sf_dir)
    return (
        enc.select(F.posexplode("_pq.errs").alias("subspace", "err"))
        .groupBy("subspace")
        .agg(
            F.round(F.avg("err"), 6).alias("avg_sq_err"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


def _ivfpq_oracle() -> str:
    qd_arms = "\n  UNION ALL\n".join(
        f"  SELECT {s} AS s, c, ROUND({_pq_query_sq_terms(s)}, 6) AS dq FROM seeds"
        for s in range(_PQ_SUB)
    )
    dist_arms = "\n  UNION ALL\n".join(
        f"  SELECT vec_id, {s} AS s, c, {_pq_sq_terms('emb', 'cw', s)} AS d\n"
        "  FROM kept CROSS JOIN seeds"
        for s in range(_PQ_SUB)
    )
    return f"""
WITH seeds AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c,
         CAST(embedding AS DOUBLE[]) AS cw
  FROM (SELECT vec_id, embedding FROM embeddings
        WHERE vec_id % 7 = 0 ORDER BY vec_id LIMIT {_PQ_KS})
), probes AS (
  SELECT c AS cell_id FROM (
    SELECT c,
           ROW_NUMBER() OVER (
             ORDER BY list_cosine_similarity(cw, CAST({_QUERY_SQL_ARRAY} AS DOUBLE[])) DESC,
                      c) AS rn
    FROM seeds)
  WHERE rn <= 4
), kept AS (
  SELECT vec_id, emb FROM (
    SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb, s.c AS cell_id,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), s.cw) DESC,
                      s.c) AS rn
    FROM embeddings e CROSS JOIN seeds s)
  WHERE rn = 1 AND cell_id IN (SELECT cell_id FROM probes)
), dists AS (
{dist_arms}
), codes AS (
  SELECT vec_id, s, c, d FROM (
    SELECT vec_id, s, c, d,
           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn
    FROM dists)
  WHERE rn = 1
), qd AS (
{qd_arms}
)
SELECT vec_id, adc, CAST(rank AS INTEGER) AS rank FROM (
  SELECT vec_id, adc,
         ROW_NUMBER() OVER (ORDER BY adc, vec_id) AS rank FROM (
    SELECT k.vec_id, ROUND(SUM(q.dq), 6) AS adc
    FROM codes k JOIN qd q ON q.s = k.s AND q.c = k.c
    GROUP BY k.vec_id))
WHERE rank <= 10
"""


@register(
    "q_knn_ivfpq_topk",
    oracle=_ivfpq_oracle(),
    tags=("similarity", "pq", "ivf", "ann"),
)
def q_knn_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: coarse cells prune the scan, product codes replace the
    vectors — the composition that serves web-scale ANN from RAM
    (Jégou et al., TPAMI'11 shape, relational throughout).

    Stage 1 (IVF) assigns every vector to its nearest of 16 coarse
    centroids and keeps only the 4 cells nearest the query — with the
    materialized cell layout of q_knn_ivf_indexed_topk this is
    planning-time partition pruning, a 4/16 scan. Stage 2 (PQ) encodes
    only the kept quarter and ranks by ADC lookups — 8 bytes touched
    per candidate instead of 256. Both stages reuse the same 16
    deterministic seed vectors (centroids = full vectors, codebooks =
    their slices), so the whole two-stage plan is replayed exactly by
    one SQL oracle. Approximation is two-layer (cell recall × code
    resolution) — the per-stage audits are q_knn_ivf_topk (cell
    recall vs brute) and q_pq_reconstruction_error (code resolution).
    """
    tune_session(spark)
    from etl_project_spark.sources.ann_index import (
        pq_index_for,
        read_pq_codes_probed,
    )

    idx = pq_index_for(sf_dir, n_cells=_PQ_KS, n_sub=_PQ_SUB)
    if idx is not None:
        # persisted index: probe cells are partition directories, so
        # the scan opens only 4/16 of the code files and neither the
        # assignment matmul nor the encode UDF runs at query time.
        cbs = SIM.pq_codebooks(idx.seeds, _PQ_SUB)
        probed = SIM.probe_cells(QUERY_VEC, idx.seeds, n_probe=4)
        enc = read_pq_codes_probed(spark, idx, probed).select("vec_id", "_pq")
        return _adc_topk(enc, cbs, k=10)
    e = read_table(spark, sf_dir, "embeddings")
    seeds = SIM.deterministic_centroids(e, "embedding", "vec_id", n_cells=_PQ_KS)
    cbs = SIM.pq_codebooks(seeds, _PQ_SUB)
    probed = SIM.probe_cells(QUERY_VEC, seeds, n_probe=4)
    kept = SIM.ivf_assign(e, "embedding", seeds).filter(
        F.col("_cell").isin([int(p) for p in probed])
    )
    enc = kept.select(
        "vec_id", SIM.pq_encode_udf(cbs)(F.col("embedding")).alias("_pq")
    )
    return _adc_topk(enc, cbs, k=10)


_INT8_ORACLE = f"""
WITH corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), qv AS (
  SELECT vec_id, emb,
         CASE WHEN m > 0
              THEN list_transform(emb, x -> floor(x * (127.0 / m) + 0.5))
              ELSE list_transform(emb, x -> floor(x * 0.0)) END AS qe
  FROM (SELECT vec_id, emb,
               list_max(list_transform(emb, x -> abs(x))) AS m
        FROM corpus)
), scored AS (
  SELECT vec_id,
         ROUND(list_cosine_similarity(emb, CAST({_QUERY_SQL_ARRAY} AS DOUBLE[])), 4)
             AS cos_exact,
         CASE WHEN list_dot_product(qe, qe) > 0
              THEN ROUND(list_dot_product(qe, CAST({{QQ}} AS DOUBLE[]))
                         / (sqrt(list_dot_product(qe, qe))
                            * sqrt(list_dot_product(CAST({{QQ}} AS DOUBLE[]),
                                                    CAST({{QQ}} AS DOUBLE[])))), 4)
              ELSE 0.0 END AS cos_q
  FROM qv
), et AS (
  SELECT vec_id, cos_exact, cos_q FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY cos_exact DESC, vec_id) AS rn
    FROM scored) WHERE rn <= 10
), qt AS (
  SELECT vec_id FROM (
    SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cos_q DESC, vec_id) AS rn
    FROM scored) WHERE rn <= 10
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM et JOIN qt USING (vec_id)) AS recall_at_10,
  (SELECT ROUND(AVG(ABS(cos_q - cos_exact)), 6) FROM et) AS avg_abs_cos_err,
  (SELECT ROUND(MAX(ABS(cos_q - cos_exact)), 6) FROM et) AS max_abs_cos_err
"""


def _int8_query_literal() -> str:
    import math

    m = max(abs(v) for v in QUERY_VEC)
    s = 127.0 / m
    qq = [float(math.floor(v * s + 0.5)) for v in QUERY_VEC]
    return "[" + ", ".join(f"{v!r}" for v in qq) + "]"


@register(
    "q_int8_quantized_recall",
    oracle=_INT8_ORACLE.replace("{QQ}", _int8_query_literal()),
    tags=("similarity", "quantization", "int8", "audit"),
)
def q_int8_quantized_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Can the index serve int8? Symmetric absmax per-vector
    quantization (the standard embedding-serving compression), then
    recall@10 and cosine drift of the quantized index against the
    exact one — the audit run before switching a 100 TB vector store
    to 1-byte weights.

    Every quantized value is an exact small integer (floor(x·s + 0.5),
    |q| ≤ 127), so dot products and squared norms are EXACT in both
    engines regardless of summation order — the whole int8 scoring
    path is bit-deterministic cross-engine, no fold-order care needed
    (unlike the float kernels). Exact cosine reuses the brute-force
    oracle arithmetic. One Arrow-batched scan scores both forms; the
    two top-10 cuts are TakeOrderedAndProject; the audit row is a
    3-scalar crossJoin of kilobyte aggregates.
    """
    import math

    tune_session(spark)
    e = read_table(spark, sf_dir, "embeddings")

    q = np.asarray(QUERY_VEC, dtype=np.float64)
    qn = float(np.linalg.norm(q))
    qs = 127.0 / float(np.max(np.abs(q)))
    qq = np.floor(q * qs + 0.5)
    qqn = float(np.sqrt(qq @ qq))

    @pandas_udf("struct<cos_exact: double, cos_q: double>")
    def both_scores(vecs: pd.Series) -> pd.DataFrame:
        M = np.stack(vecs.to_numpy()).astype(np.float64)
        dots = M @ q
        norms = np.linalg.norm(M, axis=1)
        denom = norms * qn
        ce = np.divide(dots, denom, out=np.zeros_like(dots), where=denom > 0)
        m = np.abs(M).max(axis=1)
        s_v = np.where(m > 0, 127.0 / np.where(m > 0, m, 1.0), 0.0)
        QV = np.floor(M * s_v[:, None] + 0.5)
        dq = QV @ qq
        nq = np.sqrt(np.einsum("ij,ij->i", QV, QV))
        dn = nq * qqn
        cq = np.divide(dq, dn, out=np.zeros_like(dq), where=dn > 0)
        return pd.DataFrame(
            {
                "cos_exact": SIM.round_half_up4(ce),
                "cos_q": SIM.round_half_up4(cq),
            }
        )

    from etl_project_spark.session import scoped_persist

    # Three consumers reference `scored` (exact top-10 twice, quantized
    # top-10 once); without the cache each re-runs the full Arrow
    # dual-score scan — the same re-scan disease q_bpe_learned_merges
    # had (r10 review).
    scored = scoped_persist(
        e.select("vec_id", both_scores(F.col("embedding")).alias("_s")).select(
            "vec_id",
            F.col("_s.cos_exact").alias("cos_exact"),
            F.col("_s.cos_q").alias("cos_q"),
        )
    )
    et = scored.orderBy(F.desc("cos_exact"), "vec_id").limit(10)
    qt = scored.orderBy(F.desc("cos_q"), "vec_id").limit(10).select("vec_id")
    rec = et.join(qt, "vec_id").agg(F.count(F.lit(1)).alias("recall_at_10"))
    errs = et.agg(
        F.round(F.avg(F.abs(F.col("cos_q") - F.col("cos_exact"))), 6).alias(
            "avg_abs_cos_err"
        ),
        F.round(F.max(F.abs(F.col("cos_q") - F.col("cos_exact"))), 6).alias(
            "max_abs_cos_err"
        ),
    )
    return rec.crossJoin(errs)


# ---------------------------------------------------------------------------
# Lloyd-refined k-means cell profile — the cluster-curation primitive
# (SemDeDup / DataComp pipelines cluster embeddings with k-means, then
# prune or rebalance per cell). Oracle-parity across two Lloyd rounds
# holds because every refined centroid coordinate is snapped to a 1e-6
# grid before it is reused (operators/similarity.py::kmeans_refine
# ``grid=6``) — after the snap both engines continue from bit-identical
# centroids, so the only float divergence left is inside one
# assignment argmax (~1e-15, the proven q_knn_ivf_topk regime).

def _kmeans_assign_sql(cents: str) -> str:
    """Assignment CTE body: nearest of ``cents`` by cosine, ties to the
    lower cell id — the SQL twin of ivf_assign's stable argmax."""
    return f"""
  SELECT vec_id, emb, cell_id FROM (
    SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb, c.cell_id,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                             c.cvec) DESC,
                      c.cell_id) AS rn
    FROM embeddings e CROSS JOIN {cents} c)
  WHERE rn = 1
"""


def _kmeans_update_sql(assigned: str, prev: str) -> str:
    """Update CTE body: per-cell per-dimension mean, snapped to the 1e-6
    grid; cells that lost every member keep the previous centroid."""
    return f"""
  SELECT p.cell_id, COALESCE(m.cv, p.cvec) AS cvec
  FROM {prev} p LEFT JOIN (
    SELECT cell_id, list(mval ORDER BY pos) AS cv FROM (
      SELECT cell_id, pos, ROUND(AVG(val), 6) AS mval FROM (
        SELECT cell_id, UNNEST(emb) AS val,
               UNNEST(range(1, len(emb) + 1)) AS pos
        FROM {assigned})
      GROUP BY cell_id, pos)
    GROUP BY cell_id) m USING (cell_id)
"""


_KMEANS_ORACLE = f"""
WITH cents0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell_id,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings
        WHERE vec_id % 7 = 0 ORDER BY vec_id LIMIT 16)
), a1 AS ({_kmeans_assign_sql("cents0")}
), cents1 AS ({_kmeans_update_sql("a1", "cents0")}
), a2 AS ({_kmeans_assign_sql("cents1")}
), cents2 AS ({_kmeans_update_sql("a2", "cents1")}
), af AS (
  SELECT vec_id, cell_id, sim FROM (
    SELECT e.vec_id, c.cell_id,
           list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec)
             AS sim,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                             c.cvec) DESC,
                      c.cell_id) AS rn
    FROM embeddings e CROSS JOIN cents2 c)
  WHERE rn = 1
)
SELECT CAST(cell_id AS INTEGER) AS cell_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       ROUND(AVG(sim), 4) AS mean_sim
FROM af GROUP BY cell_id
"""


@register(
    "q_kmeans_refined_cells",
    oracle=_KMEANS_ORACLE,
    tags=("similarity", "kmeans", "llm"),
)
def q_kmeans_refined_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell profile (size + mean within-cell cosine) after two
    deterministic Lloyd rounds from the strided IVF seeds.

    The k-means training loop behind cluster-based curation: assign is
    one Arrow matmul per batch against a 16×64 broadcast-closure
    matrix, update is one per-(cell, dim) distributed aggregate — the
    n_cells × dim means are the only driver-side bytes per round
    (index-build metadata). Nothing is quadratic in the corpus; at
    100 TB the same loop runs with the centroid matrix in the task
    closure and one shuffle per round.
    """
    tune_session(spark)
    e = read_table(spark, sf_dir, "embeddings")
    seeds = SIM.deterministic_centroids(e, "embedding", "vec_id", n_cells=16)
    refined = SIM.kmeans_refine(e, "embedding", seeds, n_iter=2, grid=6)
    prof = SIM.assign_with_sim(e, "embedding", refined)
    return prof.groupBy(F.col("_cell").cast("int").alias("cell_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.round(F.avg("_sim"), 4).alias("mean_sim"),
    )


# --------------------------------------------------------------------------
# Hybrid retrieval fusion: Reciprocal Rank Fusion of two candidate
# lists for the same fixed query — the full-precision 64-dim cosine
# ranking and the matryoshka 16-dim coarse-head ranking. Both arms
# are TakeOrderedAndProject top-100 (per-task heaps, no global sort);
# the fusion itself touches 2 × 100 narrow rows, so every post-scan
# stage is driver-trivial at any corpus size. This is the standard
# two-tower serving topology: cheap coarse scorer + expensive exact
# scorer, RRF to combine without score calibration.
# --------------------------------------------------------------------------
_QUERY16_SQL_ARRAY = "[" + ", ".join(f"{v!r}" for v in QUERY_VEC[:16]) + "]"
_RRF_K = 60
_RRF_POOL = 100


@register(
    "q_rrf_fusion_topk",
    oracle=f"""
WITH scored AS (
  SELECT vec_id,
         ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                      CAST({_QUERY_SQL_ARRAY} AS DOUBLE[])), 4) AS s_full,
         ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[])[1:16],
                                      CAST({_QUERY16_SQL_ARRAY} AS DOUBLE[])), 4) AS s_coarse
  FROM embeddings
), rf AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY s_full DESC, vec_id) AS r_full
  FROM scored QUALIFY r_full <= {_RRF_POOL}
), rc AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY s_coarse DESC, vec_id) AS r_coarse
  FROM scored QUALIFY r_coarse <= {_RRF_POOL}
), fused AS (
  SELECT COALESCE(rf.vec_id, rc.vec_id) AS vec_id,
         CAST(rf.r_full AS INTEGER) AS r_full,
         CAST(rc.r_coarse AS INTEGER) AS r_coarse,
         ROUND(COALESCE(CAST(1.0 AS DOUBLE) / ({_RRF_K} + rf.r_full), 0)
             + COALESCE(CAST(1.0 AS DOUBLE) / ({_RRF_K} + rc.r_coarse), 0), 6)
           AS rrf_score
  FROM rf FULL OUTER JOIN rc ON rf.vec_id = rc.vec_id
)
SELECT vec_id, r_full, r_coarse, rrf_score, CAST(rn AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY rrf_score DESC, vec_id) AS rn FROM fused
) WHERE rn <= 10
""",
    tags=("similarity", "retrieval", "rrf", "llm"),
)
def q_rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF fusion (k=60) of the exact 64-dim cosine top-100 and the
    matryoshka 16-dim coarse-head top-100; final top-10.

    Items outside a list contribute 0 for that arm (standard RRF over
    truncated candidate lists). Ranks are exact integers derived from
    4-decimal-snapped scores with id tiebreaks, so the fused score is
    a two-term sum of exact reciprocals — identical in both engines
    before the 6-decimal snap.
    """
    tune_session(spark)
    e = read_table(spark, sf_dir, "embeddings")
    full = SIM.brute_force_topk(e, "embedding", QUERY_VEC, k=_RRF_POOL)
    coarse_src = e.select(
        "vec_id", F.expr("slice(embedding, 1, 16)").alias("embedding")
    )
    coarse = SIM.brute_force_topk(
        coarse_src, "embedding", QUERY_VEC[:16], k=_RRF_POOL
    )
    fused = (
        full.select("vec_id", F.col("rank").alias("r_full"))
        .join(
            coarse.select("vec_id", F.col("rank").alias("r_coarse")),
            "vec_id",
            "full_outer",
        )
        .select(
            "vec_id",
            "r_full",
            "r_coarse",
            F.round(
                F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_full")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_coarse")), F.lit(0.0)
                ),
                6,
            ).alias("rrf_score"),
        )
    )
    return (
        fused.orderBy(F.col("rrf_score").desc(), "vec_id")
        .limit(10)
        .withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy(F.pmod(F.col("vec_id"), F.lit(1))).orderBy(
                    F.col("rrf_score").desc(), F.col("vec_id")
                )
            ),
        )
    )


# --------------------------------------------------------------------------
# MMR diverse top-k: after retrieval, greedily re-rank each probe's
# candidate pool to trade relevance against redundancy (Carbonell &
# Goldstein 1998) — the context-selection step of a RAG pipeline,
# where stuffing five near-identical passages wastes the budget.
# Physical shape: the pool build is the broadcast kNN join (per-task
# heaps, top-20/probe); the greedy loop is NOT distributed-iterative —
# it runs entirely inside one applyInPandas group per probe over 20
# rows, so the per-probe cost is a 20×20 numpy triangle no matter the
# corpus size, and probes parallelize embarrassingly. At 100 TB the
# only heavy stage is the candidate scan the kNN join already owns.
# --------------------------------------------------------------------------
_MMR_POOL = 20
_MMR_K = 5
_MMR_LAM = 0.7
_MMR_ONE_MINUS_LAM = 0.3  # literal, NOT 1 - lam (binary 0.30000000000000004)


@register(
    "q_mmr_diverse_topk",
    oracle=f"""
WITH RECURSIVE probes AS (
  SELECT vec_id AS pid, CAST(embedding AS DOUBLE[]) AS pe FROM embeddings WHERE vec_id < 8
), cands AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings WHERE vec_id >= 8
), pool AS (
  SELECT pid, cid, rel, ce FROM (
    SELECT p.pid, c.cid, c.ce,
           ROUND(list_cosine_similarity(p.pe, c.ce), 4) AS rel,
           ROW_NUMBER() OVER (PARTITION BY p.pid
             ORDER BY ROUND(list_cosine_similarity(p.pe, c.ce), 4) DESC, c.cid) AS rn
    FROM probes p, cands c
  ) WHERE rn <= {_MMR_POOL}
), pairsim AS (
  SELECT a.pid, a.cid AS ca, b.cid AS cb,
         ROUND(list_cosine_similarity(a.ce, b.ce), 4) AS s
  FROM pool a JOIN pool b ON a.pid = b.pid AND a.cid <> b.cid
), sel AS (
  SELECT pid, 0 AS step, CAST([] AS BIGINT[]) AS selected FROM (SELECT DISTINCT pid FROM pool)
  UNION ALL
  SELECT s.pid, s.step + 1,
         list_append(s.selected, (
           SELECT c.cid FROM pool c
           WHERE c.pid = s.pid AND NOT list_contains(s.selected, c.cid)
           ORDER BY CAST({_MMR_LAM} AS DOUBLE) * c.rel
                    - CAST({_MMR_ONE_MINUS_LAM} AS DOUBLE) * COALESCE((
                        SELECT MAX(ps.s) FROM pairsim ps
                        WHERE ps.pid = s.pid AND ps.ca = c.cid
                          AND list_contains(s.selected, ps.cb)), 0) DESC,
                    c.cid
           LIMIT 1))
  FROM sel s WHERE s.step < {_MMR_K}
), final AS (
  SELECT pid, UNNEST(selected) AS cid,
         UNNEST(generate_series(1, len(selected))) AS step, selected
  FROM sel WHERE step = {_MMR_K}
)
SELECT f.pid AS probe_id, f.cid AS vec_id, CAST(f.step AS INTEGER) AS mmr_rank,
       p.rel,
       ROUND(CAST({_MMR_LAM} AS DOUBLE) * p.rel
             - CAST({_MMR_ONE_MINUS_LAM} AS DOUBLE) * COALESCE((
                 SELECT MAX(ps.s) FROM pairsim ps
                 WHERE ps.pid = f.pid AND ps.ca = f.cid
                   AND list_contains(f.selected[1:CAST(f.step AS INTEGER) - 1], ps.cb)), 0), 6)
         AS mmr_score
FROM final f JOIN pool p ON p.pid = f.pid AND p.cid = f.cid
""",
    tags=("similarity", "retrieval", "mmr", "llm"),
)
def q_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR re-ranking (λ=0.7, k=5 from a top-20 pool) for each of 8
    probe vectors — diverse context selection after retrieval.

    The oracle replays the greedy loop as a recursive CTE carrying the
    selected-id list, with the same literal λ / (1−λ) doubles, the
    same 4-decimal HALF-UP snap on every similarity, and the same
    (score DESC, id ASC) tie rule, so the selection path — not just
    the final scores — is hash-checked. The kernel's raw MMR doubles
    are plan-side ROUND(·, 6)-snapped to match the oracle's ROUND.
    """
    tune_session(spark)
    e = read_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 8).withColumnRenamed("vec_id", "probe_id")
    others = e.filter(F.col("vec_id") >= 8).withColumnRenamed("vec_id", "neighbor_id")
    pool = SIM.knn_join(
        probes,
        others,
        left_id="probe_id",
        right_id="neighbor_id",
        left_vec="embedding",
        right_vec="embedding",
        k=_MMR_POOL,
        strategy="broadcast",
        broadcast_side="left",
    ).select("probe_id", "neighbor_id", F.col("score").alias("rel"))
    pool_vecs = pool.join(
        others.select("neighbor_id", "embedding"), "neighbor_id"
    )
    fn, schema = SIM.mmr_select_kernel(
        "probe_id",
        "neighbor_id",
        "embedding",
        "rel",
        k=_MMR_K,
        lam=_MMR_LAM,
        one_minus_lam=_MMR_ONE_MINUS_LAM,
    )
    out = pool_vecs.groupBy("probe_id").applyInPandas(fn, schema=schema)
    return out.select(
        "probe_id",
        F.col("neighbor_id").alias("vec_id"),
        "mmr_rank",
        "rel",
        F.round("mmr_score", 6).alias("mmr_score"),
    )


_MD5_VEC = "CAST(('0x' || SUBSTR(MD5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT)"


@register(
    "q_knn_graph_expand_topk",
    oracle=f"""
WITH m AS (
  SELECT GREATEST(8, COUNT(*) // 2500) AS modulus FROM embeddings
), nodes AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
  WHERE {_MD5_VEC} % (SELECT modulus FROM m) = 0
), edges AS (
  SELECT src_id, dst_id FROM (
    SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
           ROW_NUMBER() OVER (
             PARTITION BY a.vec_id
             ORDER BY ROUND(list_cosine_similarity(a.emb, b.emb), 4) DESC,
                      b.vec_id) AS r
    FROM nodes a JOIN nodes b ON a.vec_id <> b.vec_id
  ) WHERE r <= 8
), seed AS (
  SELECT vec_id FROM (
    SELECT vec_id,
           ROW_NUMBER() OVER (
             ORDER BY ROUND(list_cosine_similarity(emb,
                        CAST({_QUERY_SQL_ARRAY} AS DOUBLE[])), 4) DESC,
                      vec_id) AS r
    FROM nodes WHERE {_MD5_VEC} % ((SELECT modulus FROM m) * 8) = 0
  ) WHERE r = 1
), hops AS (
  SELECT vec_id, CAST(0 AS BIGINT) AS hop FROM seed
  UNION ALL
  SELECT e.dst_id, 1 FROM edges e JOIN seed s ON e.src_id = s.vec_id
  UNION ALL
  SELECT e2.dst_id, 2
  FROM edges e JOIN seed s ON e.src_id = s.vec_id
  JOIN edges e2 ON e2.src_id = e.dst_id
), cand AS (
  SELECT vec_id, MIN(hop) AS hop FROM hops GROUP BY vec_id
)
SELECT vec_id, score, hop, CAST(rank AS INTEGER) AS rank FROM (
  SELECT c.vec_id,
         ROUND(list_cosine_similarity(n.emb,
                  CAST({_QUERY_SQL_ARRAY} AS DOUBLE[])), 4) AS score,
         c.hop,
         ROW_NUMBER() OVER (
           ORDER BY ROUND(list_cosine_similarity(n.emb,
                      CAST({_QUERY_SQL_ARRAY} AS DOUBLE[])), 4) DESC,
                    c.vec_id) AS rank
  FROM cand c JOIN nodes n ON n.vec_id = c.vec_id
) WHERE rank <= 10
""",
    tags=("similarity", "ann", "graph"),
)
def q_knn_graph_expand_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-based ANN serving (NSW-style, one seed, two-hop beam):
    build a k=8 exact kNN graph over a deterministic md5 1/8 sample of
    the corpus, pick the best entry point from a sparser 1/64 entry
    set, expand its out-edges two hops, exact-rerank the visited set
    against the query, return the top-10 with each row's hop distance.

    The serving shape behind HNSW/NSW deployments, recomposed from
    relational pieces: graph = per-src top-k (the cogroup-einsum
    kernel with a self-pair mask), expansion = two broadcast-joins
    whose left side is <= k^2 rows, rerank = the brute_force_topk
    kernel over <= 1+k+k^2 candidates. The expensive stage is the
    OFFLINE graph build (exact n^2 over the sampled nodes here; at
    100 TB the graph would come from the IVF/LSH candidate generators
    and persist through the layout registry like sources/ann_index.py
    persists PQ codes) — the ONLINE expand+rerank path touches at most
    1 + 8 + 64 vectors regardless of corpus size, which is the point:
    query cost is bounded by graph degree, not corpus mass.

    Oracle-visible end to end: sampling is the portable md5 device, the
    graph ranks round-4 cosine with dst-id tie-break, and hop distances
    ride through a MIN() per candidate — any recall or tie drift flips
    the hash."""
    from etl_project_spark.operators.similarity import grouped_probe_topk
    from etl_project_spark.session import scoped_persist

    tune_session(spark)
    e = read_table(spark, sf_dir, "embeddings")
    h = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    # Scale-adaptive node sampling: the exact graph build is O(nodes^2),
    # so a fixed 1/8 fraction would square with the corpus (62.5G pair
    # scores at sf10). The modulus grows with the corpus to hold the
    # node sample near 2500 (identical to the fixed /8 at the driver's
    # SFs, bounded beyond) — exact integer arithmetic both engines
    # replay, delivered as a 1-row broadcast so plan construction stays
    # lazy (no eager count, the knn_join discipline).
    modulus = F.broadcast(
        e.select(
            F.greatest(
                F.lit(8).cast("bigint"),
                F.floor(F.count(F.lit(1)) / F.lit(2500)).cast("bigint"),
            ).alias("_mod")
        )
    )
    nodes = (
        e.crossJoin(modulus)
        .filter(h % F.col("_mod") == 0)
        .select("vec_id", "embedding", "_mod")
    )
    # The sampled node set is ~2500 rows but derives from a FULL corpus
    # scan + md5 filter, and it feeds four plan branches (both sides of
    # the graph build, the entry set, the rerank join-back) —
    # unpersisted, that's four corpus scans per run (r17). Cache the
    # sample and materialize it so every branch reads the 2500 rows.
    nodes = scoped_persist(nodes)
    nodes.count()

    edges = scoped_persist(
        grouped_probe_topk(
            nodes.select(F.col("vec_id").alias("dst_id"), "embedding"),
            nodes.select(
                F.col("vec_id").alias("src_id"), F.col("embedding").alias("src_emb")
            ),
            corpus_id="dst_id",
            probe_id="src_id",
            corpus_vec="embedding",
            probe_vec="src_emb",
            k=8,
            neq_cols=("dst_id", "src_id"),
        ).select("src_id", "dst_id")
    )

    entries = nodes.filter(h % (F.col("_mod") * 8) == 0)
    seed = (
        SIM.brute_force_topk(entries, "embedding", QUERY_VEC, k=1, id_col="vec_id")
        .select(F.col("vec_id").alias("seed_id"))
    )
    hop0 = seed.select(
        F.col("seed_id").alias("vec_id"), F.lit(0).cast("long").alias("hop")
    )
    hop1 = (
        edges.join(F.broadcast(seed), edges.src_id == seed.seed_id)
        .select(F.col("dst_id").alias("vec_id"), F.lit(1).cast("long").alias("hop"))
    )
    mid = hop1.select(F.col("vec_id").alias("mid_id"))
    hop2 = (
        edges.join(F.broadcast(mid), edges.src_id == F.col("mid_id"))
        .select(F.col("dst_id").alias("vec_id"), F.lit(2).cast("long").alias("hop"))
    )
    cand = (
        hop0.unionByName(hop1)
        .unionByName(hop2)
        .groupBy("vec_id")
        .agg(F.min("hop").alias("hop"))
    )
    scored = cand.join(nodes, "vec_id").select(
        "vec_id",
        F.round(SIM.cosine_score_udf(QUERY_VEC)(F.col("embedding")), 4).alias("score"),
        "hop",
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("vec_id"))
        .limit(10)
        .withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy(F.pmod(F.col("vec_id"), F.lit(1))).orderBy(
                    F.col("score").desc(), F.col("vec_id")
                )
            ),
        )
        .select("vec_id", "score", "hop", "rank")
    )


# --- PCA top component via in-plan power iteration ---------------------------

_PCA_D = 16        # leading embedding dims under analysis
_PCA_ITERS = 40    # fixed iteration budget (determinism, not convergence)


def _pca_oracle_sql() -> str:
    """DuckDB twin of q_pca_power_iteration, generated from the same
    loops as the Spark side so the arithmetic is term-for-term equal."""
    d, iters = _PCA_D, _PCA_ITERS
    covs = ",\n       ".join(
        f"ROUND(COVAR_POP(CAST(embedding[{i}] AS DOUBLE), CAST(embedding[{j}] AS DOUBLE)), 6)"
        f" AS c_{i}_{j}"
        for i in range(1, d + 1)
        for j in range(i, d + 1)
    )
    rows = ", ".join(
        "[" + ", ".join(f"c_{min(i, j)}_{max(i, j)}" for j in range(1, d + 1)) + "]"
        for i in range(1, d + 1)
    )
    trace = " + ".join(f"c_{i}_{i}" for i in range(1, d + 1))
    ones = ", ".join(["CAST(1 AS DOUBLE)"] * d)
    matvec = (
        "LIST_TRANSFORM(C, row -> LIST_REDUCE("
        f"LIST_TRANSFORM(range(1, {d} + 1), k -> row[CAST(k AS INT)] * acc[CAST(k AS INT)]),"
        " (a, b) -> a + b))"
    )
    rayleigh = (
        f"LIST_REDUCE(LIST_TRANSFORM(range(1, {d} + 1),"
        " k -> v[CAST(k AS INT)] * w[CAST(k AS INT)]), (a, b) -> a + b)"
    )
    return f"""
WITH cov AS (
  SELECT {covs}
  FROM embeddings
), mat AS (
  SELECT [{rows}] AS C, ({trace}) AS tr FROM cov
), iter AS (
  SELECT C, tr,
    LIST_REDUCE(
      list_prepend([{ones}], LIST_TRANSFORM(range(1, {iters} + 1), i -> [{ones}])),
      (acc, x) -> LIST_TRANSFORM({matvec},
        y -> y / SQRT(LIST_REDUCE(LIST_TRANSFORM({matvec}, z -> z * z), (a, b) -> a + b)))
    ) AS v
  FROM mat
), scored AS (
  SELECT tr, v,
    LIST_TRANSFORM(C, row -> LIST_REDUCE(
      LIST_TRANSFORM(range(1, {d} + 1), k -> row[CAST(k AS INT)] * v[CAST(k AS INT)]),
      (a, b) -> a + b)) AS w
  FROM iter
)
SELECT CAST(dm AS INTEGER) AS dim_i,
       ROUND(v[CAST(dm AS INT)], 6) + 0.0 AS loading,
       ROUND({rayleigh}, 6) + 0.0 AS eigenvalue,
       ROUND({rayleigh} / tr, 6) + 0.0 AS explained_var_ratio
FROM scored, range(1, {d} + 1) r(dm)
"""


@register(
    "q_pca_power_iteration",
    oracle=_pca_oracle_sql(),
    tags=("similarity", "pca", "power_iteration", "embedding"),
)
def q_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the leading 16 embedding dims by a
    fixed-budget power iteration that runs ENTIRELY in-plan: the
    distributed part is one covariance pass (136 covar_pop aggregates,
    partial map-side combine, 1-row shuffle); the 16x16 eigen-iteration
    is then an ``F.aggregate`` fold over that single row — no driver
    collect, no UDF, no extra job. Reports per-dim loadings, the
    Rayleigh-quotient eigenvalue, and the explained-variance ratio —
    the whitening/compression diagnostic ahead of PQ/IVF index design
    (q_pq_* family).

    Cross-engine contract: both engines ROUND the covariance matrix to
    6 decimals FIRST (absorbing covar_pop's last-ulp accumulation
    differences, the q_embedding_covariance precedent), then run 40
    identical normalized matvec steps from the all-ones start — same
    doubles, same left-to-right fold order (Spark's aggregate starts
    at 0.0; DuckDB's list_reduce starts at the first element; IEEE
    0 + x == x), so the outputs match bit-for-bit BEFORE the final
    cosmetic round(6). On this synthetic near-isotropic corpus the
    spectrum is flat, so 40 iterations measure the procedure, not a
    dominant direction — the eigenvalue still upper-bounds trace/16.
    """
    tune_session(spark)
    d, iters = _PCA_D, _PCA_ITERS
    e = read_table(spark, sf_dir, "embeddings")
    # Single SQL-parsed expressions instead of 136×3 py4j Column calls
    # for the covariance aggs + 256 more for the 16×16 matrix assembly:
    # the Column-comprehension form cost ~1.1 s of driver-side plan
    # construction PER RUN (measured r17, guide §4 — py4j chatter is a
    # Python-boundary cost even with zero UDFs); the parsed form is
    # ~0.2 s with term-for-term identical expressions (same round, same
    # covar_pop, same left-assoc trace sum — collect-equality checked).
    comps = e.selectExpr(
        *[f"CAST(element_at(embedding, {i}) AS DOUBLE) AS x{i}" for i in range(1, d + 1)]
    )
    cov_members = ", ".join(
        f"round(covar_pop(x{i}, x{j}), 6) AS c_{i}_{j}"
        for i in range(1, d + 1)
        for j in range(i, d + 1)
    )
    one = comps.agg(F.expr(f"struct({cov_members}) AS _s")).select("_s.*")
    mat_rows = ", ".join(
        "array(" + ", ".join(f"c_{min(i, j)}_{max(i, j)}" for j in range(1, d + 1)) + ")"
        for i in range(1, d + 1)
    )
    trace = " + ".join(f"c_{i}_{i}" for i in range(1, d + 1))
    mat = one.selectExpr(f"array({mat_rows}) AS C", f"({trace}) AS tr")
    matvec = (
        "transform(C, row -> aggregate(zip_with(row, acc, (p, q) -> p * q),"
        " CAST(0 AS DOUBLE), (a, b) -> a + b))"
    )
    step = (
        f"transform({matvec}, y -> y / SQRT(aggregate(transform({matvec}, z -> z * z),"
        " CAST(0 AS DOUBLE), (a, b) -> a + b)))"
    )
    ones = ", ".join(["CAST(1 AS DOUBLE)"] * d)
    scored = mat.select(
        "C",
        "tr",
        F.expr(f"aggregate(sequence(1, {iters}), array({ones}), (acc, i) -> {step})").alias("v"),
    ).select(
        "tr",
        "v",
        F.expr(
            "transform(C, row -> aggregate(zip_with(row, v, (p, q) -> p * q),"
            " CAST(0 AS DOUBLE), (a, b) -> a + b))"
        ).alias("w"),
    )
    rayleigh = F.expr(
        "aggregate(zip_with(v, w, (p, q) -> p * q), CAST(0 AS DOUBLE), (a, b) -> a + b)"
    )
    # `+ 0.0` AFTER the round normalizes IEEE signed zeros (ADVICE
    # r13): Spark's aggregate seeds 0.0 while DuckDB's list_reduce
    # seeds the first element, so a degenerate all-zero covariance row
    # could yield +0.0 here and -0.0 there — and round(6) preserves the
    # sign into the value hash. -0.0 + 0.0 == +0.0; nonzero values are
    # untouched. Mirrored in the oracle SQL.
    return scored.select(
        F.explode(F.expr(f"sequence(1, {d})")).alias("dm"), "v", "w", "tr"
    ).select(
        F.col("dm").cast("integer").alias("dim_i"),
        (F.round(F.element_at("v", F.col("dm")), 6) + F.lit(0.0)).alias("loading"),
        (F.round(rayleigh, 6) + F.lit(0.0)).alias("eigenvalue"),
        (F.round(rayleigh / F.col("tr"), 6) + F.lit(0.0)).alias(
            "explained_var_ratio"
        ),
    )
