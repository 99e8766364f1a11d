"""Incremental similarity search over a streaming embedding corpus.

The interactive/continuous top-k family from the retrieved-papers list
("Incremental … Top-K Similarity Search", EDBT 2020; "Continuously
Adaptive Similarity Search", SIGMOD 2020), reduced to its distributed
core: cosine top-k is a MONOID — ``topk(A ∪ B) = merge_k(topk(A),
topk(B))`` under the (score DESC, id ASC) total order — so a stream
maintains the exact global answer by merging each micro-batch's
``brute_force_topk`` into a k-row accumulator. Per batch the cluster
does one bounded scan + per-task heaps; the driver-held state is k
rows, the same "index-build metadata" budget as the IVF centroids.
The batch twin is ``q_knn_bruteforce_topk`` itself — the final
accumulator must equal it row-for-row (asserted in
tests/test_streaming.py::test_stream_incremental_topk_matches_batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

EMBEDDINGS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def read_embeddings_stream(
    spark: SparkSession, path: str, *, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-stream source over an embeddings parquet directory;
    ``maxFilesPerTrigger`` is the micro-batch knob."""
    from etl_project_spark.session import tune_session

    tune_session(spark)
    return (
        spark.readStream.schema(EMBEDDINGS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def incremental_topk_query(
    stream_df: DataFrame,
    query_vec: list,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint: str,
    state: list,
):
    """Start a foreachBatch stream that maintains the exact global
    cosine top-k in ``state`` (a list of ``(score, id)`` tuples, best
    first). Each micro-batch contributes its own distributed top-k
    (``brute_force_topk``: per-task heaps, k rows to the driver);
    the merge keeps ``merge_k`` associative and order-correct via the
    same (score DESC, id ASC) tie rule the batch twin ranks by.

    At-least-once discipline (ADVICE r12): ``foreachBatch`` may replay
    a batch after a crash between merge and checkpoint commit, so the
    merge dedups by id (keeping the best score) before truncating —
    a replayed batch is then a no-op instead of a duplicate tuple that
    could evict a distinct true top-k row. The inverse failure is NOT
    recoverable from the checkpoint alone: on restart the driver-local
    ``state`` starts empty while the checkpoint skips committed
    batches, so the exact-global-answer claim holds for a single clean
    run — rebuild from scratch (fresh checkpoint) after a restart."""
    from etl_project_spark.operators.similarity import brute_force_topk

    def merge_batch(batch_df, batch_id):
        rows = brute_force_topk(
            batch_df, vec_col, query_vec, k=k, id_col=id_col
        ).collect()
        best: dict = {}
        for score, vid in state + [
            (float(r["score"]), int(r[id_col])) for r in rows
        ]:
            if vid not in best or score > best[vid]:
                best[vid] = score
        merged = sorted(
            ((s, i) for i, s in best.items()), key=lambda t: (-t[0], t[1])
        )[:k]
        state[:] = merged

    return (
        stream_df.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
