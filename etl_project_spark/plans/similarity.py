"""Similarity-search queries over ``embeddings``.

The brute-force cosine top-k IS oracle-checkable thanks to DuckDB's
``list_cosine_similarity`` — both engines compute the same double-
precision expression, rounded to 4 decimals before ranking ties are
broken by id. The LSH-bucketed ANN variant is rows-only with a recall
property test against the brute-force result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_project_spark.catalog import read_table
from etl_project_spark.operators import similarity as SIM
from etl_project_spark.plans.registry import register
from etl_project_spark.session import tune_session

#: Deterministic unit-ish query vector: alternating ramp, 64 dims.
#: A fixed literal (not data-derived) so Spark and the oracle agree.
QUERY_VEC = [((i % 7) - 3.0) / 3.0 for i in range(64)]

_QUERY_SQL_ARRAY = "[" + ", ".join(f"{v!r}" for v in QUERY_VEC) + "]"


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
    oracle=None,  # approximate; recall property-tested vs brute force
    tags=("similarity", "ann", "rows-only"),
)
def q_knn_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via multi-table hyperplane LSH (8×6 bits)."""
    tune_session(spark)
    e = read_table(spark, sf_dir, "embeddings")
    return SIM.lsh_bucketed_topk(
        e, "embedding", QUERY_VEC, dim=64, k=10, id_col="vec_id",
        n_tables=8, planes_per_table=6,
    ).select("vec_id", "score", "rank")


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
        strategy="broadcast",  # right side is known-small here
    )
    return out.orderBy("probe_id", "rank")


@register(
    "q_knn_join_lsh",
    oracle=None,  # approximate; recall property-tested vs brute knn_join
    tags=("similarity", "knn-join", "ann", "rows-only"),
)
def q_knn_join_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed kNN join (large×large scale path): signature
    equi-join candidates → exact rerank → top-3 per probe."""
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
        strategy="lsh",
        dim=64,
    )
    return out.orderBy("probe_id", "rank")


@register(
    "q_knn_ivf_topk",
    oracle=None,  # approximate; recall property-tested vs brute force
    tags=("similarity", "ivf", "rows-only"),
)
def q_knn_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-pruned approximate top-10 (16 cells, probe 4)."""
    tune_session(spark)
    e = read_table(spark, sf_dir, "embeddings")
    cents = SIM.deterministic_centroids(e, "embedding", "vec_id", n_cells=16)
    return SIM.ivf_topk(
        e, "embedding", QUERY_VEC, cents, k=10, id_col="vec_id", n_probe=4
    ).select("vec_id", "score", "rank")
