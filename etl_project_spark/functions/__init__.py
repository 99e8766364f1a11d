"""Column-expression function library (the engine's scalar surface).

One import point for every reusable column expression the engine
defines, grouped by family — all JVM-side Catalyst expressions unless
explicitly marked as Arrow UDF factories. Mirrors the reference's
scalar idioms (SURVEY.md §2: S3/S5 regex extraction, T4 guard, T5
concat) and the north-star text/similarity functions.
"""

from etl_project_spark.cleaning import (
    DEFAULT_SENTINELS,
    cast_columns,
    nullify_sentinels,
    split_latlng,
)
from etl_project_spark.operators.dedup import (
    char_shingles,
    jaccard,
    normalize_text,
    token_ngrams,
)
from etl_project_spark.operators.multimodal import byte_entropy, sniff_type
from etl_project_spark.operators.similarity import (
    cosine_score_udf,
    hyperplane_table_sigs_udf,
    pairwise_cosine_udf,
)
from etl_project_spark.operators.text import (
    BPE_ISH_PATTERN,
    STOPWORDS,
    bpe_token_estimate,
    fingerprint,
    lang_id,
    lang_scores,
    occurrences,
    punct_count,
    quality_score,
    stopword_hits,
    token_count,
)

__all__ = [
    "DEFAULT_SENTINELS",
    "cast_columns",
    "nullify_sentinels",
    "split_latlng",
    "char_shingles",
    "jaccard",
    "normalize_text",
    "token_ngrams",
    "byte_entropy",
    "sniff_type",
    "cosine_score_udf",
    "hyperplane_table_sigs_udf",
    "pairwise_cosine_udf",
    "BPE_ISH_PATTERN",
    "STOPWORDS",
    "bpe_token_estimate",
    "fingerprint",
    "lang_id",
    "lang_scores",
    "occurrences",
    "punct_count",
    "quality_score",
    "stopword_hits",
    "token_count",
]
