"""Text-analysis queries over the ``documents`` table.

Query wrappers around :mod:`etl_project_spark.operators.text`. Every
expression was chosen to have bit-identical ANSI-SQL semantics (length
-difference occurrence counting, md5 of normalized text) so the whole
text surface is oracle-checked, not just rows-only.
"""

from __future__ import annotations


import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_project_spark.catalog import read_table
from etl_project_spark.operators import text as TX
from etl_project_spark.plans.registry import register
from etl_project_spark.session import tune_session


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return read_table(spark, sf_dir, "documents")


def _ws_token_rows(d: DataFrame, key: str) -> DataFrame:
    """Whitespace token rows ``(key, term)`` over non-empty documents —
    the engine-side twin of the oracles' ``regexp_split_to_array`` CTE.
    ONE definition feeds every token-distribution query (Gopher rules,
    cross-entropy, per-source KL) so a tokenization tweak can never
    reach one of them without the others (and their oracles) moving in
    lockstep.
    """
    return d.filter(F.length(F.trim("text")) > 0).select(
        key,
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term"),
    )



# SQL fragment mirroring operators.text.token_count (CAST: duckdb len()
# is BIGINT, Spark size() is INT — match Spark).
_SQL_TOKEN_COUNT = (
    "CAST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0 "
    "ELSE len(regexp_split_to_array(TRIM(text), '\\s+')) END AS INTEGER)"
)

# SQL fragment mirroring operators.text.occurrences(padded, ' the ') etc.
def _sql_occurrences(expr: str, needle: str) -> str:
    esc = needle.replace("'", "''")
    return (
        f"CAST((LENGTH({expr}) - LENGTH(REPLACE({expr}, '{esc}', ''))) / {len(needle)} AS INTEGER)"
    )


def _sql_stopword_hits(lang: str) -> str:
    padded = "CONCAT(' ', LOWER(text), ' ')"
    terms = [_sql_occurrences(padded, f" {w} ") for w in TX.STOPWORDS[lang]]
    return "(" + " + ".join(terms) + ")"


@register(
    "q_token_stats_per_lang",
    oracle=f"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM({_SQL_TOKEN_COUNT}) AS BIGINT) AS total_tokens,
       ROUND(AVG({_SQL_TOKEN_COUNT}), 4) AS avg_tokens,
       MAX(n_chars) AS max_chars
FROM documents
GROUP BY lang
""",
    tags=("text", "agg"),
)
def q_token_stats_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting aggregated per language tag."""
    d = _docs(spark, sf_dir)
    n_tok = TX.token_count(F.col("text"))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok).alias("total_tokens"),
        F.round(F.avg(n_tok), 4).alias("avg_tokens"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "q_doc_quality_profile",
    oracle=f"""
SELECT doc_id,
       {_SQL_TOKEN_COUNT} AS n_tokens,
       CAST(LENGTH(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS INTEGER) AS n_punct,
       ROUND(
         0.5 * (CASE WHEN {_SQL_TOKEN_COUNT} BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
       + 0.3 * (CASE WHEN {_SQL_TOKEN_COUNT} > 0
                      AND (CAST(LENGTH(text) AS DOUBLE) / {_SQL_TOKEN_COUNT}) BETWEEN 2.0 AND 12.0
                     THEN 1.0 ELSE 0.0 END)
       + 0.2 * (CASE WHEN LENGTH(regexp_replace(text, '[^.,!?;:]', '', 'g')) > 0
                     THEN 1.0 ELSE 0.0 END), 4) AS quality
FROM documents
""",
    tags=("text",),
)
def q_doc_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality score (length/token-length/punct blend)."""
    d = _docs(spark, sf_dir)
    c = F.col("text")
    return d.select(
        "doc_id",
        TX.token_count(c).alias("n_tokens"),
        TX.punct_count(c).alias("n_punct"),
        F.round(TX.quality_score(c), 4).alias("quality"),
    )


@register(
    "q_lang_stopword_scores",
    oracle=f"""
SELECT doc_id,
       lang,
       {_sql_stopword_hits('en')} AS hits_en,
       {_sql_stopword_hits('es')} AS hits_es,
       {_sql_stopword_hits('fr')} AS hits_fr,
       {_sql_stopword_hits('de')} AS hits_de
FROM documents
""",
    tags=("text", "langid"),
)
def q_lang_stopword_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit scores per language — the lang-ID heuristic's inputs."""
    d = _docs(spark, sf_dir)
    c = F.col("text")
    return d.select(
        "doc_id",
        "lang",
        TX.stopword_hits(c, "en").alias("hits_en"),
        TX.stopword_hits(c, "es").alias("hits_es"),
        TX.stopword_hits(c, "fr").alias("hits_fr"),
        TX.stopword_hits(c, "de").alias("hits_de"),
    )


@register(
    "q_lang_id_confusion",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang,
         {_sql_stopword_hits('en')} AS s_en,
         {_sql_stopword_hits('es')} AS s_es,
         {_sql_stopword_hits('fr')} AS s_fr,
         {_sql_stopword_hits('de')} AS s_de
  FROM documents
), best AS (
  SELECT lang,
         CASE WHEN GREATEST(s_en, s_es, s_fr, s_de) <= 0 THEN 'und'
              WHEN s_en = GREATEST(s_en, s_es, s_fr, s_de) THEN 'en'
              WHEN s_es = GREATEST(s_en, s_es, s_fr, s_de) THEN 'es'
              WHEN s_fr = GREATEST(s_en, s_es, s_fr, s_de) THEN 'fr'
              ELSE 'de' END AS lang_pred
  FROM scored
)
SELECT lang, lang_pred, COUNT(*) AS n_docs
FROM best
GROUP BY lang, lang_pred
""",
    tags=("text", "langid"),
)
def q_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID classification vs the corpus label (confusion counts).

    The heuristic's argmax tie rule (earliest language in declaration
    order wins; all-zero → 'und') is mirrored exactly in the oracle's
    CASE ordering.
    """
    d = _docs(spark, sf_dir)
    return (
        d.select("lang", TX.lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "q_bpe_token_estimate",
    oracle="""
SELECT lang,
       CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]'))) AS BIGINT) AS est_bpe_tokens,
       ROUND(AVG(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]'))), 4) AS avg_bpe_tokens
FROM documents
GROUP BY lang
""",
    tags=("text", "tokenize"),
)
def q_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token-count estimate (subword regex) per language.

    Greedy ≤4-letter alpha chunks + single digits + single symbols —
    the cheap LLM-token budget estimator; same regex runs in both
    engines (Java regex / RE2 agree on this pattern).
    """
    d = _docs(spark, sf_dir)
    n = TX.bpe_token_estimate(F.col("text"))
    return d.groupBy("lang").agg(
        F.sum(n).cast("long").alias("est_bpe_tokens"),
        F.round(F.avg(n), 4).alias("avg_bpe_tokens"),
    )


@register(
    "q_doc_fingerprint_clusters",
    oracle="""
SELECT md5(TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g'))) AS fingerprint,
       MIN(doc_id) AS representative_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
""",
    tags=("text", "dedup"),
)
def q_doc_fingerprint_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-fingerprint clustering: exact-dup groups by md5 key."""
    from etl_project_spark.operators.dedup import dedup_clusters

    d = _docs(spark, sf_dir)
    clusters = dedup_clusters(d, "doc_id", TX.fingerprint(F.col("text")))
    return clusters.select(
        F.col("_key").alias("fingerprint"),
        "representative_id",
        "n_copies",
    )


#: Shared alnum tokenizer (Spark + SQL twins): ONE definition for every
#: vocabulary-shaped query (tf-idf, Zipf, negative sampling, ...) so a
#: tokenization change can never skew one query's vocabulary vs the
#: others.
_SQL_ALNUM_COUNTS_CTE = """
  SELECT term, COUNT(*) AS c FROM (
    SELECT UNNEST(string_split(regexp_replace(LOWER(text), '[^a-z0-9]+', ' ', 'g'), ' ')) AS term
    FROM documents
  ) WHERE term <> ''
  GROUP BY term
"""


def _alnum_terms(d: DataFrame) -> DataFrame:
    """(doc_id, term) rows under the shared alnum tokenizer."""
    return d.select(
        "doc_id",
        F.explode(
            F.split(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "), " ")
        ).alias("term"),
    ).where(F.col("term") != "")


def _alnum_term_counts(d: DataFrame) -> DataFrame:
    """(term, c) corpus vocabulary under the shared alnum tokenizer."""
    return _alnum_terms(d).groupBy("term").agg(F.count(F.lit(1)).alias("c"))


@register(
    "q_tfidf_term_stats",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         UNNEST(string_split(regexp_replace(LOWER(text), '[^a-z0-9]+', ' ', 'g'), ' ')) AS term
  FROM documents
), clean AS (
  SELECT doc_id, term FROM toks WHERE term <> ''
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM clean GROUP BY doc_id, term
), n AS (
  SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM clean
)
SELECT term,
       COUNT(*) AS df,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       ROUND(LN((SELECT n_docs FROM n) / COUNT(*)), 4) AS idf,
       ROUND(LN((SELECT n_docs FROM n) / COUNT(*)) * AVG(CAST(tf AS DOUBLE)), 4)
         AS avg_tfidf
FROM tf
GROUP BY term
""",
    tags=("text", "tfidf"),
)
def q_tfidf_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus TF-IDF vocabulary table: df, total tf, idf, mean tf-idf.

    Two hash aggregates after an in-codegen explode — no spark.ml
    pipeline, no vocabulary broadcast. The corpus size N joins in as a
    broadcast 1-row aggregate (never a driver collect), so the same
    plan runs at 100 TB: explode → partial agg per (doc, term) →
    shuffle on term.
    """
    toks = _alnum_terms(_docs(spark, sf_dir))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = toks.agg(
        F.count_distinct("doc_id").cast("double").alias("n_docs")
    )
    idf = F.log(F.col("n_docs") / F.col("df"))
    return (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
            F.avg(F.col("tf").cast("double")).alias("_avg_tf"),
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            "df",
            "total_tf",
            F.round(idf, 4).alias("idf"),
            F.round(idf * F.col("_avg_tf"), 4).alias("avg_tfidf"),
        )
    )


@register(
    "q_winnowing_fingerprints",
    oracle="""
WITH norm AS (
  SELECT doc_id, TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g')) AS t
  FROM documents
), pos AS (
  SELECT doc_id, t,
         UNNEST(generate_series(1, GREATEST(LENGTH(t) - 7, 1))) AS p
  FROM norm
), hashes AS (
  SELECT doc_id, p,
         CAST(('0x' || substr(md5(substr(t, p, 8)), 1, 15)) AS BIGINT) AS h
  FROM pos
), mins AS (
  SELECT doc_id,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
  FROM hashes
), fps AS (
  SELECT DISTINCT doc_id, fp FROM mins
)
SELECT doc_id, COUNT(*) AS n_fps, MIN(fp) AS fp_min, MAX(fp) AS fp_max
FROM fps GROUP BY doc_id
""",
    tags=("text", "fingerprint", "rolling-hash"),
)
def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash winnowing fingerprint profile per document
    (k-gram 8, window 4): fingerprint-set size and extrema."""
    d = _docs(spark, sf_dir)
    fps = TX.winnowing_fingerprint_rows(d, "doc_id", "text", k=8, w=4)
    return fps.groupBy(F.col("_id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_fps"),
        F.min("_fp").alias("fp_min"),
        F.max("_fp").alias("fp_max"),
    )


@register(
    "q_text_scrub_stats",
    oracle="""
WITH scrubbed AS (
  SELECT lang,
         LENGTH(text) AS raw_len,
         LENGTH(TRIM(regexp_replace(regexp_replace(text, '\\b(a|the)\\b', '', 'g'),
                                    '\\s+', ' ', 'g'))) AS clean_len
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(raw_len) AS BIGINT) AS raw_chars,
       CAST(SUM(clean_len) AS BIGINT) AS clean_chars,
       ROUND(1.0 * SUM(clean_len) / SUM(raw_len), 6) AS keep_ratio
FROM scrubbed
GROUP BY lang
""",
    tags=("text", "scrub"),
)
def q_text_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-cleaning profile: stopword scrub + whitespace normalize.

    The boilerplate-removal stage of a training-data pipeline as pure
    codegen expressions: two regexp_replace passes (word-boundary
    stopword strip, whitespace squeeze) and length accounting per
    language. Both engines' regex dialects (Java, RE2) agree on
    ``\\b``/``\\s`` so the oracle is exact; lengths are integers, so
    the sums and ratio are order-insensitive.
    """
    d = _docs(spark, sf_dir)
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), r"\b(a|the)\b", ""), r"\s+", " "
        )
    )
    return (
        d.select("lang", F.length("text").alias("raw_len"), F.length(clean).alias("clean_len"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("raw_len").alias("raw_chars"),
            F.sum("clean_len").alias("clean_chars"),
            F.round(F.sum("clean_len") / F.sum("raw_len"), 6).alias("keep_ratio"),
        )
    )


def _sql_sentiment_hits(polarity: str) -> str:
    padded = "CONCAT(' ', LOWER(text), ' ')"
    terms = [_sql_occurrences(padded, f" {w} ") for w in TX.SENTIMENT_LEXICON[polarity]]
    return "(" + " + ".join(terms) + ")"


@register(
    "q_sentiment_scores_per_source",
    oracle=f"""
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM({_sql_sentiment_hits('pos')}) AS BIGINT) AS pos_hits,
       CAST(SUM({_sql_sentiment_hits('neg')}) AS BIGINT) AS neg_hits,
       ROUND(AVG(1.0 * ({_sql_sentiment_hits('pos')} - {_sql_sentiment_hits('neg')})
                 / ({_sql_sentiment_hits('pos')} + {_sql_sentiment_hits('neg')} + 1)), 6)
           AS avg_sentiment
FROM documents
GROUP BY source
""",
    tags=("text", "sentiment"),
)
def q_sentiment_scores_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based sentiment rollup per source (EDBT 2016 scheme).

    Polarity hits are word-boundary occurrence counts (length-difference
    trick — stays in codegen, no UDF, no tokenizer materialization);
    the per-doc score is integer arithmetic plus one division, so the
    source-level average is exact for the oracle. The shape a
    sentiment-labeling stage takes in a training-data pipeline:
    map-side scoring, one narrow shuffle on the group key.
    """
    d = _docs(spark, sf_dir)
    c = F.col("text")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(TX.sentiment_hits(c, "pos")).alias("pos_hits"),
        F.sum(TX.sentiment_hits(c, "neg")).alias("neg_hits"),
        F.round(F.avg(TX.sentiment_score(c)), 6).alias("avg_sentiment"),
    )


@register(
    "q_bm25_query_scores",
    oracle=f"""
WITH tf AS (
  SELECT doc_id,
         {_sql_occurrences("CONCAT(' ', LOWER(text), ' ')", ' spark ')} AS tf1,
         {_sql_occurrences("CONCAT(' ', LOWER(text), ' ')", ' fast ')} AS tf2,
         {_sql_occurrences("CONCAT(' ', LOWER(text), ' ')", ' query ')} AS tf3,
         {_SQL_TOKEN_COUNT} AS dl
  FROM documents
), stats AS (
  SELECT COUNT(*) AS n,
         AVG(dl) AS avgdl,
         SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2,
         SUM(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS df3
  FROM tf
)
SELECT doc_id,
       ROUND(
         LN((n - df1 + 0.5) / (df1 + 0.5) + 1) * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
       + LN((n - df2 + 0.5) / (df2 + 0.5) + 1) * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
       + LN((n - df3 + 0.5) / (df3 + 0.5) + 1) * (tf3 * 2.2) / (tf3 + 1.2 * (0.25 + 0.75 * dl / avgdl)),
       6) AS bm25
FROM tf, stats
""",
    tags=("text", "relevance", "bm25"),
)
def q_bm25_query_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 scores for the query {spark, fast, query} (k1=1.2, b=0.75).

    Search-relevance scoring as a two-pass plan: per-doc term
    frequencies + doc length (map-side, codegen occurrence counts),
    then one 1-row corpus-stats aggregate (N, avgdl, per-term df)
    broadcast back as a cross input — the same shape TF-IDF takes.
    Every arithmetic step is associated identically in the SQL so the
    doubles match bit-for-bit before the final round. At 100 TB the
    stats row is a Grand Total aggregate — cheap — and scoring stays
    embarrassingly parallel.
    """
    d = _docs(spark, sf_dir)
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    tf = d.select(
        "doc_id",
        TX.occurrences(padded, " spark ").alias("tf1"),
        TX.occurrences(padded, " fast ").alias("tf2"),
        TX.occurrences(padded, " query ").alias("tf3"),
        TX.token_count(F.col("text")).alias("dl"),
    )
    stats = tf.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("dl").alias("avgdl"),
        F.sum((F.col("tf1") > 0).cast("bigint")).alias("df1"),
        F.sum((F.col("tf2") > 0).cast("bigint")).alias("df2"),
        F.sum((F.col("tf3") > 0).cast("bigint")).alias("df3"),
    )

    def part(tfc: str, dfc: str):
        idf = F.log((F.col("n") - F.col(dfc) + 0.5) / (F.col(dfc) + 0.5) + 1)
        denom = F.col(tfc) + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
        return idf * (F.col(tfc) * 2.2) / denom

    return (
        tf.join(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(part("tf1", "df1") + part("tf2", "df2") + part("tf3", "df3"), 6).alias("bm25"),
        )
    )


@register(
    "q_chunk_documents_overlap",
    oracle="""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') AS t
  FROM documents
), chunks AS (
  SELECT doc_id, i AS chunk_idx,
         t[i * 24 + 1 : i * 24 + 32] AS c
  FROM toks, UNNEST(generate_series(0, (len(t) - 1) // 24)) AS u(i)
)
SELECT doc_id,
       CAST(chunk_idx AS INTEGER) AS chunk_idx,
       CAST(len(c) AS INTEGER) AS n_chunk_tokens,
       MD5(array_to_string(c, ' ')) AS chunk_fp
FROM chunks
""",
    tags=("text", "chunking"),
)
def q_chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: 32-token chunks, stride 24 (8 overlap).

    The pretraining-prep operator that turns documents into
    model-window pieces: tokenize (whitespace), emit one row per chunk
    start (posexplode over a stride sequence), slice the token array,
    fingerprint the chunk text. Pure codegen expressions — the explode
    multiplies rows ~len/stride with no UDF and no shuffle; chunking
    composes with the dedup family downstream (dedup on chunk_fp).
    Output carries the md5 fingerprint, not the chunk text, so the
    plan stays narrow at scale.
    """
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    )
    starts = F.sequence(F.lit(0), F.expr("(size(t) - 1) div 24"))
    chunks = toks.select(
        "doc_id",
        F.explode(starts).alias("chunk_idx"),
        F.col("t"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.slice("t", F.col("chunk_idx") * 24 + 1, 32).alias("c"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size("c").alias("n_chunk_tokens"),
        F.md5(F.array_join("c", " ")).alias("chunk_fp"),
    )


@register(
    "q_udtf_top_terms_per_doc",
    oracle="""
WITH tok AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(TRIM(text), '\\s+')) AS term
  FROM documents
), cnt AS (
  SELECT doc_id, term, COUNT(*) AS n FROM tok GROUP BY doc_id, term
), rk AS (
  SELECT doc_id, term, n,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, term) AS r
  FROM cnt
)
SELECT doc_id, term, CAST(n AS INTEGER) AS n
FROM rk WHERE r <= 3
""",
    tags=("text", "udtf"),
)
def q_udtf_top_terms_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via LATERAL: top-3 terms per document.

    The table-function seam (one row in, many rows out, per-row Python
    state) — Spark 4's ``@udtf`` registered and invoked through SQL
    LATERAL, hash-checked against the explode+group+row_number twin.
    Ties break on (count desc, term asc) in both the Python Counter
    sort and the oracle's ROW_NUMBER, so results are deterministic.
    Row-at-a-time Python is the slow path by design rules — the
    declarative twin IS the scale implementation; the UDTF exists for
    logic that genuinely can't be expressed as expressions.
    """
    from collections import Counter

    from pyspark.sql.functions import udtf

    @udtf(returnType="term string, n int")
    class TopTerms:
        def eval(self, text: str):
            counts = Counter((text or "").split())
            for term, n in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]:
                yield term, int(n)

    spark.udtf.register("top_terms", TopTerms)
    _docs(spark, sf_dir).createOrReplaceTempView("documents")
    return spark.sql(
        "SELECT d.doc_id, t.term, t.n "
        "FROM documents d, LATERAL top_terms(d.text) t"
    )


@register(
    "q_sequence_packing",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang,
         LENGTH(TRIM(regexp_replace(text, '\\s+', ' ', 'g')))
           - LENGTH(REPLACE(TRIM(regexp_replace(text, '\\s+', ' ', 'g')), ' ', ''))
           + 1 AS n_tokens
  FROM documents
), packed AS (
  SELECT doc_id, lang, n_tokens,
         CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_tokens) / 512.0) AS BIGINT) AS pack_id
  FROM toks
)
SELECT lang, pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
FROM packed
GROUP BY lang, pack_id
""",
    tags=("text", "llm", "packing"),
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed-size context windows
    (512 whitespace tokens) by contiguous fill — running token count
    per language, pack = floor(tokens-before-this-doc / window).

    The training-data step after dedup/sampling: examples are packed
    into context-length buckets so batches waste no padding. The
    contiguous-fill formulation is one window cumsum per language
    partition (deterministic doc_id order), shuffling each row once —
    vs. bin-packing heuristics that are driver-side and unscalable. A
    doc longer than the window spills across packs by construction,
    matching common concat-and-chunk training pipelines.
    """
    from pyspark.sql import Window as W

    d = _docs(spark, sf_dir)
    norm = F.trim(F.regexp_replace("text", r"\s+", " "))
    toks = d.select(
        "doc_id",
        "lang",
        (
            F.length(norm)
            - F.length(F.regexp_replace(norm, " ", ""))
            + 1
        ).alias("n_tokens"),
    )
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = toks.withColumn(
        "pack_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 512.0).cast(
            "bigint"
        ),
    )
    return packed.groupBy("lang", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
    )


@register(
    "q_gopher_repetition_rules",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '\\s+')) AS term
  FROM documents
  WHERE LENGTH(TRIM(text)) > 0
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), prof AS (
  SELECT doc_id,
         CAST(SUM(tf) AS INTEGER) AS n_tokens,
         CAST(COUNT(*) AS INTEGER) AS n_distinct,
         ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(tf), 4) AS distinct_ratio,
         ROUND(CAST(MAX(tf) AS DOUBLE) / SUM(tf), 4) AS top_term_frac,
         ROUND(SUM(LENGTH(term) * tf) / CAST(SUM(tf) AS DOUBLE), 4)
           AS mean_word_len
  FROM tf GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct, distinct_ratio, top_term_frac,
       mean_word_len,
       CASE WHEN n_tokens BETWEEN 10 AND 100000
             AND mean_word_len BETWEEN 2.0 AND 12.0
             AND distinct_ratio >= 0.2
             AND top_term_frac <= 0.2
            THEN TRUE ELSE FALSE END AS keep
FROM prof
""",
    tags=("text", "quality", "gopher"),
)
def q_gopher_repetition_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/quality gate per document.

    Reference-class rule set (Gopher / MassiveText filtering, Rae et
    al. 2021 §A1.1) restricted to the signals that vary on this
    corpus: token-count bounds, mean word length window, vocabulary
    diversity (distinct/total ratio), and top-term dominance (the
    "fraction of the doc that is its most common word" repetition
    rule). Docs failing any rule are flagged, not dropped, so the
    gate composes with downstream sampling.

    Scale shape: one in-codegen explode → per-(doc, term) partial
    hash agg (map-side combine) → per-doc agg. Both shuffles key on
    doc_id-derived keys — uniform by construction, no skew; nothing
    is collected and no window function is needed (MAX(tf) folds into
    the per-doc aggregate).
    """
    d = _docs(spark, sf_dir)
    toks = _ws_token_rows(d, "doc_id")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_tokens = F.sum("tf")
    prof = tf.groupBy("doc_id").agg(
        n_tokens.cast("int").alias("n_tokens"),
        F.count(F.lit(1)).cast("int").alias("n_distinct"),
        F.round(F.count(F.lit(1)) / n_tokens, 4).alias("distinct_ratio"),
        F.round(F.max("tf") / n_tokens, 4).alias("top_term_frac"),
        F.round(
            F.sum(F.length("term") * F.col("tf")) / n_tokens.cast("double"), 4
        ).alias("mean_word_len"),
    )
    keep = (
        F.col("n_tokens").between(10, 100000)
        & F.col("mean_word_len").between(2.0, 12.0)
        & (F.col("distinct_ratio") >= 0.2)
        & (F.col("top_term_frac") <= 0.2)
    )
    return prof.select("*", keep.alias("keep"))


@register(
    "q_unigram_cross_entropy",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '\\s+')) AS term
  FROM documents WHERE LENGTH(TRIM(text)) > 0
), lm AS (
  SELECT term, COUNT(*) AS tf,
         (SELECT COUNT(*) FROM toks) AS corpus_tokens
  FROM toks GROUP BY term
)
SELECT t.doc_id,
       CAST(COUNT(*) AS INTEGER) AS n_tokens,
       ROUND(AVG(-LOG2(CAST(lm.tf AS DOUBLE) / lm.corpus_tokens)), 4)
         AS cross_entropy_bits
FROM toks t JOIN lm ON lm.term = t.term
GROUP BY t.doc_id
""",
    tags=("text", "quality", "language-model"),
)
def q_unigram_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram cross-entropy against the corpus language
    model — the perplexity-proxy quality signal (CCNet-style filtering
    ranks documents by LM perplexity; a corpus-unigram model is its
    degenerate, engine-native form).

    Low bits = stereotypical word soup, high bits = rare-token-heavy
    text; pipelines keep the middle band. Scale shape: the token
    explode appears in both the LM branch (term counts — the "model"
    stays a DataFrame, never collected) and the scoring branch; the
    two aggregates differ, so the explode genuinely runs twice —
    deliberately, since re-running an in-codegen split/explode is
    cheaper at scale than materializing the exploded rows. The
    corpus-total denominator is a 1-row broadcast. All shuffles key on
    term/doc hashes — skew-free.
    """
    d = _docs(spark, sf_dir)
    toks = _ws_token_rows(d, "doc_id")
    total = toks.agg(F.count(F.lit(1)).alias("corpus_tokens"))
    lm = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .crossJoin(F.broadcast(total))
    )
    bits = -F.log2(F.col("tf").cast("double") / F.col("corpus_tokens"))
    return (
        toks.join(lm, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.round(F.avg(bits), 4).alias("cross_entropy_bits"),
        )
    )


_KL_ORACLE = """
WITH toks AS (
  SELECT source,
         UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '\\s+')) AS term
  FROM documents WHERE LENGTH(TRIM(text)) > 0
), src_tf AS (
  SELECT source, term, COUNT(*) AS tf FROM toks GROUP BY source, term
), src_tot AS (
  SELECT source, CAST(SUM(tf) AS BIGINT) AS src_tokens
  FROM src_tf GROUP BY source
), corpus_tf AS (
  SELECT term, CAST(SUM(tf) AS BIGINT) AS ctf,
         (SELECT SUM(tf) FROM src_tf) AS corpus_tokens
  FROM src_tf GROUP BY term
)
SELECT s.source,
       t.src_tokens,
       ROUND(SUM((CAST(s.tf AS DOUBLE) / t.src_tokens)
                 * LOG2((CAST(s.tf AS DOUBLE) / t.src_tokens)
                        / (CAST(c.ctf AS DOUBLE) / c.corpus_tokens))), 6)
         AS kl_bits
FROM src_tf s
JOIN src_tot t ON t.source = s.source
JOIN corpus_tf c ON c.term = s.term
GROUP BY s.source, t.src_tokens
"""


@register(
    "q_source_token_kl",
    oracle=_KL_ORACLE,
    tags=("text", "distribution", "kl-divergence"),
)
def q_source_token_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence of each source's token distribution from the
    corpus distribution — the domain-shift / mixture-drift detector.

    Data curation watches this number per ingest source: a source
    whose KL(source‖corpus) jumps is changing vocabulary (spam influx,
    format break, language drift). KL is finite by construction here —
    every source term exists in the corpus distribution (P ≪ Q), so no
    smoothing constant sneaks into the oracle comparison. Shape: one
    explode → (source, term) hash agg, and every later branch derives
    from THAT aggregate (tokens are never re-exploded); the per-source
    and corpus totals are tiny broadcast aggregates; the scoring join
    keys on term — skew-free.
    """
    d = _docs(spark, sf_dir)
    toks = _ws_token_rows(d, "source")
    src_tf = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf"))
    src_tot = src_tf.groupBy("source").agg(F.sum("tf").alias("src_tokens"))
    corpus_total = src_tf.agg(F.sum("tf").alias("corpus_tokens"))
    corpus_tf = (
        src_tf.groupBy("term")
        .agg(F.sum("tf").alias("ctf"))
        .crossJoin(F.broadcast(corpus_total))
    )
    p = F.col("tf").cast("double") / F.col("src_tokens")
    q = F.col("ctf").cast("double") / F.col("corpus_tokens")
    return (
        src_tf.join(F.broadcast(src_tot), "source")
        .join(corpus_tf, "term")
        .groupBy("source", "src_tokens")
        .agg(F.round(F.sum(p * F.log2(p / q)), 6).alias("kl_bits"))
    )


@register(
    "q_distinct_ngram_ratio",
    oracle="""
WITH norm AS (
  SELECT doc_id, source,
         regexp_split_to_array(TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g')), ' ') AS t
  FROM documents
),
grams AS (
  SELECT source, array_to_string(t[p : p + 2], ' ') AS g
  FROM norm, UNNEST(generate_series(1, len(t) - 2)) AS u(p)
  WHERE len(t) >= 3
)
SELECT source,
       COUNT(*) AS total_3grams,
       COUNT(DISTINCT g) AS distinct_3grams,
       ROUND(1.0 * COUNT(DISTINCT g) / COUNT(*), 6) AS distinct_ratio
FROM grams
GROUP BY source
""",
    tags=("text", "diversity", "ngram"),
)
def q_distinct_ngram_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n diversity metric (n=3) per source: unique trigrams /
    total trigrams — the standard repetitiveness gauge for generated
    or scraped corpora (low ratio = templated text).

    Trigrams via the same whitespace-normalized tokenizer as the
    dedup family; one explode + one hash-agg per source with a
    distinct-agg (partial aggregation keeps the shuffle keyed on
    (source, gram), never materializing the corpus cross product).
    """
    tune_session(spark)
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ").alias("t"),
    ).where(F.size("t") >= 3)
    # Row form (standing rule, BASELINE §r13): explode the position
    # sequence and slice as a plain codegen projection — the former
    # transform(sequence, p -> array_join(slice(...))) evaluated the
    # join+slice through the interpreted lambda evaluator per gram.
    grams = toks.select(
        "source", "t", F.explode(F.expr("sequence(1, size(t) - 2)")).alias("p")
    ).select("source", F.expr("array_join(slice(t, p, 3), ' ')").alias("g"))
    return grams.groupBy("source").agg(
        F.count(F.lit(1)).alias("total_3grams"),
        F.countDistinct("g").alias("distinct_3grams"),
        F.round(F.countDistinct("g") * 1.0 / F.count(F.lit(1)), 6).alias("distinct_ratio"),
    )


@register(
    "q_bigram_next_token_probs",
    oracle="""
WITH toks AS (
  SELECT doc_id, p AS pos, t[p] AS tok, t[p + 1] AS nxt
  FROM (
    SELECT doc_id,
           regexp_split_to_array(TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g')), ' ') AS t
    FROM documents
  ), UNNEST(generate_series(1, len(t) - 1)) AS u(p)
),
counts AS (
  SELECT tok, nxt, COUNT(*) AS c FROM toks GROUP BY tok, nxt
),
ctx AS (
  SELECT tok, SUM(c) AS ctx_total,
         ROW_NUMBER() OVER (ORDER BY SUM(c) DESC, tok) AS ctx_rank
  FROM counts GROUP BY tok
),
top_ctx AS (SELECT tok, ctx_total FROM ctx WHERE ctx_rank <= 20),
ranked AS (
  SELECT c.tok, c.nxt, c.c, t.ctx_total,
         ROW_NUMBER() OVER (PARTITION BY c.tok ORDER BY c.c DESC, c.nxt) AS rnk
  FROM counts c JOIN top_ctx t ON c.tok = t.tok
)
SELECT tok AS context, nxt AS next_token,
       CAST(rnk AS INTEGER) AS rank,
       CAST(c AS BIGINT) AS n_bigram,
       ROUND(1.0 * c / ctx_total, 6) AS prob
FROM ranked WHERE rnk <= 3
""",
    tags=("text", "ngram-lm", "bigram"),
)
def q_bigram_next_token_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model head: the top-3 next tokens (with
    conditional probabilities) for the corpus' 20 most frequent
    contexts.

    The n-gram-LM building block as relational algebra: adjacent-token
    pairs from one explode (no self-join — position arithmetic inside
    the array), a bigram hash-agg, and ranking windows that run over
    the AGGREGATED count table. The top-20-context cut keeps output
    fixed at ≤60 rows at any corpus size; probabilities are ratios of
    exact integer counts.
    """
    tune_session(spark)
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ").alias("t")
    ).where(F.size("t") >= 2)
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " p -> struct(element_at(t, p) AS tok, element_at(t, p + 1) AS nxt))"
            )
        ).alias("bg")
    ).select(F.col("bg.tok").alias("tok"), F.col("bg.nxt").alias("nxt"))
    counts = pairs.groupBy("tok", "nxt").agg(F.count(F.lit(1)).alias("c"))
    ctx = counts.groupBy("tok").agg(F.sum("c").alias("ctx_total"))
    # Distributed partial top-k (TakeOrderedAndProject) — the context
    # table is vocab-sized, so a global rank window here would funnel
    # every distinct token through one task (r9 sf10 sweep finding).
    top_ctx = ctx.orderBy(F.desc("ctx_total"), "tok").limit(20)
    ranked = counts.join(F.broadcast(top_ctx), "tok").withColumn(
        "rnk", F.row_number().over(W.partitionBy("tok").orderBy(F.desc("c"), "nxt"))
    )
    return ranked.where(F.col("rnk") <= 3).select(
        F.col("tok").alias("context"),
        F.col("nxt").alias("next_token"),
        F.col("rnk").cast("integer").alias("rank"),
        F.col("c").cast("long").alias("n_bigram"),
        F.round(F.col("c") * 1.0 / F.col("ctx_total"), 6).alias("prob"),
    )


def _bpe_oracle(rounds: int) -> str:
    """Unrolled SQL replay of the BPE merge loop (see
    q_bpe_learned_merges for the contract)."""
    ctes = ["""
words AS (
  SELECT word, COUNT(*) AS cnt FROM (
    SELECT UNNEST(string_split(regexp_replace(LOWER(text), '[^a-z0-9]+', ' ', 'g'), ' ')) AS word
    FROM documents
  ) WHERE LENGTH(word) BETWEEN 2 AND 12
  GROUP BY word
),
vocab0 AS (
  SELECT ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS word_str, cnt
  FROM (SELECT word, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS rnk
        FROM words)
  WHERE rnk <= 200
)"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""
p{r} AS (
  SELECT arr[i] AS a, arr[i + 1] AS b, SUM(cnt) AS t
  FROM (SELECT string_split(TRIM(word_str), ' ') AS arr, cnt FROM vocab{r - 1}),
       UNNEST(generate_series(1, len(arr) - 1)) AS u(i)
  GROUP BY arr[i], arr[i + 1]
),
b{r} AS (SELECT a, b, t FROM p{r} ORDER BY t DESC, a, b LIMIT 1),
vocab{r} AS (
  SELECT replace(word_str, ' ' || b{r}.a || ' ' || b{r}.b || ' ',
                 ' ' || b{r}.a || b{r}.b || ' ') AS word_str, cnt
  FROM vocab{r - 1}, b{r}
)""")
    selects = [
        f"SELECT {r} AS round, a || '+' || b AS merge_pair, CAST(t AS BIGINT) AS pair_count FROM b{r}"
        for r in range(1, rounds + 1)
    ]
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


_BPE_ROUNDS = 3


@register(
    "q_bpe_learned_merges",
    oracle=_bpe_oracle(_BPE_ROUNDS),
    tags=("text", "bpe", "tokenizer"),
)
def q_bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEARN byte-pair-encoding merges from the corpus — 3 unrolled
    merge rounds, fully relational, nothing collected.

    The actual BPE training loop operates on the VOCAB (distinct
    words × counts), so the distributed work is the corpus→vocab
    reduction (one hash-agg over 100 TB); each round is then a pair
    count over the ≤200-word frame, an ORDER BY/LIMIT 1 argmax (ties
    broken by pair strings), and a broadcast merge applied via string
    replace. Merge semantics: leftmost non-overlapping occurrence
    (both engines' replace() — verified identical including the
    run-of-three case), counting overlapping pairs as standard BPE
    does; on runs this merges one fewer pair than strict
    left-greedy BPE, a deviation both engines share by construction.
    """
    tune_session(spark)
    d = read_table(spark, sf_dir, "documents")
    words = (
        d.select(
            F.explode(
                F.split(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "), " ")
            ).alias("word")
        )
        .where(F.length("word").between(2, 12))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from etl_project_spark.session import scoped_persist

    # Vocabulary is corpus-proportional (typos/numerals/hashes keep
    # adding distinct words), so the top-200 cut must be a
    # TakeOrderedAndProject (per-partition top-k + driver merge), not a
    # row_number() over an unpartitioned window that would funnel the
    # whole vocab through one sort task — same fix as q_zipf_exponent.
    # The 200-row frame then persists: each merge round AND each
    # round's output row re-reads it, and without the cache every
    # reference re-runs the full corpus→vocab reduction (measured ~7
    # corpus scans: 15 s at sf1 for a 3-round learn, vs one scan).
    vocab = scoped_persist(
        words.orderBy(F.desc("cnt"), "word")
        .limit(200)
        .select(
            F.concat(
                F.lit(" "), F.array_join(F.split("word", ""), " "), F.lit(" ")
            ).alias("word_str"),
            "cnt",
        )
    )
    merges = []
    for r in range(1, _BPE_ROUNDS + 1):
        arrd = vocab.select(F.split(F.trim("word_str"), " ").alias("arr"), "cnt")
        pairs = arrd.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(arr) - 1),"
                    " i -> struct(element_at(arr, i) AS a, element_at(arr, i + 1) AS b))"
                )
            ).alias("p"),
            "cnt",
        ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "cnt")
        # Examined r17, left alone: the unrolled rounds re-execute each
        # round's pair agg per consumer (7 (a,b) exchanges for 3
        # rounds), but every frame past the cached vocab cut is ≤ 200
        # rows — persisting+materializing per round was MEASURED SLOWER
        # (interleaved sf0.1 A/B: ~1.22 s lineage-recompute vs ~1.59 s
        # with per-round counts; the 4 extra driver jobs cost more than
        # the tiny re-aggs), and the vocab cut is scale-invariant so
        # the trade never flips with corpus size.
        best = (
            pairs.groupBy("a", "b")
            .agg(F.sum("cnt").alias("t"))
            .orderBy(F.desc("t"), "a", "b")
            .limit(1)
        )
        merges.append(
            best.select(
                F.lit(r).alias("round"),
                F.concat(F.col("a"), F.lit("+"), F.col("b")).alias("merge_pair"),
                F.col("t").cast("long").alias("pair_count"),
            )
        )
        vocab = vocab.crossJoin(F.broadcast(best)).select(
            F.expr(
                "replace(word_str, ' ' || a || ' ' || b || ' ', ' ' || a || b || ' ')"
            ).alias("word_str"),
            "cnt",
        )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


@register(
    "q_readability_scores",
    oracle="""
WITH m AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(LOWER(text), '[a-z0-9]+')) AS n_words,
         GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
         GREATEST(len(regexp_extract_all(LOWER(text), '[aeiouy]+')), 1) AS n_syllables
  FROM documents
  WHERE len(regexp_extract_all(LOWER(text), '[a-z0-9]+')) > 0
)
SELECT lang,
       COUNT(*) AS n_docs,
       ROUND(AVG(1.0 * n_words / n_sentences), 4) AS avg_words_per_sentence,
       ROUND(AVG(1.0 * n_syllables / n_words), 4) AS avg_syllables_per_word,
       ROUND(AVG(206.835 - 1.015 * (1.0 * n_words / n_sentences)
                 - 84.6 * (1.0 * n_syllables / n_words)), 4) AS avg_flesch
FROM m
GROUP BY lang
""",
    tags=("text", "readability"),
)
def q_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease profile per language: words/sentence and
    syllables/word from regex counting (vowel groups ≈ syllables, the
    standard cheap proxy), rolled up per language tag.

    Pure codegen regexp_extract_all counting — the corpus-quality
    readability gate with zero Python; the GREATEST(…,1) floors keep
    sentence-less fragments finite in both engines.
    """
    tune_session(spark)
    d = read_table(spark, sf_dir, "documents")
    n_words = F.size(F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0)))
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), F.lit(0))), F.lit(1)
    )
    n_syll = F.greatest(
        F.size(F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), F.lit(0))), F.lit(1)
    )
    m = d.select("lang", n_words.alias("w"), n_sent.alias("s"), n_syll.alias("y")).where(
        F.col("w") > 0
    )
    wps = F.col("w") * 1.0 / F.col("s")
    spw = F.col("y") * 1.0 / F.col("w")
    return m.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(wps), 4).alias("avg_words_per_sentence"),
        F.round(F.avg(spw), 4).alias("avg_syllables_per_word"),
        F.round(F.avg(206.835 - 1.015 * wps - 84.6 * spw), 4).alias("avg_flesch"),
    )


@register(
    "q_zipf_exponent",
    oracle=f"""
WITH counts AS ({_SQL_ALNUM_COUNTS_CTE}),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, term) AS rnk
  FROM counts
)
SELECT COUNT(*) AS n_types,
       ROUND(regr_slope(LN(CAST(c AS DOUBLE)), LN(CAST(rnk AS DOUBLE))), 6)
           AS zipf_slope,
       ROUND(regr_r2(LN(CAST(c AS DOUBLE)), LN(CAST(rnk AS DOUBLE))), 6)
           AS fit_r2
FROM ranked
WHERE rnk <= 1000
""",
    tags=("text", "zipf", "corpus-stats"),
)
def q_zipf_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus: OLS slope of log(frequency) on
    log(rank) over the top-1000 token types (healthy natural text sits
    near −1; templated or synthetic corpora deviate).

    Token counts hash-agg; the top-1000 cut is a distributed partial
    top-k (`limit` → TakeOrderedAndProject, per-partition heaps + one
    driver merge of 32×1000 rows) and ONLY the surviving ≤1000-row
    table enters the rank window — the r9 sf10 sweep caught the prior
    form ranking the ENTIRE vocab table through one window task before
    discarding all but 1000 rows (vocab grows with the corpus: typos,
    numerals, hashes). The fit is a single-pass regression aggregate —
    the corpus-health screen a pretraining pipeline runs per source.
    """
    tune_session(spark)
    counts = _alnum_term_counts(read_table(spark, sf_dir, "documents"))
    topk = counts.orderBy(F.desc("c"), "term").limit(1000)
    ranked = topk.select(
        "c", F.row_number().over(W.orderBy(F.desc("c"), "term")).alias("rnk")
    )
    lc = F.log(F.col("c").cast("double"))
    lr = F.log(F.col("rnk").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.regr_slope(lc, lr), 6).alias("zipf_slope"),
        F.round(F.regr_r2(lc, lr), 6).alias("fit_r2"),
    )


@register(
    "q_negative_sampling_distribution",
    oracle=f"""
WITH counts AS ({_SQL_ALNUM_COUNTS_CTE}),
powed AS (
  SELECT term, c, POW(CAST(c AS DOUBLE), 0.75) AS p75 FROM counts
),
tot AS (SELECT SUM(p75) AS z FROM powed),
ranked AS (
  SELECT term, c, p75, ROW_NUMBER() OVER (ORDER BY c DESC, term) AS rnk
  FROM powed
)
SELECT term, CAST(c AS BIGINT) AS n_occurrences,
       ROUND(p75 / z, 8) AS sample_prob
FROM ranked, tot
WHERE rnk <= 50
""",
    tags=("text", "negative-sampling", "word2vec"),
)
def q_negative_sampling_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec-style negative-sampling table: P(w) ∝ count^0.75
    (the smoothing that keeps rare words drawable), top-50 tokens with
    their normalized sampling probabilities.

    The normalizer Z sums the FULL vocab (a hash aggregate), but the
    top-50 cut is a distributed partial top-k (`limit` →
    TakeOrderedAndProject) so no vocab-scale row ever enters a window
    — the prior form ranked every type through one task (r9 sf10
    sweep finding, same fix as q_zipf_exponent). The pow/divide
    doubles are identical in both engines; the sum-order difference in
    Z sits ~1e-15 under the 8-decimal rounding.
    """
    tune_session(spark)
    counts = _alnum_term_counts(read_table(spark, sf_dir, "documents"))
    powed = counts.withColumn("p75", F.pow(F.col("c").cast("double"), 0.75))
    tot = powed.agg(F.sum("p75").alias("z"))
    ranked = powed.orderBy(F.desc("c"), "term").limit(50)
    return ranked.crossJoin(F.broadcast(tot)).select(
        "term",
        F.col("c").cast("long").alias("n_occurrences"),
        F.round(F.col("p75") / F.col("z"), 8).alias("sample_prob"),
    )


_PMI_MIN_PAIR = 5

_PMI_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(
           TRIM(regexp_replace(LOWER(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
  FROM documents WHERE TRIM(text) <> ''
),
uni AS (SELECT UNNEST(t) AS w FROM toks),
cx AS (SELECT w, COUNT(*) AS c FROM uni WHERE w <> '' GROUP BY w),
nu AS (SELECT SUM(c) AS n_u FROM cx),
bi AS (
  SELECT t[p] AS w1, t[p + 1] AS w2
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(p)
  WHERE t[p] <> '' AND t[p + 1] <> ''
),
cxy AS (SELECT w1, w2, COUNT(*) AS c_xy FROM bi GROUP BY w1, w2),
nb AS (SELECT SUM(c_xy) AS n_b FROM cxy),
scored AS (
  SELECT w1, w2, c_xy,
         CAST(c_xy AS DOUBLE) * n_u * n_u
           / (CAST(n_b AS DOUBLE) * a.c * b.c) AS ratio
  FROM cxy
  JOIN cx a ON a.w = w1
  JOIN cx b ON b.w = w2, nu, nb
  WHERE c_xy >= {_PMI_MIN_PAIR}
)
SELECT w1, w2, CAST(c_xy AS BIGINT) AS n_pair, ROUND(LN(ratio), 4) AS pmi
FROM scored
ORDER BY ratio DESC, w1, w2
LIMIT 20
"""


@register(
    "q_pmi_collocations",
    oracle=_PMI_ORACLE,
    tags=("text", "pmi", "collocation"),
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by pointwise mutual information over
    adjacent alphanumeric-token bigrams — the association measure a
    phrase-mining / tokenizer-vocabulary pipeline ranks merges with.

    PMI = ln(p(xy)/(p(x)p(y))) with p(xy) over the bigram total and
    p(x) over the unigram total. Determinism: the ranking key is the
    probability RATIO computed as one IEEE division over exact integer
    products (never the ln, whose last-ulp could reorder near-ties);
    ln is applied only to the already-ranked rows for display, rounded
    to 4 decimals. Plan shape: two token hash-aggs + a self-join of
    the bigram table against the (broadcastable) vocab table; the
    two totals are 1-row broadcasts. Bigrams come from one array
    transform per doc — no window over the token stream, so the heavy
    path is explode → hash-agg, the map-side-combinable shape.
    """
    d = _docs(spark, sf_dir).filter(F.length(F.trim("text")) > 0)
    toks = d.select(
        F.split(
            F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " ")), " "
        ).alias("t")
    )
    uni = toks.select(F.explode("t").alias("w")).filter(F.col("w") != "")
    cx = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    nu = cx.agg(F.sum("c").alias("n_u"))
    # size(t) >= 2 guard (round-8, ADVICE r7): a single-token doc makes
    # sequence(0, size(t)-2) = sequence(0, -1) = [0, -1], and t[p+1]
    # then reads out of bounds — a hard INVALID_ARRAY_INDEX error under
    # ANSI mode (default-on in Spark 4). The oracle's generate_series
    # is empty for the same doc, so filtering those docs out of the
    # bigram branch (ONLY here — unigram counts must keep them) is the
    # exact semantic twin. Current corpora happen to contain none; this
    # is the correctness guard, not a behavior change.
    bi = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "filter(transform(sequence(0, size(t) - 2), "
                    "p -> struct(t[p] AS w1, t[p + 1] AS w2)), "
                    "s -> s.w1 <> '' AND s.w2 <> '')"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    cxy = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    nb = cxy.agg(F.sum("c_xy").alias("n_b"))
    a = cx.alias("a")
    b2 = cx.alias("b")
    scored = (
        cxy.filter(F.col("c_xy") >= _PMI_MIN_PAIR)
        .join(F.broadcast(a), F.col("w1") == F.col("a.w"))
        .join(F.broadcast(b2), F.col("w2") == F.col("b.w"))
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            "c_xy",
            (
                F.col("c_xy").cast("double") * F.col("n_u") * F.col("n_u")
                / (F.col("n_b").cast("double") * F.col("a.c") * F.col("b.c"))
            ).alias("ratio"),
        )
    )
    return (
        scored.orderBy(F.desc("ratio"), "w1", "w2")
        .limit(20)
        .select(
            "w1",
            "w2",
            F.col("c_xy").cast("long").alias("n_pair"),
            F.round(F.log("ratio"), 4).alias("pmi"),
        )
    )


_RAKE_K = 5
_RAKE_MAX_PHRASE = 4
_RAKE_STOPS = ", ".join(f"'{w}'" for w in TX.STOPWORDS["en"])

_RAKE_ORACLE = f"""
WITH toks AS (
  SELECT source, doc_id, w, p,
         w IN ({_RAKE_STOPS}) AS is_stop
  FROM (
    SELECT source, doc_id,
           UNNEST(regexp_split_to_array(
             TRIM(regexp_replace(LOWER(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS w,
           generate_subscripts(regexp_split_to_array(
             TRIM(regexp_replace(LOWER(text), '[^a-z0-9]+', ' ', 'g')), ' '), 1) AS p
    FROM documents WHERE TRIM(text) <> ''
  ) WHERE w <> ''
),
content AS (
  SELECT source, doc_id, w, p,
         p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS grp
  FROM toks WHERE NOT is_stop
),
phr AS (
  SELECT source, doc_id, grp,
         COUNT(*) AS plen,
         STRING_AGG(w, ' ' ORDER BY p) AS phrase
  FROM content GROUP BY source, doc_id, grp
  HAVING COUNT(*) <= {_RAKE_MAX_PHRASE}
),
members AS (
  SELECT c.source, c.w, p2.plen
  FROM content c
  JOIN phr p2 ON p2.doc_id = c.doc_id AND p2.grp = c.grp
             AND p2.source = c.source
),
wstats AS (
  SELECT source, w, COUNT(*) AS freq, SUM(plen) AS deg
  FROM members GROUP BY source, w
),
pw AS (
  SELECT source, doc_id, grp, phrase,
         UNNEST(regexp_split_to_array(phrase, ' ')) AS w
  FROM phr
),
pscore AS (
  SELECT pw.source, pw.phrase, COUNT(DISTINCT (pw.doc_id, pw.grp)) AS n_occ,
         SUM(ws.deg) AS num, SUM(ws.freq) AS den
  FROM pw
  JOIN wstats ws ON ws.source = pw.source AND ws.w = pw.w
  GROUP BY pw.source, pw.phrase
),
ranked AS (
  SELECT source, phrase, n_occ,
         CAST(num AS DOUBLE) / den AS ratio,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY CAST(num AS DOUBLE) / den DESC, phrase) AS rn
  FROM pscore
)
SELECT source, rn AS rank, phrase, CAST(n_occ AS BIGINT) AS n_occurrences,
       ROUND(ratio, 4) AS score
FROM ranked WHERE rn <= {_RAKE_K}
"""


@register(
    "q_rake_keywords_per_source",
    oracle=_RAKE_ORACLE,
    tags=("text", "rake", "keywords"),
)
def q_rake_keywords_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction, top-5 phrases per source: split docs
    into candidate phrases at stopword/punctuation boundaries
    (gaps-and-islands over the token stream), score each phrase by the
    degree-to-frequency ratio of its member words (Rose et al.'s
    deg(w)/freq(w), aggregated as Σdeg/Σfreq so the score is ONE
    division over exact integer sums — a per-word float sum would be
    summation-order-dependent and unhashable).

    Plan shape: tokenization explodes once; phrase assembly is a
    window (islands by ``pos - row_number``) partitioned by doc — no
    cross-doc data motion; word stats and phrase scores are hash-aggs
    keyed by (source, word)/(source, phrase). The stopword list is the
    shared ``operators.text.STOPWORDS`` table, broadcast as a literal
    IN-list to both engines.
    """
    d = _docs(spark, sf_dir).filter(F.length(F.trim("text")) > 0)
    arr = F.split(
        F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " ")), " "
    )
    toks = (
        d.select("source", "doc_id", F.posexplode(arr).alias("p0", "w"))
        .filter(F.col("w") != "")
        .select(
            "source",
            "doc_id",
            "w",
            (F.col("p0") + 1).alias("p"),
            F.col("w").isin(*TX.STOPWORDS["en"]).alias("is_stop"),
        )
    )
    content = toks.filter(~F.col("is_stop")).withColumn(
        "grp",
        F.col("p")
        - F.row_number().over(W.partitionBy("doc_id").orderBy("p")),
    )
    # r18: REVERTED the r17 islands+phrase persists (VERDICT r17 #1 —
    # the round's worst regression: driver 1.9→3.5 s, clean-window
    # cold 1.9→2.75 s). The r17 A/B was already neutral; two
    # cache-materialization jobs to save one window sort above a
    # runtime-reused exchange is exactly the losing side of the
    # persist boundary rule (OPTIMIZATION_r17.md): runtime
    # ReuseExchange dedups the hash(doc_id) exchange, so the residual
    # recompute per consumer is one sort — cheaper than the cache
    # builds. (A/B r18: interleaved sf0.1 warm medians neutral —
    # 2.31 revert vs 2.18 persists with a downward within-session
    # drift; the regression is the COLD path's two extra cache jobs,
    # which the driver's one-shot bench times.)
    phr = (
        content.groupBy("source", "doc_id", "grp")
        .agg(
            F.count(F.lit(1)).alias("plen"),
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(p, w))),"
                " s -> s.w), ' ')"
            ).alias("phrase"),
        )
        .filter(F.col("plen") <= _RAKE_MAX_PHRASE)
    )
    members = content.join(
        phr.select("source", "doc_id", "grp", "plen"),
        ["source", "doc_id", "grp"],
    ).select("source", "w", "plen")
    wstats = members.groupBy("source", "w").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    )
    pwords = phr.select(
        "source",
        "doc_id",
        "grp",
        "phrase",
        F.explode(F.split("phrase", " ")).alias("w"),
    )
    pscore = (
        pwords.join(wstats, ["source", "w"])
        .groupBy("source", "phrase")
        .agg(
            F.countDistinct("doc_id", "grp").alias("n_occ"),
            F.sum("deg").alias("num"),
            F.sum("freq").alias("den"),
        )
    )
    ratio = F.col("num").cast("double") / F.col("den")
    ranked = pscore.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("source").orderBy(ratio.desc(), "phrase")
        ),
    ).filter(F.col("rn") <= _RAKE_K)
    return ranked.select(
        "source",
        F.col("rn").alias("rank"),
        "phrase",
        F.col("n_occ").cast("long").alias("n_occurrences"),
        F.round(ratio, 4).alias("score"),
    )


_MIX_ORACLE = f"""
WITH kl AS ({_KL_ORACLE}),
scaled AS (
  SELECT source, kl_bits,
         CAST(ROUND(EXP(-kl_bits) * 1e12) AS BIGINT) AS e
  FROM kl
)
SELECT source, kl_bits,
       ROUND(CAST(e AS DOUBLE) / SUM(e) OVER (), 6) AS mixture_weight
FROM scaled
"""


@register(
    "q_domain_mixture_weights",
    oracle=_MIX_ORACLE,
    tags=("text", "mixture", "doremi"),
)
def q_domain_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain mixture weights: softmax of the NEGATIVE
    per-source KL divergence from the corpus token distribution —
    sources that drift from the corpus get down-weighted, the
    re-mixing step a pretraining curriculum runs after measuring
    domain shift (Xie et al. 2023 use proxy-model losses; the KL here
    is the proxy this engine can compute exactly).

    Determinism (round-8, ADVICE r7): the softmax runs on the ROUNDED
    kl_bits (6 decimals) that the KL query itself is hash-checked on,
    so both engines exponentiate bit-identical inputs — and the
    normalizer follows the same exact-integer-sum discipline as the
    KMV/HLL/CMS sketches: each ``exp(-kl)`` is scaled to an integer
    (×1e12, round) BEFORE summing, so the sum is order-independent by
    construction instead of relying on 6-decimal rounding to absorb
    ~1e-16 float-reordering noise. The weight is then ONE IEEE
    division of two exact integers. Plan shape: everything beyond the
    KL aggregate is a window over one row per source.
    """
    kl = q_source_token_kl(spark, sf_dir)
    e = F.expr("CAST(ROUND(EXP(-kl_bits) * 1e12) AS BIGINT)")
    scaled = kl.select("source", "kl_bits", e.alias("e"))
    z = F.sum("e").over(W.partitionBy())
    return scaled.select(
        "source",
        "kl_bits",
        F.round(F.col("e").cast("double") / z, 6).alias("mixture_weight"),
    )


# -- sequence packing (training-batch assembly) -----------------------------

#: Context-window capacity for the packing family. Small enough that
#: the driver-scale corpus produces multi-bin shards, large enough
#: that typical documents co-pack.
_PACK_CAP = 1024

_PACK_CTE = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, source, {_SQL_TOKEN_COUNT} AS n,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
), pack AS (
  SELECT doc_id, source, n, rn,
         0 AS seq_idx, 0 AS seq_offset, n AS fill
  FROM toks WHERE rn = 1
  UNION ALL
  SELECT t.doc_id, t.source, t.n, t.rn,
         CASE WHEN p.fill > 0 AND p.fill + t.n > {_PACK_CAP}
              THEN p.seq_idx + 1 ELSE p.seq_idx END,
         CASE WHEN p.fill > 0 AND p.fill + t.n > {_PACK_CAP}
              THEN 0 ELSE p.fill END,
         CASE WHEN p.fill > 0 AND p.fill + t.n > {_PACK_CAP}
              THEN t.n ELSE p.fill + t.n END
  FROM toks t JOIN pack p ON t.source = p.source AND t.rn = p.rn + 1
)
"""


@register(
    "q_pack_sequences_nextfit",
    oracle=_PACK_CTE
    + """
SELECT doc_id, source, CAST(n AS INTEGER) AS n_tokens,
       CAST(seq_idx AS INTEGER) AS seq_idx,
       CAST(seq_offset AS INTEGER) AS seq_offset
FROM pack
""",
    tags=("text", "packing", "llm", "grouped-map"),
)
def q_pack_sequences_nextfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: greedy NEXT-FIT of documents into fixed
    1024-token context windows, per source shard — the
    training-batch-assembly op that turns a deduped corpus into dense
    LM examples (padding waste is the thing being minimized; the audit
    twin is :func:`q_pack_sequences_stats`).

    Packing is inherently a sequential fold (each placement depends on
    the running fill), so it CANNOT be a window expression — but it is
    sequential only WITHIN a shard, and shards are independent: the
    industry shape packs within loader shards, never globally. So the
    plan is groupBy(source).applyInPandas with a numpy greedy pass per
    shard — one Arrow round-trip per shard and zero shuffles beyond
    the one grouping exchange; at 100 TB the shard key is
    (source, day-bucket, ...) sized so a shard's (doc_id, n_tokens)
    pairs fit one executor, which they do at ~12 bytes/doc.

    Determinism: docs pack in doc_id order within a shard; a document
    longer than the capacity occupies a bin of its own (the fill>0
    guard — it never merges into a prior bin, and the next document
    always opens fresh). The oracle replays the exact fold as a
    per-source recursive CTE, so every (doc -> bin, offset) assignment
    is hash-checked, not just summary counts.
    """
    tune_session(spark)
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", TX.token_count(F.col("text")).alias("n_tokens")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        n = pdf["n_tokens"].to_numpy()
        seq_idx = np.empty(len(n), dtype=np.int32)
        seq_off = np.empty(len(n), dtype=np.int32)
        b, fill = 0, 0
        for i, t in enumerate(n):
            if fill > 0 and fill + t > _PACK_CAP:
                b += 1
                fill = 0
            seq_idx[i] = b
            seq_off[i] = fill
            fill += t
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                "n_tokens": pdf["n_tokens"].astype("int32"),
                "seq_idx": seq_idx,
                "seq_offset": seq_off,
            }
        )

    return docs.groupBy("source").applyInPandas(
        pack,
        schema="doc_id bigint, source string, n_tokens int, seq_idx int, seq_offset int",
    )


@register(
    "q_pack_sequences_stats",
    oracle=_PACK_CTE
    + f"""
SELECT source, CAST(seq_idx AS INTEGER) AS seq_idx,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       ROUND(LEAST(SUM(n), {_PACK_CAP}) / {_PACK_CAP}.0, 4) AS fill_ratio
FROM pack GROUP BY source, seq_idx
""",
    tags=("text", "packing", "llm", "audit"),
)
def q_pack_sequences_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency audit: per (shard, window) document count,
    token count, and fill ratio (oversized single-doc bins clamp to
    1.0 — they waste nothing; what they overflow is a truncation
    decision downstream of packing). The mean fill ratio IS the
    padding-efficiency number a data team watches when choosing the
    window size; a plain rollup over the packing output, so shuffle is
    one hash agg over (source, seq_idx)."""
    packed = q_pack_sequences_nextfit(spark, sf_dir)
    return packed.groupBy("source", "seq_idx").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.round(
            F.least(F.sum("n_tokens"), F.lit(_PACK_CAP)) / float(_PACK_CAP), 4
        ).alias("fill_ratio"),
    )


# --------------------------------------------------------------------------
# BPE vocabulary APPLY — the serving half of the tokenizer family
# (q_bpe_learned_merges trains merges; this encodes with a SHIPPED
# merge table, the way a fixed tokenizer rides along with a model).
# The merge table is a fixed ranked literal shared verbatim with the
# oracle, which replays the full greedy loop as a recursive CTE: each
# round picks the lowest-rank adjacent pair present and merges its
# occurrences left-to-right via a list fold whose replace-last rule
# is exactly the single-pair non-overlapping scan. Pure string/int
# ops — no float discipline needed; any divergence in pair priority,
# merge order, or cascade (merged tokens re-matching later rounds)
# flips the hash. Scale shape: vocab apply is a stateless map with
# the table in the task closure — at 100 TB it runs over every
# document row with zero shuffles; the top-300-words frame here
# exists only to give the oracle a bounded replay set.
# --------------------------------------------------------------------------
_BPE_APPLY_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("an", "d"), ("in", "g"), ("e", "n"),
    ("o", "u"), ("s", "t"), ("a", "t"), ("e", "s"), ("o", "r"),
    ("t", "i"), ("a", "r"), ("t", "o"), ("n", "d"), ("c", "o"),
    ("e", "d"), ("l", "l"), ("s", "e"), ("a", "l"),
]
_BPE_APPLY_TOPW = 300


def _bpe_apply_oracle() -> str:
    mvals = ", ".join(
        f"('{a}', '{b}', {i + 1})" for i, (a, b) in enumerate(_BPE_APPLY_MERGES)
    )
    return f"""
WITH RECURSIVE merges(a, b, rnk) AS (
  SELECT * FROM (VALUES {mvals})
), words AS (
  SELECT word, c FROM (
    SELECT word, COUNT(*) AS c FROM (
      SELECT UNNEST(regexp_extract_all(LOWER(text), '[a-z]+')) AS word
      FROM documents
    ) WHERE LEN(word) BETWEEN 2 AND 12
    GROUP BY word
    ORDER BY c DESC, word
    LIMIT {_BPE_APPLY_TOPW}
  )
), enc AS (
  SELECT word, 0 AS step, regexp_extract_all(word, '.') AS toks FROM words
  UNION ALL
  SELECT word, step + 1,
    LIST_REDUCE(
      LIST_TRANSFORM(toks, x -> [x]),
      (acc, x) -> CASE
        WHEN acc[-1] = best.a AND x[1] = best.b
          THEN list_append(acc[1:-2], best.a || best.b)
        ELSE list_append(acc, x[1]) END)
  FROM (
    SELECT e.word, e.step, e.toks,
           (SELECT m.rnk
            FROM merges m,
                 UNNEST(generate_series(1, LEN(e.toks) - 1)) g(i)
            WHERE m.a = e.toks[CAST(i AS INTEGER)]
              AND m.b = e.toks[CAST(i AS INTEGER) + 1]
            ORDER BY m.rnk LIMIT 1) AS brnk
    FROM enc e WHERE e.step < 15
  ) e2
  JOIN merges best ON best.rnk = e2.brnk
)
SELECT word, n_count, n_pieces, pieces FROM (
  SELECT w.word, CAST(w.c AS BIGINT) AS n_count,
         CAST(LEN(e.toks) AS INTEGER) AS n_pieces,
         ARRAY_TO_STRING(e.toks, '|') AS pieces,
         ROW_NUMBER() OVER (PARTITION BY e.word ORDER BY e.step DESC) AS rn
  FROM enc e JOIN words w ON w.word = e.word
) WHERE rn = 1
"""


@register(
    "q_bpe_encode_words",
    oracle=_bpe_apply_oracle(),
    tags=("text", "bpe", "tokenizer", "llm"),
)
def q_bpe_encode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus's 300 most frequent words with a fixed
    24-merge BPE table: per word, the piece count and the pieces
    themselves ('|'-joined).

    The greedy loop (lowest-rank adjacent pair, merge occurrences
    left-to-right, repeat until no pair applies) runs in an Arrow
    batch over the bounded word frame; the oracle replays it as a
    recursive CTE over the identical literal table, so the cascade
    behavior — merged pieces like 'an' re-matching ('an','d') in a
    later round — is hash-checked, not just the final counts.
    """
    d = _docs(spark, sf_dir)
    words = (
        d.select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("word")
        )
        .filter((F.length("word") >= 2) & (F.length("word") <= 12))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "word")
        .limit(_BPE_APPLY_TOPW)
    )
    rank = {pair: i + 1 for i, pair in enumerate(_BPE_APPLY_MERGES)}
    by_rank = dict(enumerate(_BPE_APPLY_MERGES, start=1))

    def encode(batches):
        for pdf in batches:
            pieces, npieces = [], []
            for w in pdf["word"]:
                toks = list(w)
                while True:
                    best = None
                    for i in range(len(toks) - 1):
                        r = rank.get((toks[i], toks[i + 1]))
                        if r is not None and (best is None or r < best):
                            best = r
                    if best is None:
                        break
                    a, b = by_rank[best]
                    out = [toks[0]]
                    for t in toks[1:]:
                        if out[-1] == a and t == b:
                            out[-1] = a + b
                        else:
                            out.append(t)
                    toks = out
                pieces.append("|".join(toks))
                npieces.append(len(toks))
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "n_count": pdf["c"].astype("int64"),
                    "n_pieces": np.asarray(npieces, dtype="int32"),
                    "pieces": pieces,
                }
            )

    return words.mapInPandas(
        encode, schema="word string, n_count long, n_pieces int, pieces string"
    )


@register(
    "q_bigram_cross_entropy",
    oracle="""
WITH norm AS (
  SELECT doc_id,
         regexp_split_to_array(TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g')), ' ') AS t
  FROM documents WHERE LENGTH(TRIM(text)) > 0
), bi AS (
  SELECT doc_id, t[CAST(i AS INTEGER)] AS w1, t[CAST(i AS INTEGER) + 1] AS w2
  FROM norm, UNNEST(generate_series(1, len(t) - 1)) u(i)
  WHERE len(t) >= 2
), c2 AS (
  SELECT w1, w2, COUNT(*) AS n2 FROM bi GROUP BY w1, w2
), c1 AS (
  SELECT w1, COUNT(*) AS n1 FROM bi GROUP BY w1
), vocab AS (
  SELECT COUNT(DISTINCT w) AS v FROM (
    SELECT UNNEST(t) AS w FROM norm
  )
)
SELECT b.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(-SUM(LN((c2.n2 + CAST(1 AS DOUBLE)) / (c1.n1 + vocab.v)))
             / COUNT(*), 6) AS ce_nats
FROM bi b
JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
JOIN c1 ON c1.w1 = b.w1
CROSS JOIN vocab
GROUP BY b.doc_id
""",
    tags=("text", "lm", "perplexity", "quality", "llm"),
)
def q_bigram_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under the corpus BIGRAM model with
    add-one smoothing — the step up from `q_unigram_cross_entropy`
    toward CCNet's KenLM perplexity filter: a document of real
    sentences scores low, shuffled word soup scores high even when
    its unigram mix is normal (the unigram model cannot tell).

    Scale shape: the bigram stream is built from the token ARRAY with
    `transform(sequence(...))` — in-codegen, no positional window —
    and feeds both the model branch (two hash aggregates; the "model"
    stays a DataFrame) and the scoring branch (two 8-byte-ish hash
    joins + one per-doc aggregate). The vocabulary size is a 1-row
    broadcast. Smoothed probabilities are exact-integer ratios cast
    to double, so the only cross-engine float play is ln (sub-ulp)
    summed per doc — far inside the 6-decimal snap.
    """
    d = _docs(spark, sf_dir)
    toks = d.filter(F.length(F.trim("text")) > 0).select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("t")
    )
    bi = (
        toks.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> struct(t[i - 1] AS w1, t[i] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    c2 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    vocab = toks.select(F.explode("t").alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    scored = (
        bi.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log(
                (F.col("n2") + F.lit(1.0)) / (F.col("n1") + F.col("v"))
            ).alias("lnp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(-F.sum("lnp") / F.count(F.lit(1)), 6).alias("ce_nats"),
    )
