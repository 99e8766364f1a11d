"""Corpus-quality gates a pretraining pipeline runs before training:
global boilerplate scrub, intra-document repetition gates, PII
redaction, and per-source length-distribution profiling.

All four are pure relational plans (explode + hash aggregate + equi-
join — whole-stage codegen, no Python in the hot path) and all four
are oracle-checked. Shuffle keys are hashed grams / doc ids — skew-
free by hashing; nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_project_spark.catalog import read_table
from etl_project_spark.plans.registry import register
from etl_project_spark.session import tune_session

#: Word n-grams, whitespace-normalized — the same normalization the
#: dedup family uses (collapse \s+ runs, trim, lowercase).
_NORM = "TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g'))"


def chars_per_token_score(n_chars: Column, text: Column) -> Column:
    """Chars-per-token density score — THE per-doc quality proxy shared
    by `q_per_domain_quantile_filter` and the composed curation
    pipeline (a formula change here moves both plans and both oracles
    together instead of letting them drift)."""
    n_tokens = F.size(F.split(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")), " "))
    return F.lit(1.0) * n_chars / n_tokens


@register(
    "q_boilerplate_ngram_scrub",
    oracle=f"""
WITH norm AS (
  SELECT doc_id, regexp_split_to_array({_NORM}, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, array_to_string(t[p : p + 3], ' ') AS g
  FROM norm, UNNEST(generate_series(1, GREATEST(len(t) - 3, 1))) AS u(p)
), df AS (
  SELECT g, COUNT(DISTINCT doc_id) AS docs FROM grams GROUP BY g
)
SELECT grams.doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN df.docs >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boiler,
       ROUND(1.0 * SUM(CASE WHEN df.docs >= 3 THEN 1 ELSE 0 END)
             / COUNT(*), 6) AS boiler_frac
FROM grams JOIN df ON grams.g = df.g
GROUP BY grams.doc_id
""",
    tags=("quality", "boilerplate", "text"),
)
def q_boilerplate_ngram_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global boilerplate detection, C4-style: a word 4-gram appearing
    in ≥ 3 distinct documents is boilerplate; score each document by
    how much of it is made of such spans (the scrub step then drops or
    masks them — the score IS the decision input).

    Plan shape at 100 TB: grams are xxhash64'd to 8-byte keys before
    the doc-frequency aggregate and the join back (shuffles never
    carry gram strings — same discipline as benchmark contamination);
    doc-frequency is one hash aggregate with map-side partial combine;
    the scoring join is an equi-join on the hashed gram. The oracle
    replays it with string grams — collision odds at 64-bit are far
    below rounding granularity.
    """
    tune_session(spark)
    d = read_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
    grams = (
        d.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(size(toks) - 3, 1)), "
                    "p -> concat_ws(' ', slice(toks, p, 4)))"
                )
            ).alias("_gram"),
        )
        .select("doc_id", F.xxhash64("_gram").alias("_g"))
    )
    # Examined r17, left alone: grams feeds the df aggregate AND the
    # scoring join (tokenize runs twice), but keying+persisting+
    # materializing the gram rows measured no better across interleaved
    # cross-checkout sessions (old 1.87-2.04 s vs new 2.18-2.46 s on
    # mixed-quality host windows) — the raw-gram repartition plus the
    # cache job outweigh the duplicated codegen tokenize at sf0.1, the
    # same boundary q_sparse_cosine_doc_pairs measured more cleanly.
    df_counts = (
        grams.select("_g", "doc_id")
        .distinct()
        .groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_docs"))
    )
    return (
        grams.join(df_counts, "_g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("_docs") >= 3).cast("long")).alias("n_boiler"),
            F.round(
                F.sum((F.col("_docs") >= 3).cast("long")) / F.count(F.lit(1)), 6
            ).alias("boiler_frac"),
        )
    )


@register(
    "q_doc_repetition_gates",
    oracle=f"""
WITH norm AS (
  SELECT doc_id, regexp_split_to_array({_NORM}, ' ') AS t FROM documents
), toks AS (
  SELECT doc_id, UNNEST(t) AS tok FROM norm
), tok_stats AS (
  SELECT doc_id, SUM(cnt) AS n_tokens,
         MAX(cnt) AS top_cnt
  FROM (SELECT doc_id, tok, COUNT(*) AS cnt FROM toks GROUP BY doc_id, tok)
  GROUP BY doc_id
), grams AS (
  SELECT doc_id, array_to_string(t[p : p + 2], ' ') AS g
  FROM norm, UNNEST(generate_series(1, GREATEST(len(t) - 2, 1))) AS u(p)
), gram_stats AS (
  SELECT doc_id, COUNT(*) AS n_grams,
         COUNT(DISTINCT g) AS n_distinct
  FROM grams GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(t.n_tokens AS BIGINT) AS n_tokens,
       ROUND(1.0 * t.top_cnt / t.n_tokens, 6) AS top_token_frac,
       CAST(g.n_grams AS BIGINT) AS n_grams,
       ROUND(1.0 - 1.0 * g.n_distinct / g.n_grams, 6) AS dup_gram_frac
FROM tok_stats t JOIN gram_stats g ON t.doc_id = g.doc_id
""",
    tags=("quality", "repetition", "text"),
)
def q_doc_repetition_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition gates (the Gopher repetition filters):
    most-frequent-token fraction and duplicate word-3-gram fraction per
    document — the standard signals for machine-generated or looping
    text.

    All per-document work: explode + two hash aggregates keyed by
    doc_id, re-joined on doc_id. Map-side combine collapses each
    partition before the shuffle; no global state, so the plan is
    embarrassingly document-parallel at any corpus size.
    """
    tune_session(spark)
    d = read_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
    tok_rows = d.select("doc_id", F.explode(toks).alias("tok"))
    tok_stats = (
        tok_rows.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.max("cnt").alias("top_cnt"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("top_cnt") / F.col("n_tokens"), 6).alias(
                "top_token_frac"
            ),
        )
    )
    grams = d.select("doc_id", toks.alias("toks")).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(toks) - 2, 1)), "
                "p -> concat_ws(' ', slice(toks, p, 3)))"
            )
        ).alias("g"),
    )
    gram_stats = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count_distinct("g").alias("n_distinct"),
    )
    return tok_stats.join(gram_stats, "doc_id").select(
        "doc_id",
        "n_tokens",
        "top_token_frac",
        "n_grams",
        F.round(1.0 - F.col("n_distinct") / F.col("n_grams"), 6).alias(
            "dup_gram_frac"
        ),
    )


_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_URL_RE = r"https?://[^ ]+"


@register(
    "q_pii_scrub_stats",
    oracle=f"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || doc_id || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' see https://ex.org/page' || doc_id ELSE '' END AS t
  FROM documents
), scrub AS (
  SELECT doc_id, t,
         regexp_replace(regexp_replace(t, '{_URL_RE}', '<URL>', 'g'),
                        '{_EMAIL_RE}', '<EMAIL>', 'g') AS clean
  FROM aug
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(t, '{_URL_RE}')) AS INTEGER) AS n_urls,
       CAST(LENGTH(t) AS BIGINT) AS len_before,
       CAST(LENGTH(clean) AS BIGINT) AS len_after
FROM scrub
""",
    tags=("quality", "pii", "text"),
)
def q_pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction stage: count and mask emails/URLs per document.

    The corpus has no natural PII, so the query PLANTS deterministic
    contact lines in-plan (doc_id arithmetic both engines replay — the
    same non-vacuity device as the embedding near-dup twins), then runs
    the REAL regex scrub over the result: ``regexp_count`` for the
    counts and nested ``regexp_replace`` for the masking, all
    JVM-side codegen. URL masking runs first so an address inside a
    URL can't be double-masked. The oracle hash-checks counts AND
    masked lengths, so a regex-semantics divergence (greediness, char
    classes) between engines would surface as a value mismatch.
    """
    tune_session(spark)
    d = read_table(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" see https://ex.org/page"),
                    F.col("doc_id").cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(F.col("t"), _URL_RE, "<URL>"), _EMAIL_RE, "<EMAIL>"
    )
    return aug.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(_URL_RE)).alias("n_urls"),
        F.length("t").cast("long").alias("len_before"),
        F.length(clean).cast("long").alias("len_after"),
    )


@register(
    "q_top_tokens_per_source",
    oracle=f"""
WITH norm AS (
  SELECT source, regexp_split_to_array({_NORM}, ' ') AS t FROM documents
), toks AS (
  SELECT source, UNNEST(t) AS tok FROM norm
), counts AS (
  SELECT source, tok, COUNT(*) AS cnt FROM toks GROUP BY source, tok
), ranked AS (
  SELECT source, tok, cnt,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY cnt DESC, tok) AS rnk
  FROM counts
)
SELECT source, tok, CAST(cnt AS BIGINT) AS cnt, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 5
""",
    tags=("quality", "heavy-hitters", "text"),
)
def q_top_tokens_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters: top-5 tokens per source (count desc, token asc
    ties) — the vocabulary-drift / boilerplate-vocabulary profile a
    corpus dashboard tracks per ingestion source.

    Explode → per-(source, token) hash aggregate with map-side combine
    → per-source window over the AGGREGATED counts (cardinality =
    vocabulary size, not token occurrences, so the window input is
    small at any corpus scale). A 100 TB note: when per-source
    vocabularies are huge, replace row_number with a per-partition
    top-k heap (orderBy+limit per group via aggregate), but the
    aggregate-then-rank shape already bounds the window side.
    """
    from pyspark.sql import Window as W

    tune_session(spark)
    d = read_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
    counts = (
        d.select("source", F.explode(toks).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = W.partitionBy("source").orderBy(F.col("cnt").desc(), F.col("tok"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("source", "tok", "cnt", "rnk")
    )


@register(
    "q_vocab_growth_curve",
    oracle=f"""
WITH norm AS (
  SELECT doc_id, regexp_split_to_array({_NORM}, ' ') AS t FROM documents
), toks AS (
  SELECT doc_id, UNNEST(t) AS tok FROM norm
), first_seen AS (
  SELECT tok, MIN(doc_id) // 100 AS fb FROM toks GROUP BY tok
), newv AS (
  SELECT fb AS bucket, COUNT(*) AS new_tokens FROM first_seen GROUP BY fb
), tokc AS (
  SELECT doc_id // 100 AS bucket, COUNT(*) AS n FROM toks GROUP BY 1
)
SELECT t.bucket,
       CAST(SUM(t.n) OVER w AS BIGINT) AS cum_tokens,
       CAST(SUM(COALESCE(v.new_tokens, 0)) OVER w AS BIGINT) AS cum_vocab
FROM tokc t LEFT JOIN newv v ON t.bucket = v.bucket
WINDOW w AS (ORDER BY t.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    tags=("quality", "vocab", "text"),
)
def q_vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps'-law) curve: cumulative distinct tokens
    vs cumulative token count over the corpus in ingestion order,
    bucketed per 100 docs — the profile that sizes tokenizer
    vocabularies and detects corpus staleness (a flattening curve
    means new data adds no new language).

    Cumulative-distinct is NOT computed with a running set: each
    token's FIRST bucket comes from one min-aggregate (the standard
    distributed first-occurrence trick), new-vocabulary-per-bucket is
    a count over that, and the cumulative curve runs over BUCKET rows.
    The bucket table is n_docs/100 — 100× smaller than the corpus but
    still corpus-proportional, so the cumulative uses the two-phase
    bucketed prefix sum (`two_phase.bucketed_prefix_sum`) rather than
    one unpartitioned window: at 1B documents that window would drag
    10M rows through a single task (r9 sweep audit; raw token rows
    never enter a window in either form).
    """
    from etl_project_spark.plans.two_phase import bucketed_prefix_sum

    tune_session(spark)
    d = read_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
    tok_rows = d.select("doc_id", F.explode(toks).alias("tok"))
    first_seen = tok_rows.groupBy("tok").agg(
        (F.min("doc_id") / 100).cast("long").alias("fb")
    )
    newv = first_seen.groupBy(F.col("fb").alias("bucket")).agg(
        F.count(F.lit(1)).alias("new_tokens")
    )
    tokc = tok_rows.groupBy((F.col("doc_id") / 100).cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )
    joined = tokc.join(newv, "bucket", "left").select(
        "bucket", "n", F.coalesce(F.col("new_tokens"), F.lit(0)).alias("nv")
    )
    cum = bucketed_prefix_sum(joined, "bucket", "n", out_col="_ct")
    cum = bucketed_prefix_sum(cum, "bucket", "nv", out_col="_cv")
    return cum.select(
        "bucket",
        (F.col("_ct") + F.col("n")).alias("cum_tokens"),
        (F.col("_cv") + F.col("nv")).alias("cum_vocab"),
    )


@register(
    "q_token_packing_chunks",
    oracle=f"""
WITH norm AS (
  SELECT doc_id, len(regexp_split_to_array({_NORM}, ' ')) AS n FROM documents
), offs AS (
  SELECT doc_id, n,
         CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS off
  FROM norm
), spans AS (
  SELECT doc_id, n, off, c AS chunk,
         LEAST((c + 1) * 2048, off + n) - GREATEST(c * 2048, off) AS in_chunk
  FROM offs,
       UNNEST(generate_series(off // 2048, (off + n - 1) // 2048)) u(c)
)
SELECT chunk,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(in_chunk) AS BIGINT) AS n_tokens
FROM spans GROUP BY chunk
""",
    tags=("quality", "packing", "text"),
)
def q_token_packing_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the pretraining batcher's view: concatenate
    all documents in corpus order and cut the token stream into fixed
    2048-token training chunks; report how many documents each chunk
    touches and how many tokens it holds (all 2048 except the tail).

    The document→chunk span mapping is pure arithmetic once each doc
    knows its global token OFFSET — computed with the two-phase
    bucketed prefix sum (`two_phase.bucketed_prefix_sum`): per-doc_id-
    bucket subtotals, a cumulative over the ≤1024-row bucket table,
    and an in-bucket exclusive window partitioned by bucket, so the
    document stream never funnels through one task (the global-window
    form did). Then ``sequence(first_chunk, last_chunk)`` + explode
    materializes each doc's chunk span.
    """
    from etl_project_spark.plans.two_phase import bucketed_prefix_sum

    tune_session(spark)
    d = read_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
    sized = d.select("doc_id", F.size(toks).alias("n"))
    offs = bucketed_prefix_sum(sized, "doc_id", "n", out_col="off")
    spans = offs.select(
        "doc_id",
        "n",
        "off",
        F.explode(
            F.sequence(
                (F.col("off") / 2048).cast("long"),
                ((F.col("off") + F.col("n") - 1) / 2048).cast("long"),
            )
        ).alias("chunk"),
    ).select(
        "chunk",
        (
            F.least((F.col("chunk") + 1) * 2048, F.col("off") + F.col("n"))
            - F.greatest(F.col("chunk") * 2048, F.col("off"))
        ).alias("in_chunk"),
    )
    return spans.groupBy("chunk").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("in_chunk").alias("n_tokens"),
    )


@register(
    "q_source_length_quantiles",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(quantile_cont(n_chars, 0.25), 4) AS p25,
       ROUND(quantile_cont(n_chars, 0.5), 4) AS p50,
       ROUND(quantile_cont(n_chars, 0.75), 4) AS p75,
       ROUND(AVG(n_chars), 4) AS avg_chars
FROM documents GROUP BY source
""",
    tags=("quality", "profiling", "quantiles"),
)
def q_source_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length distribution: exact interpolated
    quartiles + mean — the profiling step behind length-based quality
    gates and mixture rebalancing.

    Spark's ``percentile`` and DuckDB's ``quantile_cont`` share the
    same definition (linear interpolation at rank ``p·(n-1)``), so the
    exact quantile is oracle-checkable — unlike ``approx_percentile``,
    whose t-digest result depends on partitioning and can't be
    hash-pinned. Exact percentile sorts per group; at 100 TB switch
    the GATE to approx_percentile and keep this exact form for audits
    (the gate's inputs tolerate sketch error; the audit's don't).
    """
    tune_session(spark)
    d = read_table(spark, sf_dir, "documents")
    pct = F.expr("percentile(n_chars, array(0.25D, 0.5D, 0.75D))")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(pct[0], 4).alias("p25"),
        F.round(pct[1], 4).alias("p50"),
        F.round(pct[2], 4).alias("p75"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@register(
    "q_quality_weighted_sample",
    oracle="""
WITH scored AS (
  SELECT doc_id, source,
         GREATEST(0.05, LEAST(1.0, n_chars / 2000.0)) AS w,
         CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
           % 1000000 AS u
  FROM documents
)
SELECT doc_id, source, ROUND(w, 4) AS q_weight
FROM scored
WHERE u < CAST(FLOOR(w * 1000000) AS BIGINT)
""",
    tags=("sample", "quality", "deterministic"),
)
def q_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling: P(keep) ∝ length score.

    The importance-sampling step of corpus curation — upweight long
    documents, keep a floor probability for short ones — made
    reproducible: acceptance compares a per-doc md5 uniform (the
    engine-portable hash device from `q_hash_sample_documents`)
    against the doc's weight, so any engine agrees on the exact kept
    set; no RNG, no seed drift between runs or engines. ``FLOOR``
    before the integer compare on BOTH sides because DuckDB's
    double→BIGINT cast rounds while Spark's truncates.

    Scale: a map-side filter — no shuffle, pushdown-friendly, and the
    acceptance test reads only (doc_id, n_chars), never the payload.
    """
    tune_session(spark)
    d = read_table(spark, sf_dir, "documents")
    w = F.greatest(F.lit(0.05), F.least(F.lit(1.0), F.col("n_chars") / F.lit(2000.0)))
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 1000000
    )
    return (
        d.withColumn("_w", w)
        .withColumn("_u", u)
        .filter(F.col("_u") < F.floor(F.col("_w") * 1000000).cast("bigint"))
        .select("doc_id", "source", F.round(F.col("_w"), 4).alias("q_weight"))
    )


@register(
    "q_per_domain_quantile_filter",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, source, n_chars,
         1.0 * n_chars / len(regexp_split_to_array({_NORM}, ' ')) AS score,
         PERCENT_RANK() OVER (
           PARTITION BY source
           ORDER BY 1.0 * n_chars
                    / len(regexp_split_to_array({_NORM}, ' ')), doc_id
         ) AS pr
  FROM documents
)
SELECT source,
       COUNT(*) AS survivors,
       SUM(n_chars) AS surviving_chars,
       ROUND(MIN(score), 6) AS min_score
FROM scored
WHERE pr >= 0.6
GROUP BY source
""",
    tags=("quality", "curation", "quantile"),
)
def q_per_domain_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain adaptive quality threshold: score every document
    (chars per token — a density proxy standing in for any per-doc
    quality model) and keep only those at or above their OWN source's
    0.6 quantile, then profile the survivors per source. Fixed global
    cutoffs over-prune clean domains and under-prune noisy ones; the
    per-domain quantile is how curation pipelines (CCNet's
    perplexity buckets) equalize retention across domains.

    Determinism: the quantile is rank-based (percent_rank over
    (score, doc_id)), not value-interpolated — percentile_cont
    interpolation order is engine-specific, ranks are not. Ties at the
    boundary resolve by doc_id identically in both engines.

    Scale shape: one shuffle on source for the window (source
    cardinality is small => few fat partitions; at real scale the
    window would run per (source, salt) with a two-pass rank merge or
    an approx-quantile broadcast cutoff — noted, not needed at bench
    sizes), then the same partitioning serves the aggregate with no
    second shuffle. The payload never moves: the window carries
    (doc_id, source, n_chars, score) only."""
    tune_session(spark)
    from pyspark.sql import Window as W

    d = read_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        "n_chars",
        chars_per_token_score(F.col("n_chars"), F.col("text")).alias("score"),
    )
    pr = F.percent_rank().over(
        W.partitionBy("source").orderBy("score", "doc_id")
    )
    return (
        scored.withColumn("pr", pr)
        .filter(F.col("pr") >= 0.6)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("survivors"),
            F.sum("n_chars").alias("surviving_chars"),
            F.round(F.min("score"), 6).alias("min_score"),
        )
    )


def hashed_margin_agg(d: DataFrame) -> DataFrame:
    """Per-document hashed-feature weight aggregate ``(doc_id, n_feats,
    _sw)`` over a frame with (doc_id, text) — the exact-BIGINT core of
    `q_hashed_linear_quality_score`, factored out so the composed
    curation pipeline applies the identical classifier arithmetic."""
    toks = F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
    base = d.select("doc_id", toks.alias("_toks"))
    uni = base.select("doc_id", F.explode("_toks").alias("_g"))
    bi = (
        base.filter(F.size("_toks") >= 2)
        .select(
            "doc_id",
            "_toks",
            F.explode(F.sequence(F.lit(1), F.size("_toks") - 1)).alias("_p"),
        )
        .select(
            "doc_id", F.concat_ws(" ", F.slice("_toks", F.col("_p"), 2)).alias("_g")
        )
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("_g")), 1, 15), 16, 10).cast("bigint") % 4096
    )
    w = (bucket * F.lit(2654435761).cast("bigint")) % F.lit(4294967296).cast("bigint")
    return (
        uni.unionByName(bi)
        .select("doc_id", w.alias("_w"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_feats"), F.sum("_w").alias("_sw"))
    )



@register(
    "q_hashed_linear_quality_score",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array({_NORM}, ' ') AS t FROM documents
), feats AS (
  SELECT doc_id, u.g FROM toks, UNNEST(t) AS u(g)
  UNION ALL
  SELECT doc_id, array_to_string(t[p : p + 1], ' ') AS g
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS s(p)
  WHERE len(t) >= 2
), weighted AS (
  SELECT doc_id,
         ((CAST(('0x' || SUBSTR(MD5(g), 1, 15)) AS BIGINT) % 4096)
           * 2654435761) % 4294967296 AS w
  FROM feats
), agg AS (
  SELECT doc_id, COUNT(*) AS n_feats, SUM(w) AS sw FROM weighted GROUP BY doc_id
)
SELECT doc_id, n_feats,
       ROUND((1.0 * sw / n_feats - 2147483648) / 2147483648, 6) AS margin,
       2 * sw >= n_feats * 4294967296 AS keep
FROM agg
""",
    tags=("quality", "classifier", "hashing-trick"),
)
def q_hashed_linear_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-shaped hashed linear text classifier: word unigram +
    bigram features, hashing-trick into 4096 buckets, a fixed
    per-bucket weight, per-document mean margin + keep decision. This
    is the quality-filter shape (CCNet / fastText lid+quality) run over
    a whole corpus — the model here is a deterministic stand-in (bucket
    weights derived from the bucket id by a Knuth multiplicative hash,
    uniform in [0, 2^32)), so both engines hold bit-identical weights
    without shipping a model artifact.

    Determinism across engines: the per-document weight SUM is exact
    BIGINT arithmetic — no float accumulation order to disagree on —
    and becomes a double only in the final margin division. The keep
    decision is a pure integer compare (2*sum >= n*2^32), immune to
    rounding at the boundary.

    Scale shape: features never materialize a vocabulary — the hash IS
    the feature id (the point of the hashing trick at 100 TB: no
    dictionary build, no OOV). One explode + one hash aggregate on
    doc_id; everything before the aggregate is a map-side projection
    in whole-stage codegen (explode of sequence + slice — the row form;
    array HOFs are interpreted, measured 10x slower, see
    operators/dedup.py::gram_rows_hashed)."""
    tune_session(spark)
    d = read_table(spark, sf_dir, "documents")
    agg = hashed_margin_agg(d)
    return agg.select(
        "doc_id",
        "n_feats",
        F.round(
            (F.lit(1.0) * F.col("_sw") / F.col("n_feats") - F.lit(2147483648.0))
            / F.lit(2147483648.0),
            6,
        ).alias("margin"),
        (F.lit(2) * F.col("_sw") >= F.col("n_feats") * F.lit(4294967296).cast("bigint")).alias(
            "keep"
        ),
    )
