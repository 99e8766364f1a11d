"""Deterministic cardinality/sampling sketches — the approximate
algorithms a 100 TB pipeline actually runs, made hash-oracle-checkable.

The trick throughout: every stochastic ingredient is replaced by the
engine-portable md5 hash device (`q_hash_sample_documents`), and every
floating aggregation is restructured so the ONLY float ops are
single exactly-rounded IEEE divisions / one libm call on identical
inputs — never an order-dependent float SUM. That's what lets DuckDB
hash-match a KMV estimator or an HLL harmonic mean bit-for-bit:

- KMV / HLL register sums are exact BIGINT (``1 << (W - rho)``).
- Estimates come from one or two divisions on those exact ints.
- Priority orderings (weighted reservoir) sort on an exactly-computed
  ratio, with the transcendental applied monotonically.

Reference scope: the reference engine has no sketching; these are the
"beyond the reference" training-data operators the build brief asks
for (distinct counting + weighted sampling at corpus scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_project_spark.catalog import read_table
from etl_project_spark.plans.registry import register
from etl_project_spark.session import tune_session

#: 60-bit uniform hash in [0, 2^60): identical in Spark and DuckDB.
_TWO60 = 1_152_921_504_606_846_976


def _h60(col):
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )


def _h60_sql(expr: str) -> str:
    return f"CAST(('0x' || SUBSTR(MD5(CAST({expr} AS VARCHAR)), 1, 15)) AS BIGINT)"


_KMV_K = 64

_KMV_ORACLE = f"""
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (SELECT event_type, {_h60_sql('user_id')} AS h FROM du),
r AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM h
),
agg AS (
  SELECT event_type,
         COUNT(*) AS exact_distinct,
         MAX(CASE WHEN rn <= {_KMV_K} THEN h END) AS kth
  FROM r GROUP BY event_type
)
SELECT event_type, exact_distinct,
       ROUND(CASE WHEN exact_distinct < {_KMV_K}
                  THEN CAST(exact_distinct AS DOUBLE)
                  ELSE {_KMV_K - 1}.0 / (CAST(kth AS DOUBLE) / {_TWO60}.0)
             END, 2) AS est_distinct
FROM agg
"""


@register(
    "q_kmv_distinct_users",
    oracle=_KMV_ORACLE,
    tags=("sketch", "kmv", "distinct"),
)
def q_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-user estimate per event type,
    k=64, vs the exact count.

    Sketch theory (Bar-Yossef et al.): with k order statistics of a
    uniform hash, E[distinct] ≈ (k-1)/max(k smallest normalized
    hashes); below k observed values the sketch is exact by
    construction. Determinism: the hash is the md5 60-bit device, the
    estimate is two IEEE divisions on exact ints — bit-identical
    across engines, so even an *approximate* estimator hash-matches.

    Scale shape: one shuffle for the distinct, one window (same key).
    At 100 TB you'd replace the window with a partial top-k aggregate
    (k smallest per partition, re-merge) — same result, no global
    sort; the window form keeps the plan readable at bench SF.
    """
    tune_session(spark)
    from pyspark.sql.window import Window

    du = (
        read_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    h = du.select("event_type", _h60(F.col("user_id")).alias("h"))
    w = Window.partitionBy("event_type").orderBy("h")
    r = h.withColumn("rn", F.row_number().over(w))
    agg = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_distinct"),
        F.max(F.when(F.col("rn") <= _KMV_K, F.col("h"))).alias("kth"),
    )
    est = (
        F.when(
            F.col("exact_distinct") < _KMV_K,
            F.col("exact_distinct").cast("double"),
        ).otherwise(
            F.lit(float(_KMV_K - 1))
            / (F.col("kth").cast("double") / F.lit(float(_TWO60)))
        )
    )
    return agg.select(
        "event_type",
        "exact_distinct",
        F.round(est, 2).alias("est_distinct"),
    )


# HLL: m = 256 registers; h mod 256 picks the register, the remaining
# 52 bits feed rho = leading-zero-count + 1 = 53 - bitlength(rest).
_HLL_M = 256
_HLL_W = 52
#: alpha_256 = 0.7213/(1 + 1.079/256), written as a shared literal so
#: both engines use the identical double.
_HLL_ALPHA = 0.7182725932495458

_HLL_ORACLE = f"""
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (SELECT event_type, {_h60_sql('user_id')} AS h FROM du),
parts AS (
  SELECT event_type, h % {_HLL_M} AS bucket, h // {_HLL_M} AS rest FROM h
),
rho AS (
  SELECT event_type, bucket,
         {_HLL_W + 1} - (CASE WHEN rest = 0 THEN 0
                              ELSE LENGTH(bin(rest)) END) AS rho
  FROM parts
),
regs AS (
  SELECT event_type, bucket, MAX(rho) AS m_j
  FROM rho GROUP BY event_type, bucket
),
sums AS (
  SELECT event_type,
         COUNT(*) AS used,
         SUM(CAST(1 AS BIGINT) << ({_HLL_W + 1} - m_j)) AS s_obs
  FROM regs GROUP BY event_type
),
est AS (
  SELECT event_type, used,
         {_HLL_M} - used AS zeros,
         CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M * _HLL_M}
           * CAST(CAST(1 AS BIGINT) << {_HLL_W + 1} AS DOUBLE)
           / CAST(s_obs + ({_HLL_M} - used) * (CAST(1 AS BIGINT) << {_HLL_W + 1})
                  AS DOUBLE)
           AS raw
  FROM sums
),
ex AS (SELECT event_type, COUNT(*) AS exact_distinct FROM du GROUP BY event_type)
SELECT est.event_type, ex.exact_distinct, est.used AS registers_used,
       ROUND(CASE WHEN est.raw <= CAST({2.5 * _HLL_M!r} AS DOUBLE) AND est.zeros > 0
                  THEN {_HLL_M} * LN(CAST({_HLL_M} AS DOUBLE) / est.zeros)
                  ELSE est.raw END, 2) AS est_distinct
FROM est JOIN ex ON ex.event_type = est.event_type
"""


def hll_registers(pairs) -> "DataFrame":
    """HLL register table ``(event_type, bucket, m_j)`` from raw
    ``(event_type, user_id)`` rows — ONE max-aggregate, so it runs on a
    STREAMING DataFrame unchanged. No distinct needed: the register
    update is idempotent (a replayed user lands on the same bucket
    with the same rho, and ``max`` absorbs it) — which is exactly why
    HLL is the canonical streaming distinct sketch. Bounded state:
    ≤ m=256 registers per key.
    """
    h = pairs.select("event_type", _h60(F.col("user_id")).alias("h"))
    parts = h.select(
        "event_type",
        (F.col("h") % _HLL_M).alias("bucket"),
        F.expr(f"h div {_HLL_M}").alias("rest"),
    )
    rho = parts.select(
        "event_type",
        "bucket",
        (
            F.lit(_HLL_W + 1)
            - F.when(F.col("rest") == 0, 0).otherwise(
                F.length(F.expr("bin(rest)"))
            )
        ).alias("rho"),
    )
    return rho.groupBy("event_type", "bucket").agg(F.max("rho").alias("m_j"))


def hll_estimate(regs) -> "DataFrame":
    """Fold a register table into ``(event_type, registers_used,
    est_distinct)`` — the exact-integer harmonic sum + LinearCounting
    branch the oracle replays bit-for-bit. Shared by the batch query
    and the streaming twin's drained state.
    """
    two_w1 = F.expr(f"shiftleft(cast(1 as bigint), {_HLL_W + 1})")
    sums = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("used"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_W + 1} - m_j)")).alias(
            "s_obs"
        ),
    )
    est = sums.select(
        "event_type",
        "used",
        (F.lit(_HLL_M) - F.col("used")).alias("zeros"),
        (
            F.lit(_HLL_ALPHA)
            * F.lit(_HLL_M * _HLL_M)
            * two_w1
            / (F.col("s_obs") + (F.lit(_HLL_M) - F.col("used")) * two_w1)
        ).alias("raw"),
    )
    corrected = F.when(
        (F.col("raw") <= F.lit(2.5 * _HLL_M)) & (F.col("zeros") > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / F.col("zeros")),
    ).otherwise(F.col("raw"))
    return est.select(
        "event_type",
        F.col("used").alias("registers_used"),
        F.round(corrected, 2).alias("est_distinct"),
    )


@register(
    "q_hll_distinct_users",
    oracle=_HLL_ORACLE,
    tags=("sketch", "hyperloglog", "distinct"),
)
def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event type (m=256
    registers) with the small-range LinearCounting correction —
    hash-oracle-checked, unlike ``approx_count_distinct`` whose HLL++
    internals are engine-private (`q_approx_distinct_users` is the
    rows-only cousin).

    Determinism engineering: the harmonic denominator Σ 2^(-M_j) is
    scaled by 2^53 into an EXACT BIGINT sum (integer addition commutes;
    float addition doesn't), so the estimate is one IEEE division on
    identical ints; rho comes from ``bin()`` string length, identical
    in both engines; the LinearCounting branch condition compares
    identical doubles. Register update is an algebraic max-aggregate —
    the same merge a 1000-executor partial-agg runs map-side.
    """
    tune_session(spark)
    du = (
        read_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    est = hll_estimate(hll_registers(du))
    ex = du.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_distinct"))
    return est.join(ex, "event_type").select(
        "event_type", "exact_distinct", "registers_used", "est_distinct"
    )


_RES_K = 5

_RES_ORACLE = f"""
WITH pri AS (
  SELECT source, doc_id, n_chars,
         -LN((CAST({_h60_sql('doc_id')} AS DOUBLE) + 1.0) / {_TWO60}.0)
           / n_chars AS e
  FROM documents WHERE n_chars > 0
),
r AS (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY e, doc_id) AS rn
  FROM pri
)
SELECT source, rn AS rank, doc_id, n_chars AS weight
FROM r WHERE rn <= {_RES_K}
"""


@register(
    "q_weighted_reservoir_docs",
    oracle=_RES_ORACLE,
    tags=("sketch", "sampling", "weighted-reservoir"),
)
def q_weighted_reservoir_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sample (Efraimidis–Spirakis A-ES), k=5 docs
    per source, weight = document length — the length-proportional
    sampling a corpus-inspection pipeline uses.

    A-ES: draw u~U(0,1] per item, keep the k largest u^(1/w) — here
    ranked by the monotone-equivalent exponential key -ln(u)/w
    (ascending), which costs ONE libm call on an exactly-computed
    ratio, so both engines order identical doubles (u is the md5
    device, never an RNG). Distributed shape: the rank is a per-source
    top-k — at scale a partial top-k aggregate per partition then
    merge, exactly how reservoir sampling composes over shards.
    """
    tune_session(spark)
    from pyspark.sql.window import Window

    d = read_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (_h60(F.col("doc_id")).cast("double") + F.lit(1.0)) / F.lit(float(_TWO60))
    pri = d.select(
        "source", "doc_id", "n_chars", (-F.log(u) / F.col("n_chars")).alias("e")
    )
    w = Window.partitionBy("source").orderBy("e", "doc_id")
    return (
        pri.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _RES_K)
        .select(
            "source",
            F.col("rn").alias("rank"),
            "doc_id",
            F.col("n_chars").alias("weight"),
        )
    )


# Johnson-Lindenstrauss: 64-dim embeddings -> 16-dim +-1 projection.
_JL_T = 16
_JL_MOD = 13    # vec_id % 13 == 0 -> sampled vectors for the pair audit
_JL_CAP = 4096  # hard bound on the audit set: pairs are quadratic

_JL_ORACLE = f"""
WITH samp AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id % {_JL_MOD} = 0
  ORDER BY vec_id LIMIT {_JL_CAP}
),
q AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS i,
         CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * 10000) AS BIGINT) AS qv
  FROM samp
),
proj AS (
  SELECT q.vec_id, j.j,
         SUM(CASE WHEN {_h60_sql('q.i * 16 + j.j')} % 2 = 0
                  THEN qv ELSE -qv END) AS p
  FROM q, (SELECT UNNEST(generate_series(0, {_JL_T - 1})) AS j) j
  GROUP BY q.vec_id, j.j
),
dproj AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         SUM((a.p - b.p) * (a.p - b.p)) AS d2p
  FROM proj a JOIN proj b ON a.j = b.j AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
dorig AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         SUM((a.qv - b.qv) * (a.qv - b.qv)) AS d2o
  FROM q a JOIN q b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
)
SELECT ROUND(CAST(d2p AS DOUBLE) / (CAST({_JL_T} AS DOUBLE) * CAST(d2o AS DOUBLE)), 1)
         AS ratio_bucket,
       COUNT(*) AS n_pairs
FROM dproj JOIN dorig USING (va, vb)
WHERE d2o > 0
GROUP BY 1
"""


@register(
    "q_jl_projection_distortion",
    oracle=_JL_ORACLE,
    tags=("sketch", "random-projection", "embedding"),
)
def q_jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss audit: project 64-d embeddings to 16-d
    with a deterministic ±1 matrix and histogram the pairwise
    squared-distance ratio d²_proj/(16·d²_orig) (≈1 when the lemma
    holds) over a hash-sampled vector subset.

    Determinism: components quantize to 1e-4 BIGINTs first, so every
    distance/projection is EXACT integer arithmetic (a float dot
    product would be summation-order-dependent); the ±1 entries come
    from the md5 device on (i,j); the only float op is the final
    ratio division.

    Scale shape (rebuilt after the r9 sf10 sweep exhausted disk here):
    the audit set is the lowest-`_JL_CAP` sampled vec_ids — a
    distributed partial top-k, mirrored by ORDER BY/LIMIT in the
    oracle — because pairwise audits are Θ(k²) no matter how they are
    expressed, so k must be a constant, not corpus-proportional. The
    old form also joined exploded COMPONENT rows on `j`/`i` (16 and 64
    distinct values): every pair materialized 80 shuffle rows and the
    join keys had corpus-scale skew groups — ~7.6e9 rows at sf10.
    Distances now compute on PACKED arrays: one broadcast
    nested-loop pair join over the ≤4096-row vector table (broadcast
    is safe — the side is cap-bounded by construction), with
    `zip_with`/`aggregate` doing the exact integer Σ(Δ²) per pair
    inside codegen. Same integers, same histogram, no explosion.
    """
    tune_session(spark)
    emb = (
        read_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % _JL_MOD == 0)
        .orderBy("vec_id")
        .limit(_JL_CAP)
        .select(
            "vec_id",
            F.expr(
                "transform(embedding, x -> cast(round(x * 10000) as bigint))"
            ).alias("qarr"),
        )
    )
    q = emb.select("vec_id", F.posexplode("qarr").alias("i", "qv"))
    sign = F.when(
        _h60(F.col("i") * 16 + F.col("j")) % 2 == 0, F.col("qv")
    ).otherwise(-F.col("qv"))
    proj = (
        q.withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(_JL_T - 1))))
        .groupBy("vec_id", "j")
        .agg(F.sum(sign).alias("p"))
    )
    parr = proj.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "p"))), lambda s: s["p"]
        ).alias("parr")
    )
    # limit() collapses its result to ONE partition; without this
    # re-spread the Θ(k²) pair loop below would run on a single core
    # (measured 280.9 s at sf10 — vs 23.5 s spread over 64 tasks).
    # A 4096-row shuffle is free; the broadcast side is unaffected.
    vecs = emb.join(parr, "vec_id").repartition(64, "vec_id")
    a, b = vecs.alias("a"), vecs.alias("b")

    def _d2(lhs, rhs):
        return F.aggregate(
            F.zip_with(lhs, rhs, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    pairs = a.join(
        F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id")
    ).select(
        _d2(F.col("a.parr"), F.col("b.parr")).alias("d2p"),
        _d2(F.col("a.qarr"), F.col("b.qarr")).alias("d2o"),
    )
    return (
        pairs.filter(F.col("d2o") > 0)
        .groupBy(
            F.round(
                F.col("d2p").cast("double") / (F.lit(float(_JL_T)) * F.col("d2o")),
                1,
            ).alias("ratio_bucket")
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


_CMS_D = 4      # hash rows
_CMS_W = 1024   # counters per row


def cms_cell_counts(docs) -> "DataFrame":
    """The d×w Count-Min counter table ``(seed, cell, total)`` as ONE
    aggregation over the raw token stream — the form that works on a
    STREAMING DataFrame too (chained aggregations are illegal in a
    stream; the batch query's term-count intermediate is a batch-only
    optimization that reuses `cnt` for the probe). Identical result:
    Σ_term count(term) per cell ≡ count of token instances per cell.
    State is d·w = 4096 cells regardless of corpus size — the reason
    CMS is the canonical streaming frequency sketch.
    """
    toks = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select(
            F.explode(
                F.split(
                    F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " ")),
                    " ",
                )
            ).alias("term")
        )
        .filter(F.col("term") != "")
    )
    seeded = toks.withColumn(
        "seed", F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1)))
    )
    cell = _h60(F.concat_ws(":", F.col("seed"), F.col("term"))) % _CMS_W
    return seeded.groupBy("seed", cell.alias("cell")).agg(
        F.count(F.lit(1)).alias("total")
    )

_CMS_ORACLE = f"""
WITH toks AS (
  SELECT UNNEST(regexp_split_to_array(
           TRIM(regexp_replace(LOWER(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS term
  FROM documents WHERE TRIM(text) <> ''
),
cnt AS (SELECT term, COUNT(*) AS c FROM toks WHERE term <> '' GROUP BY term),
seeds AS (SELECT UNNEST(generate_series(0, {_CMS_D - 1})) AS seed),
cells AS (
  SELECT seed,
         {_h60_sql("seed || ':' || term")} % {_CMS_W} AS cell,
         SUM(c) AS total
  FROM cnt, seeds GROUP BY seed, cell
),
top AS (
  SELECT term, c, ROW_NUMBER() OVER (ORDER BY c DESC, term) AS rn
  FROM cnt
),
probe AS (
  SELECT t.term, t.c, t.rn, MIN(cl.total) AS est
  FROM top t
  JOIN seeds s ON TRUE
  JOIN cells cl
    ON cl.seed = s.seed
   AND cl.cell = {_h60_sql("s.seed || ':' || t.term")} % {_CMS_W}
  WHERE t.rn <= 20
  GROUP BY t.term, t.c, t.rn
)
SELECT rn AS rank, term, CAST(c AS BIGINT) AS exact_count,
       CAST(est AS BIGINT) AS cms_estimate,
       CAST(est - c AS BIGINT) AS overestimate
FROM probe
"""


@register(
    "q_countmin_token_freq",
    oracle=_CMS_ORACLE,
    tags=("sketch", "count-min", "heavy-hitters"),
)
def q_countmin_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over the corpus token stream (d=4 rows ×
    w=1024 counters), probed for the top-20 exact tokens: estimate =
    min over rows of the hashed counter, reported beside the exact
    count and the (always ≥ 0) collision overestimate — the
    frequency-sketch accuracy audit a streaming heavy-hitters pipeline
    runs offline.

    Every quantity is an integer (counter sums, min-of-counters), so
    the sketch is hash-oracle-checkable outright — no float laundering
    needed. Plan shape: one token hash-agg, a 4-way seed explode into
    a (seed, cell) hash-agg — the sketch table is d·w = 4096 rows
    REGARDLESS of corpus size, the whole point of CMS at 100 TB — and
    a broadcast probe join for the audited tokens.
    """
    tune_session(spark)
    d = read_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = d.select(
        F.explode(
            F.split(
                F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " ")),
                " ",
            )
        ).alias("term")
    ).filter(F.col("term") != "")
    cnt = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    seeded = cnt.withColumn(
        "seed", F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1)))
    )
    cell = _h60(F.concat_ws(":", F.col("seed"), F.col("term"))) % _CMS_W
    cells = (
        seeded.groupBy("seed", cell.alias("cell"))
        .agg(F.sum("c").alias("total"))
    )
    from pyspark.sql.window import Window

    # Top-20 via orderBy().limit() — Spark plans TakeOrderedAndProject
    # (per-partition heap + driver merge of 20-row heads), NOT a global
    # sort. The row_number window then runs over the 20 survivors only;
    # the round-7 form windowed the ENTIRE vocabulary table through one
    # partition (WindowExec single-partition warning in the bench tail).
    top = (
        cnt.orderBy(F.desc("c"), "term")
        .limit(20)
        .withColumn(
            "rn", F.row_number().over(Window.orderBy(F.desc("c"), "term"))
        )
        .withColumn("seed", F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))))
        .withColumn(
            "cell", _h60(F.concat_ws(":", F.col("seed"), F.col("term"))) % _CMS_W
        )
    )
    probe = (
        top.join(cells, ["seed", "cell"])
        .groupBy("rn", "term", "c")
        .agg(F.min("total").alias("est"))
    )
    return probe.select(
        F.col("rn").alias("rank"),
        "term",
        F.col("c").cast("long").alias("exact_count"),
        F.col("est").cast("long").alias("cms_estimate"),
        (F.col("est") - F.col("c")).cast("long").alias("overestimate"),
    )


_HQ_BINS = 64
_HQ_QS = (0.5, 0.9, 0.99)

_HQ_ORACLE = f"""
WITH ext AS (
  SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi,
         COUNT(*) AS n
  FROM lineitem
),
binned AS (
  SELECT LEAST(CAST(FLOOR((l_extendedprice - lo) / (hi - lo) * {_HQ_BINS})
                    AS INTEGER), {_HQ_BINS - 1}) AS b,
         COUNT(*) AS c
  FROM lineitem, ext GROUP BY 1
),
cum AS (
  SELECT b, c, SUM(c) OVER (ORDER BY b) AS cum_le,
         SUM(c) OVER (ORDER BY b) - c AS cum_lt
  FROM binned
),
qs AS (SELECT CAST(UNNEST([{", ".join(str(q) for q in _HQ_QS)}]) AS DOUBLE) AS q),
pick AS (
  SELECT q, MIN(b) AS b
  FROM qs, cum, ext
  WHERE cum_le >= q * n
  GROUP BY q
),
est AS (
  SELECT p.q, p.b, c2.c, c2.cum_lt, ext.lo, ext.hi, ext.n
  FROM pick p JOIN cum c2 ON c2.b = p.b, ext
),
exact AS (
{" UNION ALL ".join(
    f"  SELECT CAST({q} AS DOUBLE) AS q, PERCENTILE_DISC({q}) WITHIN GROUP "
    "(ORDER BY l_extendedprice) AS exact_raw FROM lineitem"
    for q in _HQ_QS)}
)
SELECT est.q AS quantile,
       ROUND(lo + (CAST(b AS DOUBLE) + (est.q * n - cum_lt) / c)
                  * ((hi - lo) / {_HQ_BINS}), 4) AS est_value,
       ROUND(exact.exact_raw, 4) AS exact_value
FROM est JOIN exact ON exact.q = est.q
"""


@register(
    "q_histogram_quantile_estimate",
    oracle=_HQ_ORACLE,
    tags=("sketch", "quantile", "histogram"),
)
def q_histogram_quantile_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width-histogram quantile estimation (64 bins, p50/p90/p99
    with within-bin linear interpolation) beside the exact
    ``percentile_disc`` — the fixed-memory quantile sketch whose
    accuracy/bin-count trade-off this query audits (t-digest/KLL are
    engine-private; a fixed grid is the portable, mergeable variant —
    bin counts add across partitions/shards, giving the same
    one-pass-mergeable property at 100 TB).

    Determinism: bin assignment and interpolation use the identical
    IEEE expression tree in both engines (single division for the bin
    ratio, single division for the in-bin fraction); counts are exact
    ints; outputs round at 4 decimals.
    """
    tune_session(spark)
    from pyspark.sql.window import Window

    li = read_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    ext = li.agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    b = F.least(
        F.floor(
            (F.col("l_extendedprice") - F.col("lo"))
            / (F.col("hi") - F.col("lo"))
            * _HQ_BINS
        ).cast("int"),
        F.lit(_HQ_BINS - 1),
    )
    binned = (
        li.crossJoin(F.broadcast(ext))
        .groupBy(b.alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = binned.select(
        "b", "c", F.sum("c").over(w).alias("cum_le"),
        (F.sum("c").over(w) - F.col("c")).alias("cum_lt"),
    )
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in _HQ_QS])).alias("q")
    )
    pick = (
        qs.crossJoin(cum)
        .crossJoin(F.broadcast(ext.select("n")))
        .filter(F.col("cum_le") >= F.col("q") * F.col("n"))
        .groupBy("q")
        .agg(F.min("b").alias("b"))
    )
    est = (
        pick.join(cum, "b")
        .crossJoin(F.broadcast(ext))
    )
    exact_wide = li.agg(
        *[
            F.expr(
                f"percentile_disc({q}) WITHIN GROUP (ORDER BY l_extendedprice)"
            ).alias(f"p{i}")
            for i, q in enumerate(_HQ_QS)
        ]
    )
    exact = exact_wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"), F.col(f"p{i}").alias("exact_raw")
                    )
                    for i, q in enumerate(_HQ_QS)
                ]
            )
        ).alias("s")
    ).select("s.q", "s.exact_raw")
    est_val = F.col("lo") + (
        F.col("b").cast("double")
        + (F.col("q") * F.col("n") - F.col("cum_lt")) / F.col("c")
    ) * ((F.col("hi") - F.col("lo")) / F.lit(_HQ_BINS))
    return (
        est.join(exact, "q")
        .select(
            F.col("q").alias("quantile"),
            F.round(est_val, 4).alias("est_value"),
            F.round(F.col("exact_raw"), 4).alias("exact_value"),
        )
    )
