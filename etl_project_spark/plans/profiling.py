"""Statistical data-profiling operators: Benford's-law digit audits,
chi-square independence tests, and concentration (Gini) metrics.

The auditing layer a warehouse team runs over financial-ish facts:
anomaly screens that reduce 100 TB to a handful of test statistics.
Every plan here is aggregate-first — the statistics are computed over
tiny post-aggregation frames, never over the fact table with a global
window.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_project_spark.catalog import read_table
from etl_project_spark.plans.registry import register
from etl_project_spark.session import tune_session


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return read_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Benford's law: the classic forensic-accounting screen. One hash-agg
# to 9 rows; expected shares are compile-time constants (log10(1+1/d)
# evaluated in the PLAN, identically in both engines' parsers is not
# required — the literal is baked by Python and mirrored as the exact
# same literal in the SQL text).
# --------------------------------------------------------------------------
_BENFORD = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}
_BENFORD_SQL_CASE = "CASE lead_digit " + " ".join(
    f"WHEN {d} THEN {p!r}" for d, p in _BENFORD.items()
) + " END"


@register(
    "q_benford_digit_profile",
    oracle=f"""
WITH digits AS (
  SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INTEGER) AS lead_digit
  FROM orders
),
counts AS (
  SELECT lead_digit, COUNT(*) AS n FROM digits GROUP BY lead_digit
),
tot AS (SELECT SUM(n) AS t FROM counts)
SELECT lead_digit,
       CAST(n AS BIGINT) AS n_orders,
       ROUND(1.0 * n / t, 6) AS obs_share,
       ROUND({_BENFORD_SQL_CASE}, 6) AS benford_share,
       ROUND(POW(1.0 * n / t - {_BENFORD_SQL_CASE}, 2)
             / ({_BENFORD_SQL_CASE}), 6) AS chi2_contrib
FROM counts, tot
""",
    tags=("profiling", "benford", "audit"),
)
def q_benford_digit_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-digit distribution of order totals vs Benford's law,
    with per-digit chi-square contributions.

    Digit extraction is string-first-char on the integer part (pure
    codegen), the aggregate is 9 rows, and the expected shares are
    Python-evaluated double literals baked identically into both
    plans — no libm log10 divergence can enter.
    """
    o = _t(spark, sf_dir, "orders")
    digits = o.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        ).cast("integer").alias("lead_digit")
    )
    counts = digits.groupBy("lead_digit").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("t"))
    exp = F.element_at(
        F.create_map(
            *[F.lit(x) for d, p in _BENFORD.items() for x in (d, p)]
        ),
        F.col("lead_digit"),
    )
    share = F.col("n") * 1.0 / F.col("t")
    return counts.crossJoin(F.broadcast(tot)).select(
        "lead_digit",
        F.col("n").cast("long").alias("n_orders"),
        F.round(share, 6).alias("obs_share"),
        F.round(exp, 6).alias("benford_share"),
        F.round(F.pow(share - exp, 2) / exp, 6).alias("chi2_contrib"),
    )


# --------------------------------------------------------------------------
# Chi-square independence: is market segment independent of region?
# Observed = one hash-agg to a 25-cell contingency table; expected and
# the test statistic are windows over those 25 rows.
# --------------------------------------------------------------------------
@register(
    "q_chisq_segment_region",
    oracle="""
WITH obs AS (
  SELECT c.c_mktsegment AS segment, r.r_name AS region, COUNT(*) AS o
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
),
tot AS (
  SELECT segment, region, o,
         SUM(o) OVER (PARTITION BY segment) AS row_tot,
         SUM(o) OVER (PARTITION BY region) AS col_tot,
         SUM(o) OVER () AS grand_tot
  FROM obs
)
SELECT segment, region,
       CAST(o AS BIGINT) AS observed,
       ROUND(1.0 * row_tot * col_tot / grand_tot, 4) AS expected,
       ROUND(POW(o - 1.0 * row_tot * col_tot / grand_tot, 2)
             / (1.0 * row_tot * col_tot / grand_tot), 6) AS chi2_contrib
FROM tot
""",
    tags=("profiling", "chi-square", "independence"),
)
def q_chisq_segment_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence screen for market segment × region:
    observed vs expected cell counts and per-cell χ² contributions.

    Both dim joins broadcast (nation/region are constant-size); the
    windows run over the 25-row contingency table, not the customer
    table. The unpartitioned SUM() OVER () is a 25-row frame — the
    aggregate-first discipline that keeps test statistics scale-free.
    """
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    obs = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"), F.col("r_name").alias("region")
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    row_tot = F.sum("o").over(W.partitionBy("segment"))
    col_tot = F.sum("o").over(W.partitionBy("region"))
    grand = F.sum("o").over(W.partitionBy())
    e = 1.0 * row_tot * col_tot / grand
    return obs.select(
        "segment",
        "region",
        F.col("o").cast("long").alias("observed"),
        F.round(e, 4).alias("expected"),
        F.round(F.pow(F.col("o") - e, 2) / e, 6).alias("chi2_contrib"),
    )


# --------------------------------------------------------------------------
# Gini coefficient of customer spend — concentration in EXACT integer
# arithmetic: spend in cents (long), ranks from one sort over the
# customer-level aggregate, Σ i·xᵢ as an exact integer sum; only the
# final ratio is a double. Rank ties share equal x, so the statistic
# is permutation-invariant and the custkey tiebreak is purely for
# engine determinism.
# --------------------------------------------------------------------------
@register(
    "q_customer_spend_gini",
    oracle="""
WITH spend AS (
  SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i
  FROM spend
)
SELECT COUNT(*) AS n_customers,
       CAST(SUM(cents) AS DOUBLE) / 100.0 AS total_spend,
       ROUND(2.0 * CAST(SUM(CAST(i AS HUGEINT) * cents) AS DOUBLE)
             / (COUNT(*) * CAST(SUM(cents) AS DOUBLE))
             - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
FROM ranked
""",
    tags=("profiling", "gini", "concentration"),
)
def q_customer_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of total customer spend (0 = equal, →1 = one
    whale): G = 2·Σi·xᵢ/(n·Σx) − (n+1)/n over spend ranked ascending.

    The rank runs over the customer-level AGGREGATE (1 row per
    customer), not orders, and is computed with the two-phase bucketed
    scheme (`two_phase.bucketed_global_rank`) — per-spend-bucket
    row_number plus broadcast cumulative offsets — so no task ever
    ranks more than one bucket of customers (the global-window form
    funneled every customer through one partition). Σi·xᵢ accumulates
    in 128-bit integers on BOTH sides — Spark DECIMAL(38,0), DuckDB
    HUGEINT — because the sum is Θ(n²·x̄) and overflowed int64 at the
    sf10 sweep's 1.5M customers (ANSI ARITHMETIC_OVERFLOW; DuckDB's
    SUM silently widens to HUGEINT, so only Spark failed). Exact
    integers divide at the end, so parity still holds bit-for-bit.
    """
    from etl_project_spark.plans.money import cents
    from etl_project_spark.plans.two_phase import bucketed_global_rank

    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(F.sum(cents("o_totalprice")).alias("c"))
    ranked = bucketed_global_rank(spend, "c", ["o_custkey"]).select("c", "i")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum("c").cast("double") / 100.0).alias("total_spend"),
        F.round(
            2.0
            * F.sum(F.col("i").cast("decimal(38,0)") * F.col("c")).cast("double")
            / (F.count(F.lit(1)) * F.sum("c").cast("double"))
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


# --------------------------------------------------------------------------
# k-anonymity: the data-release governance audit. Quasi-identifier
# equivalence classes via one hash-agg; the audit rolls the class-size
# distribution into suppression statistics.
# --------------------------------------------------------------------------
_K_ANON = 5


@register(
    "q_k_anonymity_audit",
    oracle=f"""
WITH quasi AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
         COUNT(*) AS class_size
  FROM customer
  GROUP BY 1, 2, 3
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(class_size) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN class_size < {_K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
           AS violating_classes,
       CAST(SUM(CASE WHEN class_size < {_K_ANON} THEN class_size ELSE 0 END)
           AS BIGINT) AS rows_to_suppress,
       ROUND(1.0 * SUM(CASE WHEN class_size < {_K_ANON} THEN class_size ELSE 0 END)
             / SUM(class_size), 6) AS suppression_rate,
       CAST(MIN(class_size) AS BIGINT) AS min_class_size
FROM quasi
""",
    tags=("profiling", "k-anonymity", "governance"),
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity (k=5) audit of the customer table under the
    quasi-identifier (nation, segment, $1000 balance band): equivalence
    classes below k, and the row share that a release would have to
    suppress or generalize.

    One hash-agg to the class table, one scalar rollup — the governance
    twin of q_data_quality_audit, scale-free by aggregation.
    """
    c = _t(spark, sf_dir, "customer")
    quasi = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("class_size"))
    small = F.when(F.col("class_size") < _K_ANON, F.col("class_size")).otherwise(0)
    return quasi.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("class_size").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("class_size") < _K_ANON, 1).otherwise(0))
        .cast("long")
        .alias("violating_classes"),
        F.sum(small).cast("long").alias("rows_to_suppress"),
        F.round(F.sum(small) * 1.0 / F.sum("class_size"), 6).alias("suppression_rate"),
        F.min("class_size").cast("long").alias("min_class_size"),
    )


# --------------------------------------------------------------------------
# Regression diagnostics: OLS residual outliers, entirely from
# single-pass moment aggregates. The residual σ comes from the
# identity var(resid) = var(y)·(1 − R²) — no second pass over the
# data to compute residual spread.
# --------------------------------------------------------------------------
@register(
    "q_ols_residual_outliers",
    oracle="""
WITH spend AS (
  SELECT o_custkey, SUM(o_totalprice) AS y
  FROM orders GROUP BY o_custkey
),
pts AS (
  SELECT c.c_custkey, c.c_nationkey, c.c_acctbal AS x, s.y
  FROM customer c JOIN spend s ON c.c_custkey = s.o_custkey
),
fit AS (
  SELECT c_nationkey,
         regr_slope(y, x) AS slope,
         regr_intercept(y, x) AS icept,
         SQRT(var_pop(y) * (1 - regr_r2(y, x))) AS resid_sd
  FROM pts GROUP BY c_nationkey
)
SELECT p.c_custkey, p.c_nationkey,
       ROUND((p.y - (f.icept + f.slope * p.x)) / f.resid_sd, 4) AS resid_z
FROM pts p JOIN fit f ON p.c_nationkey = f.c_nationkey
WHERE ABS(ROUND((p.y - (f.icept + f.slope * p.x)) / f.resid_sd, 4)) >= 2.0
""",
    tags=("profiling", "regression", "outliers"),
)
def q_ols_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose total spend deviates ≥ 2σ from their nation's
    acctbal→spend OLS line (standardized residuals).

    The fit and the residual σ are the same one-pass moment aggregates
    in both engines (slope/intercept/R², σ via var·(1−R²)); the
    outlier scan is a broadcast join of the 25-row fit table back onto
    the points. No residual materialization pass, no window.
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    spend = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("y"))
    pts = c.join(spend, c.c_custkey == spend.o_custkey).select(
        "c_custkey", "c_nationkey", F.col("c_acctbal").alias("x"), "y"
    )
    fit = pts.groupBy("c_nationkey").agg(
        F.regr_slope("y", "x").alias("slope"),
        F.regr_intercept("y", "x").alias("icept"),
        F.sqrt(F.var_pop("y") * (1 - F.regr_r2("y", "x"))).alias("resid_sd"),
    )
    z = F.round(
        (F.col("y") - (F.col("icept") + F.col("slope") * F.col("x")))
        / F.col("resid_sd"),
        4,
    )
    return (
        pts.join(F.broadcast(fit), "c_nationkey")
        .select("c_custkey", "c_nationkey", z.alias("resid_z"))
        .where(F.abs(F.col("resid_z")) >= 2.0)
    )


@register(
    "q_pareto_revenue_deciles",
    oracle="""
WITH spend AS (
  SELECT o_custkey, SUM(o_totalprice) AS rev
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT rev, NTILE(10) OVER (ORDER BY rev DESC, o_custkey) AS decile
  FROM spend
),
tot AS (SELECT SUM(rev) AS t FROM spend)
SELECT decile,
       COUNT(*) AS n_customers,
       ROUND(SUM(rev), 2) AS revenue,
       ROUND(SUM(rev) / t, 6) AS revenue_share,
       ROUND(SUM(SUM(rev) / t) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
           AS cum_share
FROM scored, tot
GROUP BY decile, t
""",
    tags=("profiling", "pareto", "concentration"),
)
def q_pareto_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto curve: revenue share of each customer-spend decile (1 =
    biggest spenders) with the cumulative share — the 80/20 check.

    NTILE runs over the customer AGGREGATE but is computed
    arithmetically from the two-phase bucketed global rank
    (`two_phase.bucketed_global_rank` + `ntile_from_rank`): ANSI NTILE
    is a pure function of (rank, n), so the decile assignment needs no
    entity-scale window — the only unbounded-frame window left is the
    cumulative over the 10-row decile rollup. Companion to
    q_customer_spend_gini (same concentration story, curve form).
    """
    from etl_project_spark.plans.two_phase import bucketed_global_rank, ntile_from_rank

    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    tot = spend.agg(F.sum("rev").alias("t"), F.count(F.lit(1)).alias("n"))
    ranked = bucketed_global_rank(spend, "rev", ["o_custkey"], descending=True)
    scored = ranked.crossJoin(F.broadcast(tot.select("n"))).select(
        "rev", ntile_from_rank(F.col("i"), F.col("n"), 10).alias("decile")
    )
    tot = tot.select("t")
    per = (
        scored.groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n_customers"), F.sum("rev").alias("r"))
        .crossJoin(F.broadcast(tot))
    )
    w = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    return per.select(
        "decile",
        "n_customers",
        F.round("r", 2).alias("revenue"),
        F.round(F.col("r") / F.col("t"), 6).alias("revenue_share"),
        F.round(F.sum(F.col("r") / F.col("t")).over(w), 6).alias("cum_share"),
    )


@register(
    "q_market_concentration_hhi",
    oracle="""
WITH rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         SUM(o.o_totalprice) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
),
share AS (
  SELECT region, nation, rev,
         rev / SUM(rev) OVER (PARTITION BY region) AS s
  FROM rev
)
SELECT region,
       COUNT(*) AS n_nations,
       ROUND(SUM(s * s) * 10000, 4) AS hhi,
       ROUND(MAX(s), 6) AS top_share
FROM share
GROUP BY region
""",
    tags=("profiling", "hhi", "concentration"),
)
def q_market_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman index of revenue concentration among
    nations within each region (0–10000 scale; >2500 = concentrated).

    Shares normalize inside a 25-row window (nation-level aggregate),
    then one more rollup — the antitrust screen as two tiny
    aggregations after the fact-table reduction.
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    s = F.col("rev") / F.sum("rev").over(W.partitionBy("region"))
    share = rev.select("region", "nation", s.alias("s"))
    return share.groupBy("region").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.round(F.sum(F.col("s") * F.col("s")) * 10000, 4).alias("hhi"),
        F.round(F.max("s"), 6).alias("top_share"),
    )


# --------------------------------------------------------------------------
# Wilson score interval: the proportion CI that behaves at small n.
# Pure scalar math over per-group counts — deterministic, no
# simulation, identical double arithmetic in both engines.
# --------------------------------------------------------------------------
@register(
    "q_return_rate_wilson_ci",
    oracle="""
WITH counts AS (
  SELECT n.n_name AS nation,
         COUNT(*) AS n_items,
         SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_returned
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
SELECT nation, n_items, CAST(n_returned AS BIGINT) AS n_returned,
       ROUND(1.0 * n_returned / n_items, 6) AS return_rate,
       ROUND(((1.0 * n_returned / n_items) + 1.9599639845400545 * 1.9599639845400545 / (2 * n_items)
              - 1.9599639845400545 * SQRT(((1.0 * n_returned / n_items) * (1 - 1.0 * n_returned / n_items)
                + 1.9599639845400545 * 1.9599639845400545 / (4 * n_items)) / n_items))
             / (1 + 1.9599639845400545 * 1.9599639845400545 / n_items), 6) AS wilson_lo,
       ROUND(((1.0 * n_returned / n_items) + 1.9599639845400545 * 1.9599639845400545 / (2 * n_items)
              + 1.9599639845400545 * SQRT(((1.0 * n_returned / n_items) * (1 - 1.0 * n_returned / n_items)
                + 1.9599639845400545 * 1.9599639845400545 / (4 * n_items)) / n_items))
             / (1 + 1.9599639845400545 * 1.9599639845400545 / n_items), 6) AS wilson_hi
FROM counts
""",
    tags=("profiling", "wilson", "inference"),
)
def q_return_rate_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation lineitem return rate with its 95% Wilson score
    interval — the proportion CI that stays inside [0,1] and behaves
    at small n, computable as pure scalar math over the count
    aggregate (z = 1.9599639845400545, the same double literal baked
    into both plans).
    """
    z = 1.9599639845400545
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    counts = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("n_returned"),
        )
    )
    p = F.col("n_returned") * 1.0 / F.col("n_items")
    nn = F.col("n_items")
    half = z * F.sqrt((p * (1 - p) + z * z / (4 * nn)) / nn)
    denom = 1 + z * z / nn
    return counts.select(
        "nation",
        "n_items",
        "n_returned",
        F.round(p, 6).alias("return_rate"),
        F.round((p + z * z / (2 * nn) - half) / denom, 6).alias("wilson_lo"),
        F.round((p + z * z / (2 * nn) + half) / denom, 6).alias("wilson_hi"),
    )


@register(
    "q_welch_ttest_segments",
    oracle="""
WITH labeled AS (
  SELECT c.c_mktsegment AS seg, o.o_totalprice AS v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
),
m AS (
  SELECT seg, COUNT(*) AS n, AVG(v) AS mu, var_samp(v) AS s2
  FROM labeled GROUP BY seg
),
w AS (
  SELECT a.n AS na, a.mu AS mua, a.s2 AS s2a,
         b.n AS nb, b.mu AS mub, b.s2 AS s2b
  FROM m a, m b
  WHERE a.seg = 'BUILDING' AND b.seg = 'MACHINERY'
)
SELECT CAST(na AS BIGINT) AS n_building, CAST(nb AS BIGINT) AS n_machinery,
       ROUND(mua, 4) AS mean_building,
       ROUND(mub, 4) AS mean_machinery,
       ROUND((mua - mub) / SQRT(s2a / na + s2b / nb), 6) AS welch_t,
       ROUND(POW(s2a / na + s2b / nb, 2)
             / (POW(s2a / na, 2) / (na - 1) + POW(s2b / nb, 2) / (nb - 1)), 4)
           AS satterthwaite_df
FROM w
""",
    tags=("profiling", "ttest", "inference"),
)
def q_welch_ttest_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test: does mean order value differ
    between the BUILDING and MACHINERY segments? Emits the t statistic
    and Satterthwaite degrees of freedom.

    Inference from moment aggregates only — two (n, mean, s²) triples
    from one hash-agg, combined by scalar math on a 1-row frame; the
    same single-pass shape at any corpus size.
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    labeled = (
        o.join(c, o.o_custkey == c.c_custkey)
        .where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(F.col("c_mktsegment").alias("seg"), F.col("o_totalprice").alias("v"))
    )
    m = labeled.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("v").alias("mu"),
        F.var_samp("v").alias("s2"),
    )
    a = m.where(F.col("seg") == "BUILDING").select(
        F.col("n").alias("na"), F.col("mu").alias("mua"), F.col("s2").alias("s2a")
    )
    b = m.where(F.col("seg") == "MACHINERY").select(
        F.col("n").alias("nb"), F.col("mu").alias("mub"), F.col("s2").alias("s2b")
    )
    w = a.crossJoin(F.broadcast(b))
    se2a = F.col("s2a") / F.col("na")
    se2b = F.col("s2b") / F.col("nb")
    return w.select(
        F.col("na").cast("long").alias("n_building"),
        F.col("nb").cast("long").alias("n_machinery"),
        F.round("mua", 4).alias("mean_building"),
        F.round("mub", 4).alias("mean_machinery"),
        F.round((F.col("mua") - F.col("mub")) / F.sqrt(se2a + se2b), 6).alias("welch_t"),
        F.round(
            F.pow(se2a + se2b, 2)
            / (F.pow(se2a, 2) / (F.col("na") - 1) + F.pow(se2b, 2) / (F.col("nb") - 1)),
            4,
        ).alias("satterthwaite_df"),
    )


@register(
    "q_categorical_entropy",
    oracle="""
WITH vals AS (
  SELECT 'o_orderstatus' AS col, o_orderstatus AS v FROM orders
  UNION ALL
  SELECT 'o_orderpriority', o_orderpriority FROM orders
),
counts AS (
  SELECT col, v, COUNT(*) AS c FROM vals GROUP BY col, v
),
tot AS (SELECT col, SUM(c) AS t FROM counts GROUP BY col)
SELECT counts.col,
       COUNT(*) AS n_values,
       ROUND(-SUM((1.0 * c / t) * LOG2(1.0 * c / t)), 6) AS entropy_bits,
       ROUND(-SUM((1.0 * c / t) * LOG2(1.0 * c / t)) / LOG2(COUNT(*)), 6)
           AS normalized_entropy
FROM counts JOIN tot ON counts.col = tot.col
GROUP BY counts.col
""",
    tags=("profiling", "entropy"),
)
def q_categorical_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (and its max-normalized form) of the order
    status and priority columns — the column-profiling uniformity
    gauge (1.0 = uniform, →0 = near-constant).

    One stacked value scan, one (col, value) hash-agg, then scalar
    math over the handful of distinct values per column.
    """
    o = _t(spark, sf_dir, "orders")
    vals = o.select(
        F.lit("o_orderstatus").alias("col"), F.col("o_orderstatus").alias("v")
    ).unionByName(
        o.select(F.lit("o_orderpriority").alias("col"), F.col("o_orderpriority").alias("v"))
    )
    counts = vals.groupBy("col", "v").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.groupBy("col").agg(F.sum("c").alias("t"))
    p = F.col("c") * 1.0 / F.col("t")
    ent = -F.sum(p * F.log2(p))
    return (
        counts.join(tot, "col")
        .groupBy("col")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.round(ent, 6).alias("entropy_bits"),
            F.round(ent / F.log2(F.count(F.lit(1))), 6).alias("normalized_entropy"),
        )
    )


@register(
    "q_mutual_information_segment_region",
    oracle="""
WITH obs AS (
  SELECT c.c_mktsegment AS x, r.r_name AS y, COUNT(*) AS c
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
),
tot AS (
  SELECT x, y, c,
         SUM(c) OVER (PARTITION BY x) AS cx,
         SUM(c) OVER (PARTITION BY y) AS cy,
         SUM(c) OVER () AS n
  FROM obs
)
SELECT CAST(SUM(c) AS BIGINT) AS n_customers,
       ROUND(SUM((1.0 * c / n) * LOG2((1.0 * c * n) / (1.0 * cx * cy))), 6)
           AS mutual_information_bits
FROM tot
""",
    tags=("profiling", "mutual-information"),
)
def q_mutual_information_segment_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between market segment and region (bits) —
    the effect-size companion to q_chisq_segment_region's significance
    test, from the same 25-cell contingency table.
    """
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    obs = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("c_mktsegment").alias("x"), F.col("r_name").alias("y"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cx = F.sum("c").over(W.partitionBy("x"))
    cy = F.sum("c").over(W.partitionBy("y"))
    nn = F.sum("c").over(W.partitionBy())
    tot = obs.select("c", cx.alias("cx"), cy.alias("cy"), nn.alias("n"))
    return tot.agg(
        F.sum("c").cast("long").alias("n_customers"),
        F.round(
            F.sum(
                (F.col("c") * 1.0 / F.col("n"))
                * F.log2(F.col("c") * 1.0 * F.col("n") / (F.col("cx") * 1.0 * F.col("cy")))
            ),
            6,
        ).alias("mutual_information_bits"),
    )


@register(
    "q_ks_statistic_binned",
    oracle="""
WITH labeled AS (
  SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 'a' ELSE 'b' END AS grp,
         CAST(FLOOR(o.o_totalprice / 1000.0) AS BIGINT) AS bin
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
),
counts AS (
  SELECT bin,
         SUM(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS cb
  FROM labeled GROUP BY bin
),
tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM counts),
cdf AS (
  SELECT bin,
         SUM(ca) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) * 1.0 / na AS fa,
         SUM(cb) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) * 1.0 / nb AS fb
  FROM counts, tot
)
SELECT (SELECT CAST(na AS BIGINT) FROM tot) AS n_building,
       (SELECT CAST(nb AS BIGINT) FROM tot) AS n_machinery,
       ROUND(MAX(ABS(fa - fb)), 6) AS ks_statistic
FROM cdf
""",
    tags=("profiling", "ks-test", "distribution"),
)
def q_ks_statistic_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic (on $1000-binned order
    totals) between BUILDING and MACHINERY customers: the supremum gap
    between the two empirical CDFs.

    Binning first is the aggregate-first discipline — the CDF windows
    run over the ≤ few-hundred-row bin table, never the fact table,
    and the discretized KS is exact for the binned distributions.
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    labeled = (
        o.join(c, o.o_custkey == c.c_custkey)
        .where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            F.when(F.col("c_mktsegment") == "BUILDING", "a").otherwise("b").alias("grp"),
            F.floor(F.col("o_totalprice") / 1000.0).cast("long").alias("bin"),
        )
    )
    counts = labeled.groupBy("bin").agg(
        F.sum(F.when(F.col("grp") == "a", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("grp") == "b", 1).otherwise(0)).alias("cb"),
    )
    tot = counts.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    cdf = counts.crossJoin(F.broadcast(tot)).select(
        "na",
        "nb",
        (F.sum("ca").over(w) * 1.0 / F.col("na")).alias("fa"),
        (F.sum("cb").over(w) * 1.0 / F.col("nb")).alias("fb"),
    )
    return cdf.agg(
        F.max("na").cast("long").alias("n_building"),
        F.max("nb").cast("long").alias("n_machinery"),
        F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6).alias("ks_statistic"),
    )


@register(
    "q_theil_index_spend",
    oracle="""
WITH spend AS (
  SELECT o_custkey, SUM(o_totalprice) AS x FROM orders GROUP BY o_custkey
),
m AS (SELECT AVG(x) AS mu, COUNT(*) AS n FROM spend)
SELECT CAST(n AS BIGINT) AS n_customers,
       ROUND(SUM((x / mu) * LN(x / mu)) / n, 6) AS theil_t,
       ROUND(-SUM(LN(x / mu)) / n, 6) AS theil_l
FROM spend, m
GROUP BY n
""",
    tags=("profiling", "theil", "inequality"),
)
def q_theil_index_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T and L inequality indices of customer spend — the
    decomposable cousins of q_customer_spend_gini (0 = equal; T
    emphasizes the top, L the bottom of the distribution).

    One spend hash-agg, a broadcast 1-row mean, and scalar log math —
    no ranking sort at all, which is why Theil (not Gini) is the
    at-scale inequality metric of choice.
    """
    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("x"))
    m = spend.agg(F.avg("x").alias("mu"), F.count(F.lit(1)).alias("n"))
    r = F.col("x") / F.col("mu")
    return (
        spend.crossJoin(F.broadcast(m))
        .groupBy("n")
        .agg(
            F.round(F.sum(r * F.log(r)) / F.first("n"), 6).alias("theil_t"),
            F.round(-F.sum(F.log(r)) / F.first("n"), 6).alias("theil_l"),
        )
        .select(
            F.col("n").cast("long").alias("n_customers"), "theil_t", "theil_l"
        )
    )


@register(
    "q_source_diversity_indices",
    oracle="""
WITH counts AS (
  SELECT lang, source, COUNT(*) AS c FROM documents GROUP BY lang, source
),
tot AS (SELECT lang, SUM(c) AS t FROM counts GROUP BY lang)
SELECT counts.lang,
       COUNT(*) AS n_sources,
       ROUND(-SUM((1.0 * c / t) * LN(1.0 * c / t)), 6) AS shannon,
       ROUND(1.0 / SUM(POW(1.0 * c / t, 2)), 6) AS inverse_simpson
FROM counts JOIN tot ON counts.lang = tot.lang
GROUP BY counts.lang
""",
    tags=("profiling", "diversity"),
)
def q_source_diversity_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mix diversity per language: richness, Shannon index, and
    inverse Simpson (the 'effective number of sources') — the corpus
    balance check before mixture weighting.
    """
    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.groupBy("lang").agg(F.sum("c").alias("t"))
    p = F.col("c") * 1.0 / F.col("t")
    return (
        counts.join(tot, "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sources"),
            F.round(-F.sum(p * F.log(p)), 6).alias("shannon"),
            F.round(1.0 / F.sum(F.pow(p, 2)), 6).alias("inverse_simpson"),
        )
    )
