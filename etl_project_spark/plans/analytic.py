"""Analytic surface wave 2: window analytics, statistical aggregates,
map/array/sequence functions, unpivot, deterministic sampling.

The reference has none of these (SURVEY.md §2.5); the north star
requires the full analytic operator set. Everything here is a single
declarative plan with an exact DuckDB oracle — see each query's scale
note for the intended physical shape at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_project_spark.catalog import read_table
from etl_project_spark.plans.registry import register
from etl_project_spark.session import tune_session


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return read_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Window analytics beyond rank/lag: lead, ntile, percent_rank/cume_dist,
# first/last/nth_value with explicit frames, and a value-based RANGE frame.
# All partition by a bounded key (custkey/brand/status) so no window ever
# needs a single global reducer — the 100 TB rule for window functions.
# --------------------------------------------------------------------------
@register(
    "q_window_lead_next_order",
    oracle="""
SELECT o_custkey,
       o_orderkey,
       DATEDIFF('day', o_orderdate,
                LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey))
           AS days_to_next
FROM orders
""",
    tags=("window",),
)
def q_window_lead_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAD over per-customer order history: days until the next order.

    Forward-looking twin of `q_window_lag_gap_days`. One shuffle on
    o_custkey, in-partition sort on (date, key) — deterministic under
    ties because the unique orderkey is in the sort.
    """
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.lead("o_orderdate").over(w), F.col("o_orderdate")).alias("days_to_next"),
    )


@register(
    "q_ntile_acctbal_quartiles",
    oracle="""
WITH q AS (
  SELECT c_mktsegment,
         NTILE(4) OVER (PARTITION BY c_mktsegment
                        ORDER BY c_acctbal, c_custkey) AS quartile,
         c_acctbal
  FROM customer
)
SELECT c_mktsegment, quartile,
       COUNT(*) AS n_customers,
       ROUND(MIN(c_acctbal), 2) AS min_bal,
       ROUND(MAX(c_acctbal), 2) AS max_bal
FROM q
GROUP BY c_mktsegment, quartile
""",
    tags=("window", "ntile"),
)
def q_ntile_acctbal_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) balance quartiles per market segment.

    Partitioning by segment keeps each window bounded (5 segments), so
    the sort parallelizes across reducers instead of one global ntile —
    at 100 TB a *global* ntile would be a single-reducer sort; the
    scale path for that is approx percentile cutpoints + a join.
    Unique c_custkey in the ORDER BY makes tile assignment
    deterministic under acctbal ties.
    """
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        c.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("c_mktsegment", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
    )


@register(
    "q_percent_rank_parts_in_brand",
    oracle="""
SELECT p_partkey, p_brand,
       ROUND(PERCENT_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice), 6)
           AS price_pr,
       ROUND(CUME_DIST() OVER (PARTITION BY p_brand ORDER BY p_retailprice), 6)
           AS price_cd
FROM part
""",
    tags=("window",),
)
def q_percent_rank_parts_in_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK + CUME_DIST of retail price within each brand.

    Both are tie-aware ((rank-1)/(n-1), peers share values), so the
    price-only ORDER BY is deterministic without a tiebreaker. One
    shuffle on p_brand; output is per-row but narrow.
    """
    p = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy("p_retailprice")
    return p.select(
        "p_partkey",
        "p_brand",
        F.round(F.percent_rank().over(w), 6).alias("price_pr"),
        F.round(F.cume_dist().over(w), 6).alias("price_cd"),
    )


@register(
    "q_first_last_value_frames",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(FIRST_VALUE(o_totalprice) OVER w_run, 2) AS first_price,
       ROUND(LAST_VALUE(o_totalprice) OVER w_full, 2) AS last_price,
       ROUND(NTH_VALUE(o_totalprice, 2) OVER w_full, 2) AS second_price
FROM orders
WINDOW
  w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
  w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    tags=("window", "frame"),
)
def q_first_last_value_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST/LAST/NTH_VALUE with explicit ROWS frames per customer.

    The full-partition frame is spelled out because last_value over the
    default frame (up to CURRENT ROW) is the classic silent-wrong-answer
    window bug. One shuffle on o_custkey serves all three expressions —
    Catalyst collapses same-window functions into one Window node.
    """
    o = _t(spark, sf_dir, "orders")
    ordering = [F.col("o_orderdate"), F.col("o_orderkey")]
    w_run = (
        W.partitionBy("o_custkey").orderBy(*ordering)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_full = (
        W.partitionBy("o_custkey").orderBy(*ordering)
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.first("o_totalprice").over(w_run), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w_full), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w_full), 2).alias("second_price"),
    )


@register(
    "q_range_frame_price_neighbors",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       COUNT(*) OVER w AS n_within_1k,
       ROUND(MIN(o_totalprice) OVER w, 2) AS min_within_1k
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
             RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)
""",
    tags=("window", "frame", "range"),
)
def q_range_frame_price_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: orders within $1000 below each price.

    RANGE frames are peer-inclusive and value-bounded, so the result is
    deterministic under price ties (unlike a ROWS frame). Spark executes
    this with a sliding frame over the sorted partition — no
    re-evaluation per row. Used for density/neighborhood features in
    price-band analyses.
    """
    o = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.count(F.lit(1)).over(w).alias("n_within_1k"),
        F.round(F.min("o_totalprice").over(w), 2).alias("min_within_1k"),
    )


# --------------------------------------------------------------------------
# Statistical aggregates: correlation/covariance/argmin-argmax. All are
# algebraic (single-pass, map-side combinable) — the shuffle carries one
# moment tuple per group, never raw rows.
# --------------------------------------------------------------------------
@register(
    "q_corr_covar_price_qty",
    oracle="""
SELECT l_returnflag,
       ROUND(CORR(l_quantity, l_extendedprice), 4) AS qty_price_corr,
       ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS qty_price_covar,
       ROUND(STDDEV_SAMP(l_extendedprice), 2) AS price_stddev,
       ROUND(VAR_SAMP(l_quantity), 4) AS qty_var
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "stats"),
)
def q_corr_covar_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + covariance + dispersion per return flag.

    All four are algebraic moment aggregates: each map task emits
    (n, Σx, Σy, Σxy, Σx², Σy²)-style partials, so the shuffle is a few
    doubles per (task, group) regardless of input size — the same shape
    that makes Q1 scale.
    """
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_covar"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
    )


@register(
    "q_argmax_order_per_status",
    oracle="""
SELECT o_orderstatus,
       ROUND(ARG_MAX(o_totalprice, o_orderkey), 2) AS newest_price,
       ROUND(ARG_MIN(o_totalprice, o_orderkey), 2) AS oldest_price,
       ROUND(MAX(o_totalprice), 2) AS max_price
FROM orders
GROUP BY o_orderstatus
""",
    tags=("agg", "argmax"),
)
def q_argmax_order_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by: price of the newest/oldest order key per status.

    Single-pass argmin/argmax aggregates replace the self-join-on-max
    anti-pattern (`q_argmin_supplier_per_part` shows the join-back shape
    when the full row is needed). Deterministic because the ordering
    key o_orderkey is unique.
    """
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.max_by("o_totalprice", "o_orderkey"), 2).alias("newest_price"),
        F.round(F.min_by("o_totalprice", "o_orderkey"), 2).alias("oldest_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@register(
    "q_collect_segments_per_nation",
    oracle="""
SELECT n.n_name,
       ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT c.c_mktsegment)), ',') AS segments,
       COUNT(DISTINCT c.c_mktsegment) AS n_segments
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
    tags=("agg", "collect"),
)
def q_collect_segments_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set → sorted CSV of market segments present per nation.

    collect_set is the one non-algebraic agg here — its partial state
    is the value set itself. Safe because the domain (5 segments) is
    tiny; for unbounded domains the scale path is a distinct-then-agg.
    sort_array + array_join canonicalizes the unordered set so the
    oracle hash is stable. Nation joins broadcast (25 rows).
    """
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias("segments"),
            F.count_distinct("c_mktsegment").alias("n_segments"),
        )
    )


# --------------------------------------------------------------------------
# Map / array / sequence function surface over the JSON + vector columns.
# --------------------------------------------------------------------------
@register(
    "q_map_explode_event_props",
    oracle="""
SELECT e.event_type,
       k AS prop_key,
       COUNT(*) AS n,
       CAST(SUM(CAST(JSON_EXTRACT(e.props, '$."' || k || '"') AS INTEGER)) AS BIGINT)
           AS total_value
FROM events e, UNNEST(JSON_KEYS(e.props)) AS t(k)
GROUP BY e.event_type, k
""",
    tags=("map", "json", "explode"),
)
def q_map_explode_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """props JSON → MapType → explode to (key, value) → aggregate.

    The generic dynamic-schema path for semi-structured columns: when
    keys are unknown ahead of time, parse to map<string,int> and
    explode, vs `q_from_json_typed_events`' fixed-struct path. The
    explode multiplies rows by map size *after* column pruning — only
    (event_type, props) are scanned.
    """
    e = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return (
        e.select("event_type", F.explode(m).alias("prop_key", "prop_value"))
        .groupBy("event_type", "prop_key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("prop_value").alias("total_value"),
        )
    )


@register(
    "q_sequence_active_months",
    oracle="""
SELECT gs AS month_start, COUNT(*) AS n_active
FROM orders, UNNEST(GENERATE_SERIES(DATE_TRUNC('month', o_orderdate),
                                    TIMESTAMP '2001-12-01',
                                    INTERVAL 1 MONTH)) AS t(gs)
WHERE o_orderkey % 199 = 0
GROUP BY gs
""",
    tags=("array", "sequence", "explode"),
)
def q_sequence_active_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequence() + explode: month spans from order date to a horizon.

    The row-generating pattern for densifying sparse time series
    (calendar spines, retention tables). The modulo filter bounds the
    fan-out (~80 orders × ≤84 months); at scale the spine join replaces
    per-row sequence when spans are long. Spark `sequence` and DuckDB
    `generate_series` are both end-inclusive with month stepping.
    """
    o = _t(spark, sf_dir, "orders")
    months = F.sequence(
        F.date_trunc("month", F.col("o_orderdate")),
        F.lit("2001-12-01").cast("timestamp"),
        F.expr("interval 1 month"),
    )
    return (
        o.filter(F.col("o_orderkey") % 199 == 0)
        .select(F.explode(months).alias("month_start"))
        .groupBy("month_start")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "q_array_quantize_stats",
    oracle="""
SELECT vec_id,
       LEN(LIST_DISTINCT(LIST_TRANSFORM(embedding[1:8],
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10) AS BIGINT)))) AS n_buckets,
       LIST_AGGREGATE(LIST_TRANSFORM(embedding[1:8],
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10) AS BIGINT)), 'min') AS bucket_min,
       LIST_AGGREGATE(LIST_TRANSFORM(embedding[1:8],
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10) AS BIGINT)), 'max') AS bucket_max
FROM embeddings
""",
    tags=("array", "hof"),
)
def q_array_quantize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform/slice/array_distinct/min/max: quantize an embedding prefix.

    Lambda HOF coverage (transform) plus the flat array kernel set.
    float→double cast happens *before* the ×10 so Spark and DuckDB
    quantize identically (float widening is exact; float arithmetic is
    not). HOFs are CodegenFallback — fine for a per-row 8-element
    array, but hot-path per-element work belongs in explode+codegen or
    Arrow UDFs (see README design rules).
    """
    e = _t(spark, sf_dir, "embeddings")
    q = F.transform(
        F.slice("embedding", 1, 8),
        lambda x: F.floor(x.cast("double") * 10),
    )
    return e.select(
        "vec_id",
        F.size(F.array_distinct(q)).alias("n_buckets"),
        F.array_min(q).alias("bucket_min"),
        F.array_max(q).alias("bucket_max"),
    )


@register(
    "q_unpivot_nation_balances",
    oracle="""
WITH cust AS (
  SELECT c_nationkey AS nk, ROUND(SUM(c_acctbal), 2) AS bal FROM customer GROUP BY 1
), supp AS (
  SELECT s_nationkey AS nk, ROUND(SUM(s_acctbal), 2) AS bal FROM supplier GROUP BY 1
)
SELECT n_name, 'customer_bal' AS side, COALESCE(cust.bal, 0.0) AS balance
FROM nation LEFT JOIN cust ON n_nationkey = cust.nk
UNION ALL
SELECT n_name, 'supplier_bal' AS side, COALESCE(supp.bal, 0.0) AS balance
FROM nation LEFT JOIN supp ON n_nationkey = supp.nk
""",
    tags=("unpivot", "reshape"),
)
def q_unpivot_nation_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot (wide→long): customer vs supplier balance per nation.

    Builds the wide table (two broadcast-joined aggregates), then
    `DataFrame.unpivot` melts the two balance columns into
    (side, balance) rows — the inverse of `q_event_type_pivot`.
    Unpivot is a zero-shuffle projection (each input row emits k rows).
    """
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    cust = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.round(F.sum("c_acctbal"), 2).alias("customer_bal")
    )
    supp = s.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.round(F.sum("s_acctbal"), 2).alias("supplier_bal")
    )
    wide = (
        n.join(cust, n.n_nationkey == cust.nk, "left")
        .join(supp, n.n_nationkey == supp.nk, "left")
        .select(
            "n_name",
            F.coalesce("customer_bal", F.lit(0.0)).alias("customer_bal"),
            F.coalesce("supplier_bal", F.lit(0.0)).alias("supplier_bal"),
        )
    )
    return wide.unpivot(
        ids=["n_name"],
        values=["customer_bal", "supplier_bal"],
        variableColumnName="side",
        valueColumnName="balance",
    )


@register(
    "q_hash_sample_documents",
    oracle="""
SELECT doc_id, lang, source
FROM documents
WHERE CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 = 0
""",
    tags=("sample", "deterministic"),
)
def q_hash_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample via md5(doc_id) bucket — oracle-exact.

    The engine-portable twin of `q_stratified_sample_docs` (whose
    `sampleBy` RNG is engine-specific, hence rows-only): hashing the
    key to a bucket gives a reproducible sample that any engine agrees
    on — the standard trick for holdout splits in training pipelines.
    Map-side filter, no shuffle, pushdown-friendly residual.
    """
    d = _t(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    return d.filter(bucket % 10 == 0).select("doc_id", "lang", "source")


@register(
    "q_grouped_agg_pandas_weighted_disc",
    oracle="""
SELECT l_returnflag,
       ROUND(SUM(l_discount * l_quantity) / SUM(l_quantity), 6) AS weighted_disc
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "pandas-udf", "arrow"),
)
def q_grouped_agg_pandas_weighted_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow grouped-agg pandas UDF: quantity-weighted mean discount.

    The UDAF seam: a ``pandas_udf`` used inside ``groupBy().agg()``
    receives each group's columns as whole Arrow-backed Series — one
    vectorized numpy reduction per group, no per-row Python. This is
    the escape hatch for aggregates Spark lacks (here deliberately one
    the oracle CAN express, so the Arrow path itself is hash-checked;
    the built-in-expressible form would be SUM(x*w)/SUM(w)). Note the
    scale contrast with algebraic aggs: grouped-agg UDFs see full
    groups, so a skewed key materializes its group on one executor —
    salting applies when that matters.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wavg(disc: pd.Series, qty: pd.Series) -> float:
        return float(np.dot(disc.to_numpy(), qty.to_numpy()) / qty.to_numpy().sum())

    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(wavg("l_discount", "l_quantity"), 6).alias("weighted_disc")
    )


@register(
    "q_rolling_hour_user_value",
    oracle="""
SELECT user_id, event_id,
       COUNT(*) OVER w AS n_last_hour,
       ROUND(SUM(value) OVER w, 4) AS value_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT)
             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
""",
    tags=("window", "frame", "range", "events"),
)
def q_rolling_hour_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per-user rolling 1-hour totals.

    The feature-engineering staple (activity in the trailing hour)
    as a value-based frame over epoch seconds — no self-join, no
    explode-into-windows; Spark maintains a sliding frame per sorted
    partition. RANGE semantics make ties (same-second events) peers,
    so the result is deterministic without an id tiebreak.
    """
    e = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_timestamp(F.col("ts")))
        .rangeBetween(-3599, W.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.round(F.sum("value").over(w), 4).alias("value_last_hour"),
    )


@register(
    "q_grouped_map_zscore_docs",
    oracle="""
SELECT doc_id, lang,
       ROUND((n_chars - AVG(n_chars) OVER (PARTITION BY lang))
             / STDDEV_SAMP(n_chars) OVER (PARTITION BY lang), 6) AS z_chars
FROM documents
""",
    tags=("pandas-udf", "arrow", "grouped-map"),
)
def q_grouped_map_zscore_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow grouped-map ``applyInPandas``: within-language z-scores.

    The grouped-*map* seam (full group in, full frame out) — the API
    for per-group model scoring, resampling, or fitting that column
    expressions can't write. Here the body is deliberately
    oracle-expressible (windowed mean/stddev) so the Arrow round-trip
    is hash-checked. ddof=1 matches STDDEV_SAMP; numpy's two-pass
    mean/std on float64 agrees with the window aggregate's moments at
    round-6. Scale note: each group materializes on one executor —
    fine for per-language groups; salt or pre-aggregate when a group
    can exceed executor memory.
    """

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["n_chars"].to_numpy(dtype="float64")
        mu = x.mean()
        sd = x.std(ddof=1)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                "z_chars": ((x - mu) / sd).round(6),
            }
        )

    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", "lang", "n_chars")
        .groupBy("lang")
        .applyInPandas(zscore, schema="doc_id bigint, lang string, z_chars double")
    )


@register(
    "q_regression_aggs_lineitem",
    oracle="""
SELECT l_returnflag,
       ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS price_qty_slope,
       ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 2) AS price_qty_intercept,
       ROUND(REGR_R2(l_extendedprice, l_quantity), 6) AS price_qty_r2,
       REGR_COUNT(l_extendedprice, l_quantity) AS n_pairs
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "stats", "regression"),
)
def q_regression_aggs_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates: OLS slope/intercept/R² per group.

    Like corr/covar these are algebraic moment aggregates — one pass,
    map-side combinable, a handful of doubles per group over the
    shuffle — so fitting a per-group trend line at 100 TB costs the
    same as a SUM.
    """
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("price_qty_slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias(
            "price_qty_intercept"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("price_qty_r2"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n_pairs"),
    )


@register(
    "q_mode_median_aggs",
    oracle="""
SELECT l_returnflag,
       mode(l_linestatus) AS status_mode,
       ROUND(median(l_extendedprice), 4) AS price_median,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "mode", "median"),
)
def q_mode_median_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mode`` and ``median`` aggregates (Spark 3.4+ builtins).

    ``mode(deterministic=True)`` pins tie-breaks to the lowest value so
    both engines agree even if the fixture ever develops a tie (today
    each group has a single clear winner). Median is the interpolated
    0.5-quantile — same arithmetic as DuckDB's ``median``.
    """
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.mode("l_linestatus", deterministic=True).alias("status_mode"),
        F.round(F.median("l_extendedprice"), 4).alias("price_median"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_hll_sketch_rollup",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS merged_within_5pct
FROM events
GROUP BY event_type
""",
    tags=("sketch", "hll", "rollup"),
)
def q_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct counting via DataSketches HLL
    (Spark 3.5+ ``hll_sketch_agg`` / ``hll_union_agg``).

    The two-level shape is the point: per-(type, day) sketches build
    in one pass, then MERGE to per-type totals without touching the
    raw data again — the pattern that lets a 100 TB pipeline keep
    daily sketch partitions and serve any rollup (weekly, all-time)
    by unioning kilobyte-sized sketches. ``approx_count_distinct``
    can't do this: its result is a number, not a mergeable state.
    Oracle contract: exact distinct per type plus a pinned-TRUE 5%
    tolerance flag on the merged estimate (sketch bytes are
    engine-specific; the estimate's error is not).
    """
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("_est")
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return exact.join(merged, "event_type").select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("_est") - F.col("exact_users")) / F.col("exact_users")
            <= 0.05
        ).alias("merged_within_5pct"),
    )


@register(
    "q_listagg_nations_per_region",
    oracle="""
SELECT r.r_name,
       string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
    tags=("agg", "listagg"),
)
def q_listagg_nations_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (``listagg``, Spark 4 ≙ SQL:2016 /
    DuckDB ``string_agg``). The WITHIN-GROUP ordering makes the result
    deterministic — unordered listagg is engine-dependent and would
    never hash-match.
    """
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.expr(
                "listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)"
            ).alias("nations")
        )
    )


@register(
    "q_grouping_id_totals",
    oracle="""
SELECT CAST(GROUPING(o_orderstatus) AS BIGINT) AS is_total,
       o_orderstatus,
       COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), ())
""",
    tags=("agg", "grouping-sets"),
)
def q_grouping_id_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() marker distinguishing subtotal rows from real NULL
    group keys — the disambiguation every rollup report needs (a NULL
    status group and the grand-total row both print NULL without it)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupingSets([["o_orderstatus"], []], "o_orderstatus").agg(
        F.grouping("o_orderstatus").cast("bigint").alias("is_total"),
        F.count(F.lit(1)).alias("n_orders"),
    ).select("is_total", "o_orderstatus", "n_orders")


@register(
    "q_lead_ignore_nulls_events",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN event_type = 'purchase' THEN event_id END AS purchase_ev
  FROM events WHERE user_id < 20
)
SELECT user_id, event_id,
       lead(purchase_ev IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS next_purchase_id
FROM flagged
""",
    tags=("window", "ignore-nulls"),
)
def q_lead_ignore_nulls_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``lead(..., ignoreNulls)``: for every event, the id of the
    user's NEXT purchase (skipping non-purchase events) — the funnel
    "time to next conversion" primitive, one window pass instead of a
    self-join against the purchase subset."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "purchase", F.col("event_id")).alias(
            "purchase_ev"
        ),
    )
    # PySpark's lead() helper has no ignoreNulls parameter — the SQL
    # expression form is the supported spelling.
    return flagged.select(
        "user_id",
        "event_id",
        F.expr(
            "lead(purchase_ev) IGNORE NULLS OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id)"
        ).alias("next_purchase_id"),
    )


@register(
    "q_percentile_disc_prices",
    oracle="""
SELECT o_orderstatus,
       quantile_disc(o_totalprice, 0.25) AS p25,
       quantile_disc(o_totalprice, 0.5) AS p50,
       quantile_disc(o_totalprice, 0.75) AS p75
FROM orders
GROUP BY o_orderstatus
""",
    tags=("agg", "percentile"),
)
def q_percentile_disc_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (an actual data value, no interpolation) —
    exact-value comparable across engines with no float arithmetic at
    all, unlike the continuous variant which interpolates."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)").alias("p25"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").alias("p50"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice)").alias("p75"),
    )


@register(
    "q_bitmap_distinct_rollup",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users
FROM events
GROUP BY event_type
""",
    tags=("sketch", "bitmap", "rollup"),
)
def q_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT re-aggregatable distinct counting via bitmaps (Spark 3.5
    ``bitmap_construct_agg`` / ``bitmap_or_agg``).

    Same two-level merge shape as the HLL rollup but lossless: dense
    integer keys pack into fixed 4KB bitmap buckets built per
    (type, day), OR-merged to per-type totals, popcounted. Where HLL
    trades error for unbounded domains, bitmaps give exact counts when
    keys are bounded ints (user ids, row ids) — the right tool below
    ~billions of dense keys. The oracle is the plain exact distinct:
    the bitmap pipeline must reproduce it bit-for-bit or the hash
    compare fails (unlike the HLL query's tolerance contract).
    """
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        F.bitmap_bucket_number("user_id").alias("bucket"),
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm")
    )
    return (
        daily.groupBy("event_type", "bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .groupBy("event_type")
        .agg(F.sum(F.bitmap_count("bm")).alias("exact_users"))
    )


@register(
    "q_monthly_cohort_retention",
    oracle="""
WITH firsts AS (
  SELECT o_custkey, MIN(DATE_TRUNC('month', o_orderdate)) AS cohort_month
  FROM orders GROUP BY o_custkey
), cohort_sizes AS (
  SELECT cohort_month, COUNT(*) AS cohort_size
  FROM firsts GROUP BY cohort_month
), activity AS (
  SELECT DISTINCT o_custkey, DATE_TRUNC('month', o_orderdate) AS active_month
  FROM orders
)
SELECT f.cohort_month,
       CAST(DATE_DIFF('month', f.cohort_month, a.active_month) AS INTEGER)
         AS months_since,
       COUNT(*) AS active_customers,
       s.cohort_size,
       ROUND(1.0 * COUNT(*) / s.cohort_size, 4) AS retention
FROM activity a
JOIN firsts f ON f.o_custkey = a.o_custkey
JOIN cohort_sizes s ON s.cohort_month = f.cohort_month
GROUP BY f.cohort_month, DATE_DIFF('month', f.cohort_month, a.active_month),
         s.cohort_size
""",
    tags=("analytic", "cohort", "retention"),
)
def q_monthly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly cohort retention: of customers whose first order fell in
    month M, what fraction ordered again N months later.

    The product-analytics staple as three hash aggregates and two
    joins: first-order month per customer (one agg), cohort sizes (an
    agg over THAT — rows ≙ months, trivially broadcast), distinct
    (customer, active-month) pairs (one agg with map-side dedup), then
    an equi-join on customer. months_between of two month-start
    timestamps is integral by construction, so the bucket arithmetic
    is exact — no day-fraction drift between engines.
    """
    o = _t(spark, sf_dir, "orders")
    # Examined r17, left alone: firsts feeds two consumers (sizes +
    # join) so the orders agg runs twice, but persisting+materializing
    # it measured SLOWER (~0.5 s recompute vs ~0.9 s cached reps at
    # sf0.1) — the cache-build job costs more than the cheap re-agg.
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("cohort_month")
    )
    sizes = firsts.groupBy("cohort_month").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    activity = o.select(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("active_month")
    ).distinct()
    return (
        activity.join(firsts, "o_custkey")
        .join(F.broadcast(sizes), "cohort_month")
        .groupBy(
            "cohort_month",
            F.months_between("active_month", "cohort_month")
            .cast("int")
            .alias("months_since"),
            "cohort_size",
        )
        .agg(F.count(F.lit(1)).alias("active_customers"))
        .select(
            "cohort_month",
            "months_since",
            "active_customers",
            "cohort_size",
            F.round(F.col("active_customers") / F.col("cohort_size"), 4).alias(
                "retention"
            ),
        )
    )


@register(
    "q_mad_outlier_prices",
    oracle="""
WITH med AS (
  SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS m
  FROM lineitem GROUP BY l_returnflag
), dev AS (
  SELECT l.l_returnflag, l.l_extendedprice, med.m,
         ABS(l.l_extendedprice - med.m) AS ad
  FROM lineitem l JOIN med ON l.l_returnflag = med.l_returnflag
), mad AS (
  SELECT l_returnflag, quantile_cont(ad, 0.5) AS mad FROM dev
  GROUP BY l_returnflag
)
SELECT dev.l_returnflag,
       ROUND(ANY_VALUE(dev.m), 4) AS median_price,
       ROUND(ANY_VALUE(mad.mad), 4) AS mad_price,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN dev.ad > 3 * mad.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev JOIN mad ON dev.l_returnflag = mad.l_returnflag
GROUP BY dev.l_returnflag
""",
    tags=("stats", "outlier", "robust"),
)
def q_mad_outlier_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per group: median absolute deviation.

    The robust twin of z-score outlier flagging
    (`q_grouped_map_zscore_docs`): median/MAD are breakdown-resistant,
    so a contaminated group can't hide its own outliers by inflating
    the stddev — the standard screen for corrupt numeric feeds in a
    data-quality gate. Flag = |x - median| > 3·MAD.

    Two aggregate passes (median, then median-of-deviations) with the
    tiny per-group stat broadcast back each time — the group keyspace
    (3 flags) is config-sized, so both joins are broadcasts and the
    lineitem scan is the only large input, read twice. Spark
    `percentile` = DuckDB `quantile_cont` (same rank interpolation),
    the device proven by `q_source_length_quantiles`.
    """
    tune_session(spark)
    li = read_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5D)").alias("m")
    )
    dev = li.join(F.broadcast(med), "l_returnflag").withColumn(
        "ad", F.abs(F.col("l_extendedprice") - F.col("m"))
    )
    mad = dev.groupBy("l_returnflag").agg(F.expr("percentile(ad, 0.5D)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.first("m"), 4).alias("median_price"),
            F.round(F.first("mad"), 4).alias("mad_price"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("ad") > 3 * F.col("mad"), 1).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
    )


@register(
    "q_domain_quota_cap",
    oracle="""
SELECT source, doc_id, CAST(rn AS INTEGER) AS pick_rank
FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
) WHERE rn <= 15
""",
    tags=("sampling", "quota", "llm"),
)
def q_domain_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota cap: keep at most 15 documents per source,
    chosen by deterministic hash rank — the crawl-curation guard
    against any one domain flooding the training mixture (the cap
    complements `q_mixture_resample`'s RATE sampling: a rate still
    lets a mega-domain dominate in absolute count; a quota cannot).

    md5-hex rank order is engine-portable (`q_hash_sample_documents`'s
    device), with doc_id tiebreak. Scale note: the window partitions
    by source; a pathological mega-domain makes one long partition,
    for which the standard refinement is two-phase top-k (per-task
    heap, then merge) — at the cap of 15 the carried state is
    constant either way.
    """
    d = _t(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("source", "doc_id")
        .withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= 15)
    )


@register(
    "q_deterministic_shard_assignment",
    oracle="""
WITH sharded AS (
  SELECT CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 16
           AS shard,
         n_chars, source
  FROM documents
), tot AS (SELECT COUNT(*) AS n FROM documents)
SELECT shard,
       COUNT(*) AS n_docs,
       SUM(n_chars) AS total_chars,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       ROUND(COUNT(*) * 16.0 / (SELECT n FROM tot), 4) AS load_ratio
FROM sharded
GROUP BY shard
""",
    tags=("curation", "sharding", "deterministic"),
)
def q_deterministic_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment + balance audit: route
    every document to one of 16 shards by the engine-portable md5 hash
    of its id, then profile each shard (doc count, payload mass, source
    diversity, load vs perfect balance). This is the step that turns a
    curated corpus into the fixed shard files a training run consumes —
    reproducible across engines and reruns, no RNG.

    Scale shape: the shard id is a map-side projection; one hash
    aggregate with EXACTLY n_shards groups (no skew by construction —
    md5 is uniform, so load_ratio ~= 1.0 at any corpus size; a ratio
    drifting from 1 IS the audit signal). The global doc count arrives
    as a 1-row broadcast scalar. At 100 TB the same plan writes the
    shards with df.write.partitionBy(shard) — the audit and the layout
    share the projection."""
    tune_session(spark)
    d = _t(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 16
    ).alias("shard")
    tot = d.select(F.count(F.lit(1)).alias("_n"))
    return (
        d.select(shard, "n_chars", "source")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("source").cast("long").alias("n_sources"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "shard",
            "n_docs",
            "total_chars",
            "n_sources",
            F.round(F.col("n_docs") * 16.0 / F.col("_n"), 4).alias("load_ratio"),
        )
    )
