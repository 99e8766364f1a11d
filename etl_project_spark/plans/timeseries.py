"""Time-series analytics: OHLC bars, period-over-period growth, EWMA,
sweep-line interval concurrency, transition matrices, histograms, RFM.

The reference (a pandas scraping script, ``flows/etl.py``) has none of
these; they round out the north-star analytic surface (SURVEY.md §2.5)
with the time-series shapes a warehouse team actually runs. Every query
is a declarative plan with an exact DuckDB oracle; each docstring
carries the 100 TB physical-shape argument.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_project_spark.catalog import read_table
from etl_project_spark.plans.registry import register
from etl_project_spark.session import tune_session


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return read_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# OHLC resampling: the canonical time-series downsample (tick data ->
# bars). first/last are argmin/argmax by (ts, event_id) — single-pass
# hash aggregate, no window, no sort. At 100 TB this is one shuffle on
# (event_type, hour) with map-side partial aggregation; the unique
# event_id tiebreak makes open/close deterministic under equal ts.
# --------------------------------------------------------------------------
@register(
    "q_ohlc_hourly_value",
    oracle="""
SELECT event_type,
       DATE_TRUNC('hour', ts) AS bar_hour,
       FIRST(value ORDER BY ts, event_id) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       LAST(value ORDER BY ts, event_id) AS close,
       COUNT(*) AS volume,
       ROUND(SUM(value), 4) AS total_value
FROM events
GROUP BY event_type, DATE_TRUNC('hour', ts)
""",
    tags=("timeseries", "ohlc", "resample"),
)
def q_ohlc_hourly_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample the event stream to hourly OHLC bars per event type.

    ``min_by``/``max_by`` on a (ts, event_id) struct give open/close in
    the same single-pass aggregate as high/low/volume — no window sort,
    no self-join. The streaming twin is a tumbling ``window(ts, '1
    hour')`` with the identical aggregate list.
    """
    e = _t(spark, sf_dir, "events")
    okey = F.struct(F.col("ts"), F.col("event_id"))
    return e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bar_hour")
    ).agg(
        F.min_by("value", okey).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", okey).alias("close"),
        F.count(F.lit(1)).alias("volume"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


# --------------------------------------------------------------------------
# Period-over-period growth: aggregate-then-window. The lag runs over
# the ~80-row monthly aggregate, not the base table, so the global
# (unpartitioned) window is a deliberate post-reduction step — the
# 100 TB rule is "never window the fact table globally", and this
# plan reduces first (one hash-agg shuffle) before the tiny sort.
# --------------------------------------------------------------------------
@register(
    "q_mom_revenue_growth",
    oracle="""
WITH monthly AS (
  SELECT DATE_TRUNC('month', o_orderdate) AS month,
         SUM(o_totalprice) AS revenue
  FROM orders
  GROUP BY 1
)
SELECT month,
       ROUND(revenue, 2) AS revenue,
       ROUND(100.0 * (revenue - LAG(revenue) OVER (ORDER BY month))
             / LAG(revenue) OVER (ORDER BY month), 4) AS growth_pct,
       ROUND(100.0 * (revenue - LAG(revenue, 12) OVER (ORDER BY month))
             / LAG(revenue, 12) OVER (ORDER BY month), 4) AS yoy_pct
FROM monthly
""",
    tags=("timeseries", "growth", "window"),
)
def q_mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth.

    Hash-aggregate to monthly totals first (map-side combine), then
    LAG(1) and LAG(12) over the month axis. Growth is computed on the
    unrounded sums — a double sum differs between engines only at
    ~1e-10 relative, far inside the 4-decimal rounding.
    """
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.sum("o_totalprice").alias("revenue")
    )
    w = W.orderBy("month")
    prev = F.lag("revenue").over(w)
    prev12 = F.lag("revenue", 12).over(w)
    return monthly.select(
        "month",
        F.round("revenue", 2).alias("revenue"),
        F.round(100.0 * (F.col("revenue") - prev) / prev, 4).alias("growth_pct"),
        F.round(100.0 * (F.col("revenue") - prev12) / prev12, 4).alias("yoy_pct"),
    )


# --------------------------------------------------------------------------
# RFM segmentation: the classic CRM rollup. Recency/frequency/monetary
# per customer (one hash-agg), quartile labels via NTILE, then a
# segment-level rollup. The NTILE windows order the *customer-level*
# aggregate (1 row per customer), tie-broken by the unique custkey so
# both engines assign identical quartiles. At 100 TB the exact-NTILE
# step becomes approx-quantile cut points + a broadcast range lookup —
# same output contract, no global sort; the exact form is kept here
# because it is oracle-checkable.
# --------------------------------------------------------------------------
@register(
    "q_rfm_segments",
    oracle="""
WITH anchor AS (SELECT MAX(o_orderdate) AS max_d FROM orders),
rfm AS (
  SELECT o_custkey,
         DATEDIFF('day', MAX(o_orderdate), (SELECT max_d FROM anchor)) AS recency_days,
         COUNT(*) AS frequency,
         SUM(o_totalprice) AS monetary
  FROM orders
  GROUP BY o_custkey
),
scored AS (
  SELECT o_custkey, monetary,
         NTILE(4) OVER (ORDER BY recency_days, o_custkey) AS r_q,
         NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_q,
         NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_q
  FROM rfm
)
SELECT CONCAT('R', r_q, 'F', f_q, 'M', m_q) AS segment,
       COUNT(*) AS n_customers,
       ROUND(AVG(monetary), 2) AS avg_monetary
FROM scored
GROUP BY 1
""",
    tags=("timeseries", "rfm", "segmentation"),
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartile segmentation of customers from their order history.

    Recency anchored to the corpus max order date (scalar agg,
    broadcast). Quartiles: best = 1 on every axis (most recent, most
    frequent, highest spend), so 'R1F1M1' is the champion segment.

    Each quartile is ANSI NTILE(4) computed ARITHMETICALLY from the
    two-phase bucketed global rank (`two_phase.bucketed_global_rank` +
    `ntile_from_rank`) — the r9 sweep caught this query running three
    global NTILE windows over every customer through one task, the
    same entity-scale disease distributed out of gini/pareto/packing
    this round. Three bucketed ranks cost three bounded shuffles; no
    window frame here grows with the customer count.
    """
    from etl_project_spark.plans.two_phase import (
        bucketed_global_rank,
        ntile_from_rank,
    )

    o = _t(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("max_d"))
    rfm = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_d"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("o_totalprice").alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("max_d", "last_d").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    n = rfm.agg(F.count(F.lit(1)).alias("_n"))
    ranked = bucketed_global_rank(
        rfm, "recency_days", ["o_custkey"]
    ).withColumnRenamed("i", "_ri")
    ranked = bucketed_global_rank(
        ranked, "frequency", ["o_custkey"], descending=True
    ).withColumnRenamed("i", "_fi")
    ranked = bucketed_global_rank(
        ranked, "monetary", ["o_custkey"], descending=True
    ).withColumnRenamed("i", "_mi")
    scored = ranked.crossJoin(F.broadcast(n)).select(
        "monetary",
        ntile_from_rank(F.col("_ri"), F.col("_n"), 4).alias("r_q"),
        ntile_from_rank(F.col("_fi"), F.col("_n"), 4).alias("f_q"),
        ntile_from_rank(F.col("_mi"), F.col("_n"), 4).alias("m_q"),
    )
    return scored.groupBy(
        F.concat(F.lit("R"), "r_q", F.lit("F"), "f_q", F.lit("M"), "m_q").alias("segment")
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("monetary"), 2).alias("avg_monetary"),
    )


# --------------------------------------------------------------------------
# Sweep-line interval concurrency with a DISTRIBUTED prefix sum. The
# naive plan is a running sum over one global ordering — a single
# reducer, dead at scale. This plan is the textbook two-phase scan:
# (1) running sum WITHIN each month partition, (2) a carry-in per month
# from the cumulative month totals (a ~#months-row window, broadcast
# back). Identical answer, shuffle bounded by the month hash.
# --------------------------------------------------------------------------
@register(
    "q_max_concurrent_open_orders",
    oracle="""
WITH iv AS (
  SELECT o.o_orderkey, o.o_orderdate AS open_ts, MAX(l.l_shipdate) AS close_ts
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate
),
deltas AS (
  SELECT open_ts AS ts, 1 AS d, o_orderkey FROM iv
  UNION ALL
  SELECT close_ts AS ts, -1 AS d, o_orderkey FROM iv
),
running AS (
  SELECT ts, SUM(d) OVER (ORDER BY ts, d DESC, o_orderkey
                          ROWS UNBOUNDED PRECEDING) AS open_now
  FROM deltas
)
SELECT DATE_TRUNC('month', ts) AS month,
       CAST(MAX(open_now) AS BIGINT) AS max_open
FROM running
GROUP BY 1
""",
    tags=("timeseries", "sweepline", "intervals"),
)
def q_max_concurrent_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak number of simultaneously open orders per month (sweep line).

    An order is open from o_orderdate until its last lineitem ships.
    Opens sort before closes at equal timestamps (d DESC), so touching
    intervals count as concurrent; the orderkey tiebreak makes the
    running sum's row order deterministic (the per-month MAX is
    invariant to permutations within an equal (ts, d) group).

    Distributed prefix sum: in-month running totals + an exclusive
    cumulative carry over the tiny month-total frame, joined back via
    broadcast — no global ordering ever materializes.
    """
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # Examined r17, left alone: the close aggregate re-derives 4x
    # through the union fan-out, but both persist variants measured
    # slower-or-unprovable on this host (month-keyed deltas
    # persist+count: ~1.5 vs ~1.9 s across 5 interleaved cross-checkout
    # sessions; bare iv persist: no clean-host win either) — the
    # duplicated join+agg is cheaper than its cache materialization at
    # sf0.1, same boundary as q_monthly_cohort_retention.
    iv = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("close_ts"))
    )
    deltas = iv.select(
        F.col("o_orderdate").alias("ts"), F.lit(1).alias("d"), "o_orderkey"
    ).unionAll(
        iv.select(F.col("close_ts").alias("ts"), F.lit(-1).alias("d"), "o_orderkey")
    )
    deltas = deltas.withColumn("month", F.date_trunc("month", "ts"))
    w_in = (
        W.partitionBy("month")
        .orderBy("ts", F.desc("d"), "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    in_month = deltas.withColumn("run_in", F.sum("d").over(w_in))
    totals = deltas.groupBy("month").agg(F.sum("d").alias("mtot"))
    w_carry = W.orderBy("month").rowsBetween(W.unboundedPreceding, -1)
    carry = totals.withColumn("carry", F.coalesce(F.sum("mtot").over(w_carry), F.lit(0)))
    return (
        in_month.join(F.broadcast(carry.select("month", "carry")), "month")
        .groupBy("month")
        .agg(F.max(F.col("run_in") + F.col("carry")).cast("long").alias("max_open"))
    )


# --------------------------------------------------------------------------
# Markov transition matrix over the event stream: P(next_type | type)
# per user-ordered sequence. One shuffle on user_id for the LAG, one
# hash-agg on the (prev, next) pair (25 output rows regardless of
# corpus size), and the normalizing window runs over that tiny frame.
# --------------------------------------------------------------------------
@register(
    "q_event_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type,
       COUNT(*) AS n_transitions,
       ROUND(COUNT(*) * 1.0 /
             SUM(COUNT(*)) OVER (PARTITION BY prev_type), 6) AS prob
FROM seq
WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
""",
    tags=("timeseries", "markov", "sequence"),
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition counts and row-normalized probabilities.

    The conditional probability divides by the per-prev_type total via
    a window over the aggregated matrix (|types|² rows), not the raw
    stream.
    """
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.withColumn("prev_type", F.lag("event_type").over(w)).where(
        F.col("prev_type").isNotNull()
    )
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    w_row = W.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") * 1.0 / F.sum("n_transitions").over(w_row), 6
        ).alias("prob"),
    )


# --------------------------------------------------------------------------
# Equi-width histogram: embarrassingly parallel binning. Min/max are a
# scalar aggregate broadcast to every task; the bin id is pure
# arithmetic inside whole-stage codegen and the final agg is a 20-row
# hash aggregate. (The equi-DEPTH twin is q_ntile_acctbal_quartiles /
# q_percentiles_order_value.) Both engines evaluate the identical
# double expression, so bin boundaries match bit-for-bit.
# --------------------------------------------------------------------------
@register(
    "q_equiwidth_price_histogram",
    oracle="""
WITH b AS (
  SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi FROM lineitem
)
SELECT CAST(LEAST(FLOOR((l_extendedprice - b.lo) / ((b.hi - b.lo) / 20.0)), 19)
            AS INTEGER) AS bin_id,
       ROUND(MIN(l_extendedprice), 2) AS bin_min,
       ROUND(MAX(l_extendedprice), 2) AS bin_max,
       COUNT(*) AS n_items,
       ROUND(AVG(l_extendedprice), 2) AS avg_price
FROM lineitem, b
GROUP BY 1
""",
    tags=("timeseries", "histogram",),
)
def q_equiwidth_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bin equi-width histogram of lineitem extended price.

    The top boundary value folds into the last bin (LEAST(..., 19)),
    the standard closed-right convention for the max element.
    """
    li = _t(spark, sf_dir, "lineitem")
    b = li.agg(F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / 20.0
    binned = li.crossJoin(F.broadcast(b)).withColumn(
        "bin_id",
        F.least(F.floor((F.col("l_extendedprice") - F.col("lo")) / width), F.lit(19))
        .cast("integer"),
    )
    return binned.groupBy("bin_id").agg(
        F.round(F.min("l_extendedprice"), 2).alias("bin_min"),
        F.round(F.max("l_extendedprice"), 2).alias("bin_max"),
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
    )


# --------------------------------------------------------------------------
# EWMA by left fold over the time-ordered per-user sequence. Both
# engines seed the fold with the first observation and apply
# acc*(1-α) + x*α in the identical order, so the doubles are
# bit-identical before rounding. The collected array is bounded by
# per-user activity (the partition key), never the corpus — the same
# contract as every applyInPandas sequence op in this repo; a
# segmented scan (running-sum trick in log space) is the fallback for
# pathological single-key users.
# --------------------------------------------------------------------------
_EWMA_ALPHA = 0.3


@register(
    "q_ewma_user_value",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, LIST(value ORDER BY ts, event_id) AS vals
  FROM events
  GROUP BY user_id
)
SELECT user_id,
       CAST(LEN(vals) AS BIGINT) AS n_events,
       ROUND(LIST_REDUCE(vals,
             (acc, x) -> acc * {1.0 - _EWMA_ALPHA} + x * {_EWMA_ALPHA}), 6)
           AS ewma_value
FROM ordered
""",
    tags=("timeseries", "ewma", "fold"),
)
def q_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of event value per user.

    s₁ = x₁; sₙ = (1-α)·sₙ₋₁ + α·xₙ with α = 0.3; reports the final
    smoothed value per user. Spark folds with F.aggregate over the
    sorted array; DuckDB's LIST_REDUCE seeds with element 1 — the exact
    same recurrence.
    """
    e = _t(spark, sf_dir, "events")
    collected = e.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))).alias("seq")
    )
    a = _EWMA_ALPHA
    return collected.select(
        "user_id",
        F.size("seq").cast("long").alias("n_events"),
        F.round(
            F.aggregate(
                F.expr("slice(seq, 2, size(seq) - 1)"),
                F.element_at("seq", 1)["value"].cast("double"),
                lambda acc, x: acc * (1.0 - a) + x["value"] * a,
            ),
            6,
        ).alias("ewma_value"),
    )


@register(
    "q_user_value_drawdown",
    oracle="""
WITH cum AS (
  SELECT user_id, ts, event_id,
         SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_value
  FROM events
),
peaked AS (
  SELECT user_id, cum_value,
         MAX(cum_value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_peak
  FROM cum
)
SELECT user_id,
       ROUND(MAX(run_peak - cum_value), 4) AS max_drawdown,
       ROUND(MAX(run_peak), 4) AS peak_value
FROM peaked
GROUP BY user_id
""",
    tags=("timeseries", "drawdown", "window"),
)
def q_user_value_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each user's cumulative event value: the
    deepest drop from a running peak — two stacked windows (running
    sum, running max of it) over ONE per-user sort, then a hash-agg.

    The financial risk metric as pure window algebra; both windows
    share the (user_id, ts, event_id) sort so Spark plans a single
    WindowExec pair after one shuffle. Values are corpus doubles
    summed in identical per-user order → bit-identical before
    rounding.
    """
    e = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("value").over(w)
    tagged = e.select("user_id", "ts", "event_id", "value").withColumn(
        "cum_value", cum
    )
    peaked = tagged.withColumn(
        "run_peak",
        F.max("cum_value").over(
            W.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return peaked.groupBy("user_id").agg(
        F.round(F.max(F.col("run_peak") - F.col("cum_value")), 4).alias("max_drawdown"),
        F.round(F.max("run_peak"), 4).alias("peak_value"),
    )


@register(
    "q_seasonal_revenue_index",
    oracle="""
WITH monthly AS (
  SELECT DATE_TRUNC('month', o_orderdate) AS month,
         EXTRACT(month FROM o_orderdate) AS moy,
         SUM(o_totalprice) AS revenue
  FROM orders
  GROUP BY 1, 2
),
overall AS (SELECT AVG(revenue) AS grand_avg FROM monthly)
SELECT CAST(moy AS INTEGER) AS month_of_year,
       COUNT(*) AS n_months,
       ROUND(AVG(revenue), 2) AS avg_revenue,
       ROUND(AVG(revenue) / grand_avg, 6) AS seasonal_index
FROM monthly, overall
GROUP BY moy, grand_avg
""",
    tags=("timeseries", "seasonality"),
)
def q_seasonal_revenue_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical multiplicative seasonal indices: each calendar month's
    average revenue relative to the all-months average (index > 1 =
    seasonally strong month).

    Aggregate-first twice over: monthly totals (one fact-table
    hash-agg), then the 12-row month-of-year rollup against a 1-row
    broadcast grand mean. The deseasonalization step (revenue / index)
    is a broadcast join of the 12-row index table back onto any
    monthly series.
    """
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month"),
        F.month("o_orderdate").alias("moy"),
    ).agg(F.sum("o_totalprice").alias("revenue"))
    overall = monthly.agg(F.avg("revenue").alias("grand_avg"))
    per_moy = monthly.groupBy(F.col("moy").cast("integer").alias("month_of_year")).agg(
        F.count(F.lit(1)).alias("n_months"),
        F.avg("revenue").alias("avg_rev"),
    )
    return per_moy.crossJoin(F.broadcast(overall)).select(
        "month_of_year",
        "n_months",
        F.round("avg_rev", 2).alias("avg_revenue"),
        F.round(F.col("avg_rev") / F.col("grand_avg"), 6).alias("seasonal_index"),
    )


@register(
    "q_seasonal_naive_backtest",
    oracle="""
WITH hourly AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS h, COUNT(*) AS actual
  FROM events
  GROUP BY 1, 2
),
joined AS (
  SELECT a.event_type, a.h, a.actual, p.actual AS predicted
  FROM hourly a
  JOIN hourly p
    ON p.event_type = a.event_type
   AND p.h = a.h - INTERVAL 7 DAY
)
SELECT event_type,
       COUNT(*) AS n_hours,
       ROUND(AVG(ABS(actual - predicted)), 4) AS mae,
       ROUND(AVG(actual), 4) AS mean_actual
FROM joined
GROUP BY event_type
""",
    tags=("timeseries", "forecast", "backtest"),
)
def q_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (predict this hour's
    event count = the count exactly one week earlier): per-type MAE
    over every hour that has a week-ago twin.

    Forecast evaluation as one self-equi-join on (type, hour−7d) over
    the hourly AGGREGATE — the fact table reduces first, so the join
    touches |types|×|hours| rows at any corpus scale. The baseline any
    fancier forecaster must beat, computable inside the warehouse.
    """
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("actual"))
    pred = hourly.select(
        F.col("event_type").alias("p_type"),
        (F.col("h") + F.expr("INTERVAL 7 DAYS")).alias("p_h"),
        F.col("actual").alias("predicted"),
    )
    joined = hourly.join(
        pred,
        (F.col("event_type") == F.col("p_type")) & (F.col("h") == F.col("p_h")),
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.round(F.avg(F.abs(F.col("actual") - F.col("predicted"))), 4).alias("mae"),
        F.round(F.avg("actual"), 4).alias("mean_actual"),
    )


@register(
    "q_cusum_changepoint",
    oracle="""
WITH daily AS (
  SELECT event_type, DATE_TRUNC('day', ts) AS d, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type, AVG(n) AS mu FROM daily GROUP BY event_type
),
cusum AS (
  SELECT d.event_type, d.d,
         SUM(d.n - m.mu) OVER (PARTITION BY d.event_type ORDER BY d.d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM daily d JOIN m ON d.event_type = m.event_type
)
SELECT event_type,
       FIRST(d ORDER BY ABS(s) DESC, d) AS changepoint_day,
       ROUND(MAX(ABS(s)), 4) AS max_abs_cusum
FROM cusum
GROUP BY event_type
""",
    tags=("timeseries", "cusum", "changepoint"),
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point estimate per event type: the day where the
    cumulative deviation from the mean daily count peaks in magnitude
    (the classic single-changepoint locator).

    Daily counts reduce first; the mean joins back broadcast; the
    CUSUM is one per-type running window and the argmax is a max_by
    over the ~30-row-per-type frame. Ties on |CUSUM| resolve to the
    earliest day in both engines.
    """
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    m = daily.groupBy("event_type").agg(F.avg("n").alias("mu"))
    w = (
        W.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cusum = daily.join(F.broadcast(m), "event_type").withColumn(
        "s", F.sum(F.col("n") - F.col("mu")).over(w)
    )
    # max_by on (|s| desc, earliest day): maximize struct(|s|, -epoch)
    okey = F.struct(F.abs("s").alias("a"), (-F.unix_timestamp("d")).alias("negd"))
    return cusum.groupBy("event_type").agg(
        F.max_by("d", okey).alias("changepoint_day"),
        F.round(F.max(F.abs("s")), 4).alias("max_abs_cusum"),
    )


@register(
    "q_event_burstiness",
    oracle="""
WITH hourly AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS h, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       COUNT(*) AS n_hours,
       ROUND(AVG(n), 6) AS mean_rate,
       ROUND(var_pop(n), 6) AS var_rate,
       ROUND(var_pop(n) / AVG(n), 6) AS fano_factor
FROM hourly
GROUP BY event_type
""",
    tags=("timeseries", "burstiness", "fano"),
)
def q_event_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness (Fano factor = variance/mean of hourly counts) per
    event type: 1 ≈ Poisson arrivals, >1 = bursty, <1 = regular.

    The anomaly-context statistic behind rate alerting — one hourly
    hash-agg then moment aggregates over the per-type hour counts.
    """
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    return hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.round(F.avg("n"), 6).alias("mean_rate"),
        F.round(F.var_pop("n"), 6).alias("var_rate"),
        F.round(F.var_pop("n") / F.avg("n"), 6).alias("fano_factor"),
    )


# --------------------------------------------------------------------------
# Lag autocorrelation (ACF) of the hourly arrival series per event
# type. One hourly hash-agg, ONE window sort per event_type to emit
# all six lag columns in a single pass, an in-stage unpivot (stack —
# no shuffle), then a (event_type, lag) hash-agg of Pearson corr.
# At 100 TB the hourly frame is tiny relative to the fact table
# (hours grow with wall-time, not data volume), so every post-agg
# stage is negligible; the only heavy shuffle is the first hourly
# aggregation, which has map-side partial combine on a skew-free
# (type, hour) key. Counts are exact integers, so both engines
# correlate bit-identical series; corr itself is a co-moment over
# ~1e3 points — stable far past the 6-decimal snap.
# --------------------------------------------------------------------------
_ACF_LAGS = (1, 2, 3, 4, 6, 12)


@register(
    "q_autocorr_hourly_activity",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS h, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), lagged AS (
  SELECT event_type, CAST(n AS DOUBLE) AS n,
         {', '.join(f"LAG(CAST(n AS DOUBLE), {k}) OVER (PARTITION BY event_type ORDER BY h) AS lag_{k}" for k in _ACF_LAGS)}
  FROM hourly
)
SELECT event_type, lag, CAST(n_pairs AS BIGINT) AS n_pairs, acf FROM (
  {' UNION ALL '.join(f"SELECT event_type, {k} AS lag, COUNT(lag_{k}) AS n_pairs, ROUND(corr(n, lag_{k}), 6) AS acf FROM lagged GROUP BY event_type" for k in _ACF_LAGS)}
)
""",
    tags=("timeseries", "acf", "autocorrelation"),
)
def q_autocorr_hourly_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of hourly event counts per type at lags
    1/2/3/4/6/12 — the seasonality probe a forecasting pipeline runs
    before choosing model periods (a 12-hour or daily cycle shows up
    as an ACF peak at that lag).

    Lag semantics: over OBSERVED hourly bars in hour order (missing
    hours compress, as in `q_seasonal_naive_backtest`). All six lag
    series come out of one window pass; `stack` unpivots them inside
    the same stage, so the plan is agg → window → agg with no extra
    exchange.
    """
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    w = W.partitionBy("event_type").orderBy("h")
    lagged = hourly.select(
        "event_type",
        "n",
        *[F.lag("n", k).over(w).alias(f"lag_{k}") for k in _ACF_LAGS],
    )
    stacked = lagged.select(
        "event_type",
        "n",
        F.expr(
            "stack({}, {}) AS (lag, lagv)".format(
                len(_ACF_LAGS),
                ", ".join(f"{k}, lag_{k}" for k in _ACF_LAGS),
            )
        ),
    )
    return stacked.groupBy("event_type", "lag").agg(
        F.count("lagv").cast("long").alias("n_pairs"),
        F.round(F.corr("n", "lagv"), 6).alias("acf"),
    )


# --------------------------------------------------------------------------
# Holt double-exponential smoothing (level + trend), the forecasting
# step up from q_ewma_user_value's single smoother. Same physical
# shape as EWMA: one shuffle to collect each user's ordered value
# sequence, then a JVM-side F.aggregate fold — per-user sequences are
# bounded (user activity, not corpus size), so the fold parallelizes
# across users at any scale and no per-step state ever crosses the
# cluster. Cross-engine float discipline: the accumulator is a
# 2-element DOUBLE array folded left-to-right over the SAME per-event
# doubles in both engines (no pre-aggregated sums whose fold order
# could differ); α = 0.5 is exact in binary, β/1−β are paired
# literals (0.3 / 0.7, never computed as 1−β).
# --------------------------------------------------------------------------
_HOLT_A = 0.5       # level gain (exactly representable)
_HOLT_B = 0.3       # trend gain
_HOLT_1MB = 0.7     # literal, NOT 1 - _HOLT_B


@register(
    "q_holt_smoothing_user_value",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, LIST(value ORDER BY ts, event_id) AS vals
  FROM events
  GROUP BY user_id
), folded AS (
  SELECT user_id, LEN(vals) AS n_events,
         LIST_REDUCE(
           LIST_TRANSFORM(vals, x -> [CAST(x AS DOUBLE), CAST(0 AS DOUBLE)]),
           (acc, x) -> [
             {_HOLT_A} * x[1] + {_HOLT_A} * (acc[1] + acc[2]),
             {_HOLT_B} * (({_HOLT_A} * x[1] + {_HOLT_A} * (acc[1] + acc[2])) - acc[1])
               + {_HOLT_1MB} * acc[2]
           ]) AS lb
  FROM ordered
)
SELECT user_id,
       CAST(n_events AS BIGINT) AS n_events,
       ROUND(lb[1], 6) AS holt_level,
       ROUND(lb[2], 6) AS holt_trend,
       ROUND(lb[1] + lb[2], 6) AS forecast_next
FROM folded
""",
    tags=("timeseries", "holt", "forecast", "fold"),
)
def q_holt_smoothing_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing of each user's event-value sequence:
    l' = α·x + (1−α)(l+b), b' = β(l'−l) + (1−β)b, seeded l₁ = x₁,
    b₁ = 0; reports final level, trend, and the one-step forecast
    l+b — the minimum viable per-entity forecaster.

    α = 0.5 makes both α and 1−α the same exact double, so the level
    line is written once as 0.5·x + 0.5·(l+b) in both engines; l'
    appears twice in the trend line and is spelled out identically
    both times (same fold, same rounding path).
    """
    e = _t(spark, sf_dir, "events")
    collected = e.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))).alias("seq")
    )
    a, b, omb = _HOLT_A, _HOLT_B, _HOLT_1MB

    def step(acc, x):
        lp = F.lit(a) * x["value"] + F.lit(a) * (
            F.element_at(acc, 1) + F.element_at(acc, 2)
        )
        bp = F.lit(b) * (
            (
                F.lit(a) * x["value"]
                + F.lit(a) * (F.element_at(acc, 1) + F.element_at(acc, 2))
            )
            - F.element_at(acc, 1)
        ) + F.lit(omb) * F.element_at(acc, 2)
        return F.array(lp, bp)

    lb = F.aggregate(
        F.expr("slice(seq, 2, size(seq) - 1)"),
        F.array(
            F.element_at("seq", 1)["value"].cast("double"),
            F.lit(0.0),
        ),
        step,
    )
    return collected.select(
        "user_id",
        F.size("seq").cast("long").alias("n_events"),
        F.round(F.element_at(lb, 1), 6).alias("holt_level"),
        F.round(F.element_at(lb, 2), 6).alias("holt_trend"),
        F.round(F.element_at(lb, 1) + F.element_at(lb, 2), 6).alias("forecast_next"),
    )


_HW_A = 0.5    # level gain (0.5 so alpha and 1-alpha are the same double)
_HW_B = 0.25   # trend gain
_HW_G = 0.25   # seasonal gain
_HW_M = 4      # season length


@register(
    "q_holt_winters_seasonal",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, LIST(value ORDER BY ts, event_id) AS vals
  FROM events
  GROUP BY user_id
  HAVING COUNT(*) >= {2 * _HW_M + 1}
), seeded AS (
  SELECT user_id, LEN(vals) AS n_events, vals,
         (vals[1] + vals[2] + vals[3] + vals[4]) / 4.0 AS mu
  FROM ordered
), folded AS (
  SELECT user_id, n_events,
    LIST_REDUCE(
      list_prepend(
        [mu, CAST(0 AS DOUBLE), vals[1] - mu, vals[2] - mu, vals[3] - mu, vals[4] - mu],
        LIST_TRANSFORM(vals[{_HW_M + 1}:], x ->
          [CAST(x AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
           CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)])),
      (acc, x) -> [
        {_HW_A} * (x[1] - acc[3]) + {1 - _HW_A} * (acc[1] + acc[2]),
        {_HW_B} * (({_HW_A} * (x[1] - acc[3]) + {1 - _HW_A} * (acc[1] + acc[2])) - acc[1])
          + {1 - _HW_B} * acc[2],
        acc[4],
        acc[5],
        acc[6],
        {_HW_G} * (x[1] - ({_HW_A} * (x[1] - acc[3]) + {1 - _HW_A} * (acc[1] + acc[2])))
          + {1 - _HW_G} * acc[3]
      ]) AS st
  FROM seeded
)
SELECT user_id,
       CAST(n_events AS BIGINT) AS n_events,
       ROUND(st[1], 6) AS hw_level,
       ROUND(st[2], 6) AS hw_trend,
       ROUND(st[3], 6) AS hw_season_next,
       ROUND(st[1] + st[2] + st[3], 6) AS forecast_next
FROM folded
""",
    tags=("timeseries", "holt_winters", "forecast", "fold"),
)
def q_holt_winters_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive triple smoothing (period m=4) of each
    user's event-value sequence — the seasonal extension of
    ``q_holt_smoothing_user_value``:

        l' = alpha*(x - s) + (1-alpha)*(l + b)
        b' = beta*(l' - l) + (1-beta)*b
        s' = gamma*(x - l') + (1-gamma)*s

    seeded classically from the first season: l = mean(x[1..4]),
    b = 0, s_i = x_i - mean. The seasonal state ROTATES inside the
    fold vector ([l, b, s_cur, s+1, s+2, s+3] -> consume s_cur, append
    s'), so no step index is needed and the whole recurrence is one
    ``F.aggregate`` over the collected sequence — the same
    sequential-by-nature-per-key, embarrassingly-parallel-across-keys
    shape as Holt: one shuffle to group, codegen'd fold, no UDF.

    alpha = 0.5 keeps alpha and 1-alpha the same exact double; l'
    appears three times per step and is spelled out identically each
    time in both engines, so the doubles agree bit-for-bit and
    round(6) is cosmetic. Forecast is l + b + s_next (the rotated
    head after the final step).
    """
    e = _t(spark, sf_dir, "events")
    a, b_, g, m = _HW_A, _HW_B, _HW_G, _HW_M
    collected = (
        e.groupBy("user_id")
        .agg(F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))).alias("seq"))
        .filter(F.size("seq") >= 2 * m + 1)
        .select("user_id", F.expr("transform(seq, s -> CAST(s.value AS DOUBLE))").alias("vals"))
    )
    seeded = collected.select(
        "user_id",
        F.size("vals").cast("long").alias("n_events"),
        "vals",
        (
            (
                F.element_at("vals", 1)
                + F.element_at("vals", 2)
                + F.element_at("vals", 3)
                + F.element_at("vals", 4)
            )
            / 4.0
        ).alias("mu"),
    )

    def step(acc, x):
        lvl = F.lit(a) * (x - F.element_at(acc, 3)) + F.lit(1 - a) * (
            F.element_at(acc, 1) + F.element_at(acc, 2)
        )
        # l' is intentionally re-spelled (not reused) in the trend and
        # seasonal lines so the Spark expression tree matches the
        # oracle's literal arithmetic term-for-term
        return F.array(
            lvl,
            F.lit(b_)
            * (
                (
                    F.lit(a) * (x - F.element_at(acc, 3))
                    + F.lit(1 - a) * (F.element_at(acc, 1) + F.element_at(acc, 2))
                )
                - F.element_at(acc, 1)
            )
            + F.lit(1 - b_) * F.element_at(acc, 2),
            F.element_at(acc, 4),
            F.element_at(acc, 5),
            F.element_at(acc, 6),
            F.lit(g)
            * (
                x
                - (
                    F.lit(a) * (x - F.element_at(acc, 3))
                    + F.lit(1 - a) * (F.element_at(acc, 1) + F.element_at(acc, 2))
                )
            )
            + F.lit(1 - g) * F.element_at(acc, 3),
        )

    init = F.array(
        F.col("mu"),
        F.lit(0.0),
        F.element_at("vals", 1) - F.col("mu"),
        F.element_at("vals", 2) - F.col("mu"),
        F.element_at("vals", 3) - F.col("mu"),
        F.element_at("vals", 4) - F.col("mu"),
    )
    st = F.aggregate(F.expr(f"slice(vals, {m + 1}, size(vals) - {m})"), init, step)
    return seeded.select(
        "user_id",
        "n_events",
        F.round(F.element_at(st, 1), 6).alias("hw_level"),
        F.round(F.element_at(st, 2), 6).alias("hw_trend"),
        F.round(F.element_at(st, 3), 6).alias("hw_season_next"),
        F.round(
            F.element_at(st, 1) + F.element_at(st, 2) + F.element_at(st, 3), 6
        ).alias("forecast_next"),
    )
