"""As-of and range join queries, oracle-checked against DuckDB's native
ASOF JOIN and a BETWEEN join respectively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_project_spark.catalog import read_table
from etl_project_spark.operators.temporal import asof_join, range_join
from etl_project_spark.plans.registry import register
from etl_project_spark.session import tune_session


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return read_table(spark, sf_dir, name)

#: Price bands for the range join — disjoint, covering [0, inf).
PRICE_BANDS = [
    ("budget", 0.0, 50_000.0),
    ("mid", 50_000.0, 150_000.0),
    ("premium", 150_000.0, 300_000.0),
    ("luxury", 300_000.0, float("inf")),
]


@register(
    "q_asof_last_order_before_event",
    oracle="""
WITH r AS (
  SELECT o_custkey, o_orderdate, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                            ORDER BY o_orderkey DESC) AS rn
  FROM orders
), right_dedup AS (
  SELECT o_custkey, o_orderdate, o_totalprice FROM r WHERE rn = 1
)
SELECT e.event_id, e.user_id, e.ts,
       o.o_totalprice AS last_order_price,
       o.o_orderdate AS last_order_date
FROM events e
ASOF LEFT JOIN right_dedup o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
    tags=("join", "asof", "temporal"),
)
def q_asof_last_order_before_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks the user's latest order at-or-before
    its timestamp (union-window formulation, one shuffle)."""
    tune_session(spark)
    events = read_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = read_table(spark, sf_dir, "orders")
    # Deterministic tie-break: one row per (custkey, orderdate).
    w = W.partitionBy("o_custkey", "o_orderdate").orderBy(F.col("o_orderkey").desc())
    right = (
        orders.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("o_custkey", "o_orderdate", "o_totalprice")
    )
    joined = asof_join(
        events,
        right,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        value_cols=["o_totalprice", "o_orderdate"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("o_totalprice").alias("last_order_price"),
        F.col("o_orderdate").alias("last_order_date"),
    )


@register(
    "q_range_join_price_bands",
    oracle="""
WITH bands(band, lo, hi) AS (
  VALUES ('budget', 0.0, 50000.0),
         ('mid', 50000.0, 150000.0),
         ('premium', 150000.0, 300000.0),
         ('luxury', 300000.0, 1e308)
)
SELECT b.band,
       COUNT(*) AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS band_revenue
FROM orders o
JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band
""",
    tags=("join", "range", "temporal"),
)
def q_range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join of orders into disjoint price bands + aggregate."""
    tune_session(spark)
    orders = read_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [(b, lo, hi if hi != float("inf") else 1e308) for b, lo, hi in PRICE_BANDS],
        "band string, lo double, hi double",
    )
    joined = range_join(orders, bands, value_col="o_totalprice", lo_col="lo", hi_col="hi")
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("band_revenue"),
    )


@register(
    "q_gapfill_hourly_user_values",
    oracle="""
WITH e AS (SELECT * FROM events WHERE user_id < 10),
hourly AS (
  SELECT user_id, DATE_TRUNC('hour', ts) AS hr, ROUND(SUM(value), 4) AS hour_value
  FROM e GROUP BY user_id, DATE_TRUNC('hour', ts)
),
span AS (SELECT DATE_TRUNC('hour', MIN(ts)) AS lo, DATE_TRUNC('hour', MAX(ts)) AS hi FROM e),
scaffold AS (
  SELECT u.user_id, g.hr
  FROM (SELECT DISTINCT user_id FROM e) u,
       (SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM span) g
),
j AS (
  SELECT s.user_id, s.hr, h.hour_value
  FROM scaffold s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hr = h.hr
)
SELECT user_id, hr,
       COALESCE(last_value(hour_value IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY hr
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS filled_value,
       hour_value IS NOT NULL AS observed
FROM j
""",
    tags=("temporal", "gapfill", "timeseries"),
)
def q_gapfill_hourly_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill + forward-fill: a dense hourly scaffold per
    user (sequence + explode over the observed span), left-joined with
    the hourly aggregate, missing hours carrying the last observed
    value forward (``last(ignorenulls)`` over an unbounded-preceding
    frame — exactly DuckDB's ``last_value IGNORE NULLS``).

    Scale shape: the scaffold is rows_users × span_hours — generated,
    never shuffled wide (the 1-row span broadcast-joins to the user
    list); the fill window shuffles once on user_id. The standard
    prep for ML feature matrices over sparse event streams.
    """
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.round(F.sum("value"), 4).alias("hour_value"))
    span = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    users = e.select("user_id").distinct()
    scaffold = users.join(F.broadcast(span)).select(
        "user_id",
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hr"),
    )
    j = scaffold.join(hourly, ["user_id", "hr"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return j.select(
        "user_id",
        "hr",
        F.coalesce(
            F.last("hour_value", ignorenulls=True).over(w), F.lit(0.0)
        ).alias("filled_value"),
        F.col("hour_value").isNotNull().alias("observed"),
    )


@register(
    "q_asof_tolerance_error_before_purchase",
    oracle="""
WITH p AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
), r AS (
  SELECT user_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'error'
), right_dedup AS (
  SELECT user_id, ts FROM r WHERE rn = 1
)
SELECT p.event_id, p.user_id, p.ts,
       CASE WHEN o.ts >= p.ts - INTERVAL 1 HOUR THEN o.ts END AS error_ts,
       COALESCE(o.ts >= p.ts - INTERVAL 1 HOUR, FALSE) AS error_within_1h
FROM p ASOF LEFT JOIN right_dedup o
  ON p.user_id = o.user_id AND p.ts >= o.ts
""",
    tags=("join", "asof", "temporal", "tolerance"),
)
def q_asof_tolerance_error_before_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tolerance-bounded as-of join: did an error precede each purchase
    within the last hour?

    pandas ``merge_asof(tolerance=...)`` semantics at Spark scale: the
    union-window as-of carries the user's latest error timestamp to
    each purchase (one shuffle), and matches older than the tolerance
    become NULL instead of silently attributing stale context — on
    this corpus 92% of purchases have SOME prior error but only ~2%
    within the hour, so the tolerance is doing real work, not
    decoration.
    """
    tune_session(spark)
    e = read_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    w = W.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    errors = (
        e.filter(F.col("event_type") == "error")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", F.col("ts").alias("error_ts"))
    )
    joined = asof_join(
        purchases,
        errors,
        left_key="user_id",
        right_key="user_id",
        left_time="ts",
        right_time="error_ts",
        value_cols=["error_ts"],
        tolerance=F.expr("INTERVAL 1 HOUR"),
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "error_ts",
        F.col("error_ts").isNotNull().alias("error_within_1h"),
    )


@register(
    "q_asof_forward_next_signup",
    oracle="""
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), r AS (
  SELECT user_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'signup'
), right_dedup AS (
  SELECT user_id, ts FROM r WHERE rn = 1
)
SELECT p.event_id, p.user_id, p.ts,
       s.ts AS next_signup_ts
FROM p ASOF LEFT JOIN right_dedup s
  ON p.user_id = s.user_id AND p.ts <= s.ts
""",
    tags=("join", "asof", "temporal", "forward"),
)
def q_asof_forward_next_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each purchase, the user's EARLIEST
    signup at-or-after it (pandas merge_asof direction='forward').

    The mirror of the backward as-of — same single-shuffle
    union-window formulation run over a FOLLOWING frame with the tie
    order flipped; the oracle is DuckDB's ASOF with a <= condition,
    which selects the forward match natively.
    """
    tune_session(spark)
    e = read_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    w = W.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    signups = (
        e.filter(F.col("event_type") == "signup")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", F.col("ts").alias("next_signup_ts"))
    )
    return asof_join(
        purchases,
        signups,
        left_key="user_id",
        right_key="user_id",
        left_time="ts",
        right_time="next_signup_ts",
        value_cols=["next_signup_ts"],
        direction="forward",
    ).select("event_id", "user_id", "ts", "next_signup_ts")


@register(
    "q_asof_nearest_error_to_purchase",
    oracle="""
WITH errors AS (
  SELECT user_id, ts AS err_ts, MAX(event_id) AS err_id
  FROM events WHERE event_type = 'error'
  GROUP BY user_id, ts
),
purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
b AS (
  SELECT p.event_id, p.user_id, p.ts, e.err_ts AS bt, e.err_id AS bid
  FROM purchases p
  ASOF LEFT JOIN errors e ON p.user_id = e.user_id AND p.ts >= e.err_ts
),
f AS (
  SELECT p.event_id, e.err_ts AS ft, e.err_id AS fid
  FROM purchases p
  ASOF LEFT JOIN errors e ON p.user_id = e.user_id AND p.ts <= e.err_ts
)
SELECT b.event_id, b.user_id, b.ts,
       CASE WHEN b.bt IS NOT NULL AND (f.ft IS NULL
                 OR DATE_DIFF('second', b.bt, b.ts) <= DATE_DIFF('second', b.ts, f.ft))
            THEN b.bt ELSE f.ft END AS nearest_error_ts,
       CASE WHEN b.bt IS NOT NULL AND (f.ft IS NULL
                 OR DATE_DIFF('second', b.bt, b.ts) <= DATE_DIFF('second', b.ts, f.ft))
            THEN b.bid ELSE f.fid END AS nearest_error_id
FROM b JOIN f ON b.event_id = f.event_id
""",
    tags=("join", "asof", "nearest"),
)
def q_asof_nearest_error_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """direction='nearest' as-of join: each purchase finds the user's
    closest error event on EITHER side of its timestamp (backward wins
    exact-distance ties — the operator's documented rule).

    The incident-correlation query. One shuffle: both directional
    carries evaluate over the same key-partitioned sort and a
    row-local CASE picks the closer side — against DuckDB's native
    ASOF JOIN run twice (once per direction) plus the same tie rule.
    """
    tune_session(spark)
    events = read_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = (
        events.where(F.col("event_type") == "error")
        .groupBy("user_id", F.col("ts").alias("err_ts"))
        .agg(F.max("event_id").alias("err_id"))
    )
    out = asof_join(
        purchases,
        errors,
        left_key="user_id",
        right_key="user_id",
        left_time="ts",
        right_time="err_ts",
        value_cols=["err_ts", "err_id"],
        direction="nearest",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("err_ts").alias("nearest_error_ts"),
        F.col("err_id").alias("nearest_error_id"),
    )


@register(
    "q_order_interval_coverage",
    oracle="""
WITH iv AS (
  SELECT o.o_custkey, o.o_orderdate AS s, MAX(l.l_shipdate) AS e
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, o.o_custkey, o.o_orderdate
),
flagged AS (
  SELECT o_custkey, s, e,
         CASE WHEN s > MAX(e) OVER (PARTITION BY o_custkey ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                OR MAX(e) OVER (PARTITION BY o_custkey ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT o_custkey, s, e,
         SUM(new_island) OVER (PARTITION BY o_custkey ORDER BY s, e
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
  FROM flagged
),
island_spans AS (
  SELECT o_custkey, island_id,
         MIN(s) AS island_start, MAX(e) AS island_end
  FROM islands GROUP BY o_custkey, island_id
)
SELECT o_custkey,
       COUNT(*) AS n_islands,
       CAST(SUM(DATE_DIFF('day', island_start, island_end)) AS BIGINT)
           AS covered_days
FROM island_spans
GROUP BY o_custkey
""",
    tags=("temporal", "intervals", "islands"),
)
def q_order_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: merge each customer's overlapping order
    intervals (orderdate → last shipment) and report the union's
    island count and total covered days.

    The classic interval-union pattern without a self-join: running
    MAX(end) over the start-sorted per-key frame flags island starts,
    a running SUM numbers them, and two hash-aggs roll up spans. One
    shuffle on the customer key; every window is per-key, never
    global.
    """
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    iv = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_custkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("e"))
        .select("o_custkey", F.col("o_orderdate").alias("s"), "e")
    )
    w_prev = (
        W.partitionBy("o_custkey")
        .orderBy("s", "e")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prev_max_e = F.max("e").over(w_prev)
    flagged = iv.withColumn(
        "new_island",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(0),
    )
    w_run = (
        W.partitionBy("o_custkey")
        .orderBy("s", "e")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    islands = flagged.withColumn("island_id", F.sum("new_island").over(w_run))
    spans = islands.groupBy("o_custkey", "island_id").agg(
        F.min("s").alias("island_start"), F.max("e").alias("island_end")
    )
    return spans.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.datediff("island_end", "island_start")).cast("long").alias("covered_days"),
    )


@register(
    "q_kaplan_meier_reorder",
    oracle="""
WITH anchor AS (SELECT MAX(o_orderdate) AS max_d FROM orders),
gaps AS (
  SELECT o_custkey,
         DATE_DIFF('day', o_orderdate,
                   LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey))
             AS t_event,
         DATE_DIFF('day', o_orderdate, (SELECT max_d FROM anchor)) AS t_censor
  FROM orders
),
obs AS (
  SELECT CASE WHEN t_event IS NOT NULL THEN t_event ELSE t_censor END AS t,
         CASE WHEN t_event IS NOT NULL THEN 1 ELSE 0 END AS died
  FROM gaps
  WHERE (CASE WHEN t_event IS NOT NULL THEN t_event ELSE t_censor END) > 0
),
tot AS (SELECT COUNT(*) AS n0 FROM obs),
daily AS (
  SELECT t, SUM(died) AS d, COUNT(*) AS removed
  FROM obs GROUP BY t
),
risk AS (
  SELECT t, d,
         n0 - COALESCE(SUM(removed) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_at_risk
  FROM daily, tot
),
km AS (
  SELECT t, d, n_at_risk,
         EXP(SUM(LN(1.0 - 1.0 * d / n_at_risk)) OVER (ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
  FROM risk
  WHERE d > 0 AND d < n_at_risk
)
SELECT CAST(t AS BIGINT) AS day, CAST(d AS BIGINT) AS n_events,
       CAST(n_at_risk AS BIGINT) AS n_at_risk,
       ROUND(s, 6) AS survival
FROM km WHERE t <= 120
""",
    tags=("temporal", "survival", "kaplan-meier"),
)
def q_kaplan_meier_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier estimate of 'time until a customer orders again':
    survival probability by day since the previous order, with
    right-censoring at the corpus horizon for gaps still open.

    The churn-analytics staple as relational algebra: per-customer gap
    extraction (one LEAD window), a per-day death/removal rollup, the
    at-risk count as an exclusive running sum, and the product-limit
    estimator via EXP(Σ LN(1−d/n)) — every window runs over the
    ≤|distinct days| frame, never the fact table. The day-120 cut
    keeps output stable; log-sum products differ between engines only
    at ~1e-15, inside the 6-decimal rounding.
    """
    o = _t(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("max_d"))
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.withColumn("next_d", F.lead("o_orderdate").over(w)).crossJoin(
        F.broadcast(anchor)
    )
    obs = gaps.select(
        F.when(
            F.col("next_d").isNotNull(), F.datediff("next_d", "o_orderdate")
        ).otherwise(F.datediff("max_d", "o_orderdate")).alias("t"),
        F.when(F.col("next_d").isNotNull(), 1).otherwise(0).alias("died"),
    ).where(F.col("t") > 0)
    tot = obs.agg(F.count(F.lit(1)).alias("n0"))
    daily = obs.groupBy("t").agg(
        F.sum("died").alias("d"), F.count(F.lit(1)).alias("removed")
    )
    w_prev = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    risk = daily.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        (F.col("n0") - F.coalesce(F.sum("removed").over(w_prev), F.lit(0))).alias(
            "n_at_risk"
        ),
    )
    w_run = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    # d == n_at_risk is the terminal total-death day (S would hit
    # exactly 0 and LN(1-d/n) is -inf) — excluded from the curve, the
    # standard presentation which stops at the last survivable time
    km = risk.where((F.col("d") > 0) & (F.col("d") < F.col("n_at_risk"))).withColumn(
        "s",
        F.exp(F.sum(F.log(1.0 - F.col("d") * 1.0 / F.col("n_at_risk"))).over(w_run)),
    )
    return km.where(F.col("t") <= 120).select(
        F.col("t").cast("long").alias("day"),
        F.col("d").cast("long").alias("n_events"),
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.round("s", 6).alias("survival"),
    )


_ALLEN_ORACLE = """
WITH iv AS (
  SELECT o.o_custkey AS custkey, o.o_orderkey AS orderkey,
         o.o_orderdate AS s, MAX(l.l_shipdate) AS e
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2, 3
),
seq AS (
  SELECT custkey, s, e,
         LEAD(s) OVER w AS s2, LEAD(e) OVER w AS e2
  FROM iv
  WINDOW w AS (PARTITION BY custkey ORDER BY s, e, orderkey)
),
rel AS (
  SELECT CASE
           WHEN s2 > e THEN 'precedes'
           WHEN s2 = e THEN 'meets'
           WHEN s2 > s AND s2 < e AND e2 > e THEN 'overlaps'
           WHEN s2 > s AND e2 = e THEN 'finished_by'
           WHEN s2 > s AND e2 < e THEN 'contains'
           WHEN s2 = s AND e2 > e THEN 'started_by'
           WHEN s2 = s AND e2 = e THEN 'equals'
           WHEN s2 = s AND e2 < e THEN 'starts'
           ELSE 'other'
         END AS relation
  FROM seq WHERE s2 IS NOT NULL
)
SELECT relation, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM rel GROUP BY relation
"""


@register(
    "q_allen_interval_relations",
    oracle=_ALLEN_ORACLE,
    tags=("temporal", "interval", "allen"),
)
def q_allen_interval_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen's interval-algebra classification of consecutive order
    fulfillment intervals per customer ([orderdate, max shipdate]):
    counts of precedes / meets / overlaps / contains / starts /
    started_by / finished_by / equals between each interval and its
    successor — the temporal-reasoning primitive behind conflict
    detection, timeline validation, and overlap-aware sessionization.

    Because the successor is defined by a total order (start, end,
    orderkey), the pair relation is deterministic; date comparisons
    are exact. Plan: one join+agg builds intervals, one window pairs
    neighbors (partitioned by customer — no cross-customer motion),
    one hash-agg counts relations. The same shape at 100 TB: the
    window key is the natural partition key.
    """
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    iv = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("s"),
        )
        .agg(F.max("l_shipdate").alias("e"))
    )
    w = W.partitionBy("custkey").orderBy("s", "e", "orderkey")
    seq = iv.select(
        "custkey",
        "s",
        "e",
        F.lead("s").over(w).alias("s2"),
        F.lead("e").over(w).alias("e2"),
    ).filter(F.col("s2").isNotNull())
    rel = (
        F.when(F.col("s2") > F.col("e"), "precedes")
        .when(F.col("s2") == F.col("e"), "meets")
        .when(
            (F.col("s2") > F.col("s"))
            & (F.col("s2") < F.col("e"))
            & (F.col("e2") > F.col("e")),
            "overlaps",
        )
        .when((F.col("s2") > F.col("s")) & (F.col("e2") == F.col("e")), "finished_by")
        .when((F.col("s2") > F.col("s")) & (F.col("e2") < F.col("e")), "contains")
        .when((F.col("s2") == F.col("s")) & (F.col("e2") > F.col("e")), "started_by")
        .when((F.col("s2") == F.col("s")) & (F.col("e2") == F.col("e")), "equals")
        .when((F.col("s2") == F.col("s")) & (F.col("e2") < F.col("e")), "starts")
        .otherwise("other")
    )
    return seq.select(rel.alias("relation")).groupBy("relation").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


# --------------------------------------------------------------------------
# Trajectory similarity search: banded DTW against one query series
# with LB_Keogh pruning (Keogh 2002; the REPOSE/top-k-trajectory
# family from the retrieved-papers list, reduced to its distributed
# core). Scale shape: the probe series is index-build metadata (32
# doubles collected once, closed over by the kernel); candidates are
# one groupBy to assemble per-user sequences, then a single
# mapInPandas pass — prune is O(n) per row, the exact DP runs only on
# survivors and is vectorized ACROSS rows, so per-candidate cost is
# bounded by the fixed series length at any corpus size. No pairwise
# anything: this is a 1-vs-all search, the building block a top-k
# trajectory join repeats per probe partition.
# --------------------------------------------------------------------------
_DTW_N = 32
_DTW_BAND = 4
#: Radius rank: τ = the 8th-smallest diagonal-path upper bound over the
#: candidates. A fixed absolute τ is scale-brittle (the r12 value 25000
#: returned 0 rows at sf0.1 — a vacuous hash match); the rank-derived
#: radius guarantees ≥ rank survivors at every SF (each of the rank
#: smallest-ub candidates has dtw ≤ ub ≤ τ) while both engines replay
#: the identical cutoff from the identical left-to-right ub fold.
_DTW_TAU_RANK = 8


@register(
    "q_dtw_similar_users",
    oracle=f"""
WITH RECURSIVE seqs AS (
  SELECT user_id, LIST(value ORDER BY ts, event_id)[1:{_DTW_N}] AS xs
  FROM events GROUP BY user_id
  HAVING COUNT(*) >= {_DTW_N}
), probe AS (
  SELECT user_id AS pid, xs AS q FROM seqs ORDER BY user_id LIMIT 1
), env AS (
  SELECT [list_aggregate(q[GREATEST(1, j - {_DTW_BAND}):LEAST({_DTW_N}, j + {_DTW_BAND})], 'max')
          FOR j IN generate_series(1, {_DTW_N})] AS u,
         [list_aggregate(q[GREATEST(1, j - {_DTW_BAND}):LEAST({_DTW_N}, j + {_DTW_BAND})], 'min')
          FOR j IN generate_series(1, {_DTW_N})] AS l,
         q
  FROM probe
), cands AS (
  SELECT s.user_id, s.xs, p.q,
         LIST_REDUCE(
           LIST_TRANSFORM(generate_series(1, {_DTW_N}), j ->
             CASE WHEN j = 1 THEN
               CASE WHEN s.xs[1] > e.u[1] THEN (s.xs[1] - e.u[1]) * (s.xs[1] - e.u[1])
                    WHEN s.xs[1] < e.l[1] THEN (e.l[1] - s.xs[1]) * (e.l[1] - s.xs[1])
                    ELSE 0.0 END
             ELSE
               CASE WHEN s.xs[CAST(j AS INTEGER)] > e.u[CAST(j AS INTEGER)]
                      THEN (s.xs[CAST(j AS INTEGER)] - e.u[CAST(j AS INTEGER)])
                           * (s.xs[CAST(j AS INTEGER)] - e.u[CAST(j AS INTEGER)])
                    WHEN s.xs[CAST(j AS INTEGER)] < e.l[CAST(j AS INTEGER)]
                      THEN (e.l[CAST(j AS INTEGER)] - s.xs[CAST(j AS INTEGER)])
                           * (e.l[CAST(j AS INTEGER)] - s.xs[CAST(j AS INTEGER)])
                    ELSE 0.0 END
             END),
           (acc, x) -> acc + x) AS lb,
         LIST_REDUCE(
           LIST_TRANSFORM(generate_series(1, {_DTW_N}), j ->
             (s.xs[CAST(j AS INTEGER)] - p.q[CAST(j AS INTEGER)])
             * (s.xs[CAST(j AS INTEGER)] - p.q[CAST(j AS INTEGER)])),
           (acc, x) -> acc + x) AS ub
  FROM seqs s, probe p, env e WHERE s.user_id <> p.pid
), tau AS (
  SELECT COALESCE(MAX(ub), 'infinity'::DOUBLE) AS t
  FROM (SELECT ub FROM cands ORDER BY ub LIMIT {_DTW_TAU_RANK})
), dp AS (
  SELECT user_id, xs, q, lb, 0 AS i,
         [CASE WHEN j = 0 THEN 0.0 ELSE 'infinity'::DOUBLE END
          FOR j IN generate_series(0, {_DTW_N})] AS row
  FROM cands
  UNION ALL
  SELECT user_id, xs, q, lb, i + 1,
    LIST_REDUCE(
      LIST_TRANSFORM(generate_series(0, {_DTW_N}), j ->
        CASE WHEN j = 0 THEN ['infinity'::DOUBLE] ELSE [CAST(j AS DOUBLE)] END),
      (acc, e) -> list_append(acc,
        CASE WHEN ABS((i + 1) - CAST(e[1] AS INTEGER)) > {_DTW_BAND} THEN 'infinity'::DOUBLE
        ELSE (xs[i + 1] - q[CAST(e[1] AS INTEGER)]) * (xs[i + 1] - q[CAST(e[1] AS INTEGER)])
             + LEAST(row[CAST(e[1] AS INTEGER) + 1],
                     acc[-1],
                     row[CAST(e[1] AS INTEGER)])
        END))
  FROM dp WHERE i < {_DTW_N}
)
SELECT user_id, ROUND(lb, 6) AS lb_keogh, ROUND(row[{_DTW_N} + 1], 6) AS dtw
FROM dp WHERE i = {_DTW_N} AND row[{_DTW_N} + 1] <= (SELECT t FROM tau)
""",
    tags=("temporal", "dtw", "trajectory", "similarity"),
)
def q_dtw_similar_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users whose first-32-event value trajectory is within banded-DTW
    radius τ of the smallest qualifying user's trajectory (Sakoe-Chiba
    band r=4, squared-difference cost), with each survivor's LB_Keogh
    lower bound. τ is DATA-DERIVED: the 8th-smallest diagonal-path
    Euclidean sum (an admissible upper bound, so ≥ 8 survivors are
    certified at every scale factor — the r12 fixed τ=25000 was a
    vacuous 0-row match at sf0.1).

    The plan PRUNES with LB_Keogh and runs the exact DP only on
    survivors; the oracle runs the exact DP on EVERY candidate — so
    the theorem the pruning leans on (lb ≤ banded DTW) is itself under
    test: an unsound bound drops a qualifying user and flips the hash.
    Both engines evaluate the DP cell-for-cell in the same order, and
    the lb, the ub, and τ itself fold left-to-right with explicit
    multiplication (not pow) on both sides. τ's kth-smallest is a
    per-task-heap TakeOrderedAndProject (no collect_list of the
    candidate set); the driver receives ONE scalar. With fewer than
    rank candidates MAX over all ubs keeps everything (dtw ≤ own ub ≤
    max ub) — the same degenerate behavior as the oracle's LIMIT+MAX.
    """
    from etl_project_spark.operators.temporal import (
        dtw_bounds_kernel,
        dtw_search_kernel,
    )
    from etl_project_spark.session import scoped_persist

    e = _t(spark, sf_dir, "events")
    seqs = scoped_persist(
        e.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("seq")
        )
        .filter(F.size("seq") >= _DTW_N)
        .select(
            "user_id",
            F.expr(
                f"transform(slice(seq, 1, {_DTW_N}), s -> CAST(s.value AS DOUBLE))"
            ).alias("xs"),
        )
    )
    probe_row = seqs.orderBy("user_id").limit(1).collect()[0]
    pid = int(probe_row["user_id"])
    query = [float(v) for v in probe_row["xs"]]
    cands = seqs.filter(F.col("user_id") != pid)
    fn_b, sch_b = dtw_bounds_kernel({pid: query}, band=_DTW_BAND)
    tau_row = (
        cands.mapInPandas(fn_b, schema=sch_b)
        .orderBy("ub")
        .limit(_DTW_TAU_RANK)
        .agg(F.coalesce(F.max("ub"), F.lit(float("inf"))).alias("tau"))
        .collect()[0]
    )
    tau = float(tau_row["tau"])
    fn, schema = dtw_search_kernel(
        query, id_col="user_id", seq_col="xs", band=_DTW_BAND, tau=tau
    )
    out = cands.mapInPandas(fn, schema=schema)
    return out.select(
        "user_id",
        F.round("lb_keogh", 6).alias("lb_keogh"),
        F.round("dtw", 6).alias("dtw"),
    )


_DTWJ_K = 3
_DTWJ_PROBES = 4


@register(
    "q_dtw_topk_join",
    oracle=f"""
WITH RECURSIVE seqs AS (
  SELECT user_id, LIST(value ORDER BY ts, event_id)[1:{_DTW_N}] AS xs
  FROM events GROUP BY user_id
  HAVING COUNT(*) >= {_DTW_N}
), probes AS (
  SELECT user_id AS pid, xs AS q FROM seqs ORDER BY user_id LIMIT {_DTWJ_PROBES}
), pairs AS (
  SELECT p.pid, s.user_id, s.xs, p.q
  FROM seqs s, probes p
  WHERE s.user_id NOT IN (SELECT pid FROM probes)
), dp AS (
  SELECT pid, user_id, xs, q, 0 AS i,
         [CASE WHEN j = 0 THEN 0.0 ELSE 'infinity'::DOUBLE END
          FOR j IN generate_series(0, {_DTW_N})] AS row
  FROM pairs
  UNION ALL
  SELECT pid, user_id, xs, q, i + 1,
    LIST_REDUCE(
      LIST_TRANSFORM(generate_series(0, {_DTW_N}), j ->
        CASE WHEN j = 0 THEN ['infinity'::DOUBLE] ELSE [CAST(j AS DOUBLE)] END),
      (acc, e) -> list_append(acc,
        CASE WHEN ABS((i + 1) - CAST(e[1] AS INTEGER)) > {_DTW_BAND} THEN 'infinity'::DOUBLE
        ELSE (xs[i + 1] - q[CAST(e[1] AS INTEGER)]) * (xs[i + 1] - q[CAST(e[1] AS INTEGER)])
             + LEAST(row[CAST(e[1] AS INTEGER) + 1],
                     acc[-1],
                     row[CAST(e[1] AS INTEGER)])
        END))
  FROM dp WHERE i < {_DTW_N}
)
SELECT probe_id, user_id, dtw, CAST(rn AS INTEGER) AS rank FROM (
  SELECT pid AS probe_id, user_id,
         ROUND(row[{_DTW_N} + 1], 6) AS dtw,
         ROW_NUMBER() OVER (
           PARTITION BY pid ORDER BY row[{_DTW_N} + 1], user_id) AS rn
  FROM dp WHERE i = {_DTW_N}
) WHERE rn <= {_DTWJ_K}
""",
    tags=("temporal", "dtw", "trajectory", "knn-join"),
)
def q_dtw_topk_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 DTW neighbors for each of 4 probe trajectories — the JOIN
    form of `q_dtw_similar_users` (REPOSE's distributed top-k
    trajectory join, reduced to its pruning algebra).

    Lossless top-k pruning without a fixed radius: stage 1 emits BOTH
    bounds per (candidate, probe) — LB_Keogh below, the diagonal
    path's Euclidean sum above (an admissible banded path, so
    lb ≤ DTW ≤ ub). The per-probe kth-smallest ub is a certified
    ceiling on the kth-best DTW, so dropping lb > τₖ cannot lose a
    true neighbor (Fagin-style bound). Stage 2 exact-DPs survivors
    only. The oracle DPs EVERY pair — a pruning bug surfaces as a
    missing or re-ranked row. Ranks compare raw DP doubles (identical
    in both engines) with id tiebreaks; output snaps at 6 decimals.
    """
    from etl_project_spark.operators.temporal import (
        dtw_bounds_kernel,
        dtw_exact_kernel,
    )
    from etl_project_spark.session import scoped_persist

    e = _t(spark, sf_dir, "events")
    seqs = scoped_persist(
        e.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("seq")
        )
        .filter(F.size("seq") >= _DTW_N)
        .select(
            "user_id",
            F.expr(
                f"transform(slice(seq, 1, {_DTW_N}), s -> CAST(s.value AS DOUBLE))"
            ).alias("xs"),
        )
    )
    probe_rows = seqs.orderBy("user_id").limit(_DTWJ_PROBES).collect()
    queries = {int(r["user_id"]): [float(v) for v in r["xs"]] for r in probe_rows}
    cands = seqs.filter(~F.col("user_id").isin(list(queries)))
    fn_a, sch_a = dtw_bounds_kernel(queries, band=_DTW_BAND)
    # The bounds frame feeds BOTH the per-probe cutoff aggregate and
    # the survivor filter — unpersisted, the LB_Keogh/ub pandas kernel
    # ran twice over every (candidate, probe) pair (two MapInPandas
    # nodes over the same input in the r17 before-plan). The frame is
    # three narrow columns per pair; cache it and pay the kernel once.
    bounds = scoped_persist(cands.mapInPandas(fn_a, schema=sch_a))
    taus = bounds.groupBy("probe_id").agg(
        # Fewer than k candidates → no kth ub exists; the cutoff must
        # degrade to +inf (keep everything). Under ANSI mode a plain
        # [k-1] subscript THROWS on the short array; get() yields NULL,
        # which the coalesce turns into the identity cutoff (a NULL tau
        # would instead drop ALL of the probe's rows via lb <= NULL
        # while the oracle still returns up to k).
        F.coalesce(
            F.expr(f"get(array_sort(collect_list(ub)), {_DTWJ_K - 1})"),
            F.lit(float("inf")),
        ).alias("tau")
    )
    surv = (
        bounds.join(F.broadcast(taus), "probe_id")
        .filter(F.col("lb") <= F.col("tau"))
        .select("probe_id", "user_id")
    )
    surv_seqs = surv.join(seqs, "user_id").select("probe_id", "user_id", "xs")
    fn_b, sch_b = dtw_exact_kernel(queries, band=_DTW_BAND)
    exact = surv_seqs.mapInPandas(fn_b, schema=sch_b)
    w = W.partitionBy("probe_id").orderBy(F.col("dtw"), F.col("user_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _DTWJ_K)
        .select("probe_id", "user_id", F.round("dtw", 6).alias("dtw"), "rank")
    )
