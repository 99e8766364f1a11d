"""Event-table queries: time windows and sessionization (batch mode).

These are the batch-mode equivalents of the Structured Streaming
operators in :mod:`etl_project_spark.streaming` (same logical
semantics, oracle-checkable); the streaming variants run in
tests/test_streaming.py with memory sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_project_spark.catalog import read_table
from etl_project_spark.plans.registry import register
from etl_project_spark.session import tune_session

#: Session gap for sessionization (seconds). 30 min, the industry default.
SESSION_GAP_S = 1800


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return read_table(spark, sf_dir, "events")


@register(
    "q_tumbling_hourly_counts",
    oracle="""
SELECT DATE_TRUNC('hour', ts) AS win_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM events
GROUP BY DATE_TRUNC('hour', ts), event_type
""",
    tags=("events", "window-agg"),
)
def q_tumbling_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate (batch twin of the stream agg)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "q_sessionize_users",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR DATE_DIFF('second', LAG(ts) OVER w, ts) > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *,
         CAST(SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
  FROM flagged
)
SELECT user_id, session_no,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS session_value
FROM numbered
GROUP BY user_id, session_no
""",
    tags=("events", "sessionize"),
)
def q_sessionize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: lag → gap flag → cumulative session id.

    Classic batch sessionization (one shuffle on user_id, in-partition
    sort); the streaming twin uses session_window(ts, gap) with a
    watermark — see etl_project_spark.streaming.events.
    """
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_timestamp handles both TIMESTAMP_LTZ and TIMESTAMP_NTZ inputs;
    # a direct cast-to-long is rejected for NTZ columns (parquet
    # timestamp[us] with isAdjustedToUTC=false infers as NTZ on Spark 4).
    ts_s = F.unix_timestamp(F.col("ts"))
    gap_s = ts_s - F.lag(ts_s).over(w)
    flagged = e.withColumn(
        "new_session",
        F.when(gap_s.isNull() | (gap_s > SESSION_GAP_S), 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_no",
        F.sum("new_session")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long"),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )


@register(
    "q_event_type_pivot",
    oracle="""
SELECT user_id,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
       CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error
FROM events
GROUP BY user_id
""",
    tags=("events", "pivot"),
)
def q_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts per user (conditional aggregation form).

    Expressed as count(when(...)) rather than .pivot() so the plan is a
    single agg pass with no distinct-values job — the scalable shape.
    """
    e = _events(spark, sf_dir)
    def cnt(t: str) -> F.Column:
        return F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
    return e.groupBy("user_id").agg(
        cnt("click"), cnt("view"), cnt("purchase"), cnt("signup"), cnt("error")
    )


@register(
    "q_sliding_window_counts",
    oracle="""
SELECT window_start, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS total_value
FROM (
  SELECT UNNEST([time_bucket(INTERVAL '30 minutes', ts),
                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
           AS window_start,
         value
  FROM events
)
GROUP BY window_start
""",
    tags=("events", "window-agg", "sliding"),
)
def q_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour window, 30-minute slide (batch twin of the
    stream's overlapping-window agg). Each event lands in exactly two
    windows; Spark expands in-place before one hash aggregate — the
    same shape the streaming engine uses, with no self-union.
    """
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"), "n_events", "total_value"
        )
    )


@register(
    "q_running_value_per_user",
    oracle="""
SELECT user_id, event_id,
       ROUND(SUM(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 4) AS running_value
FROM events
""",
    tags=("events", "window"),
)
def q_running_value_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the custom stateful streaming operator
    (streaming/events.py applyInPandasWithState running totals): the
    same per-user running sum as one window pass — one shuffle on
    user_id, in-partition sort, no state store."""
    e = _events(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
    )


@register(
    "q_stream_dedup_twin",
    oracle="""
SELECT DISTINCT event_id FROM events
""",
    tags=("events", "dedup"),
)
def q_stream_dedup_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the watermarked stream dedup
    (``dropDuplicatesWithinWatermark([event_id])`` — id-only key):
    projected to the dedup key so the result is deterministic."""
    e = _events(spark, sf_dir)
    return e.select("event_id").distinct()


@register(
    "q_stream_stream_join_twin",
    oracle="""
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       c.ts AS click_ts,
       p.ts AS purchase_ts,
       ROUND(p.value, 4) AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts > c.ts
 AND p.ts <= c.ts + INTERVAL 60 MINUTE
""",
    tags=("events", "interval-join"),
)
def q_stream_stream_join_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join: purchases
    attributed to same-user clicks within the preceding hour
    (streaming/events.py::stream_stream_click_purchase_join — same
    condition, watermark-bounded state there)."""
    from etl_project_spark.streaming.events import stream_stream_click_purchase_join

    e = _events(spark, sf_dir)
    return stream_stream_click_purchase_join(e)


@register(
    "q_stream_static_join_twin",
    oracle="""
SELECT c.c_mktsegment, e.event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(e.value), 4) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment, e.event_type
""",
    tags=("events", "join", "stream-twin"),
)
def q_stream_static_join_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static enrichment join
    (streaming/events.py::stream_static_join_segments): events enriched
    with the customer-segment dim, rolled up per (segment, type). The
    dim broadcasts — the stream side never shuffles for the join."""
    e = _events(spark, sf_dir)
    c = read_table(spark, sf_dir, "customer")
    dim = c.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    return (
        e.join(F.broadcast(dim), "user_id")
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


@register(
    "q_funnel_steps",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_view_click,
       (SELECT COUNT(*) FROM p) AS n_full_funnel
""",
    tags=("events", "funnel"),
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel: users who viewed, then clicked AFTER the
    first view, then purchased AFTER that click — strictly ordered
    steps, not mere co-occurrence (the distinction that makes funnel
    numbers honest).

    Each step is a groupBy-min plus an equi-join back on user_id with
    a time predicate — hash-partitioned on the user key throughout; the
    three scalar counts broadcast into one result row. At 100 TB each
    step's state is one timestamp per surviving user.
    """
    e = _events(spark, sf_dir)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .join(F.broadcast(c.agg(F.count(F.lit(1)).alias("n_view_click"))))
        .join(F.broadcast(p.agg(F.count(F.lit(1)).alias("n_full_funnel"))))
    )


@register(
    "q_attribution_last_touch",
    oracle="""
WITH tagged AS (
  SELECT user_id, ts, event_type, value,
         LAST_VALUE(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS view_ts
  FROM events
)
SELECT DATE_TRUNC('hour', view_ts) AS view_hour,
       COUNT(*) AS n_purchases,
       ROUND(SUM(value), 4) AS attributed_value
FROM tagged
WHERE event_type = 'purchase' AND view_ts IS NOT NULL
GROUP BY DATE_TRUNC('hour', view_ts)
""",
    tags=("events", "attribution", "window"),
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: credit each purchase to the user's most
    recent preceding view, aggregated by the view's hour.

    The marketing-analytics staple as ONE window pass — no self-join,
    no as-of range scan: ``last_value(ignorenulls)`` over a trailing
    frame carries the latest view timestamp forward within each user's
    event stream (one shuffle on user_id, in-partition sort), then
    purchases group by the attributed hour. Same shuffle count at any
    scale; frame state is O(1) per row.
    """
    e = _events(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    view_ts = F.last(
        F.when(F.col("event_type") == "view", F.col("ts")), ignorenulls=True
    ).over(w)
    tagged = e.withColumn("view_ts", view_ts)
    return (
        tagged.filter(
            (F.col("event_type") == "purchase") & F.col("view_ts").isNotNull()
        )
        .groupBy(F.date_trunc("hour", "view_ts").alias("view_hour"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 4).alias("attributed_value"),
        )
    )


@register(
    "q_scd2_user_state_intervals",
    oracle="""
WITH changes AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type IS DISTINCT FROM
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
              THEN 1 ELSE 0 END AS is_change
  FROM events
), starts AS (
  SELECT user_id, ts AS valid_from, event_type AS state,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM changes WHERE is_change = 1
)
SELECT user_id, state, valid_from, valid_to,
       (valid_to IS NULL) AS is_current
FROM starts
""",
    tags=("events", "scd2", "window"),
)
def q_scd2_user_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) intervals from an event log.

    The warehouse-ETL staple: collapse consecutive identical states
    per user into validity intervals [valid_from, valid_to), open-
    ended (NULL valid_to = current). Two window passes over ONE
    partitioning (user_id, ordered by ts) — change detection via lag,
    then interval close via lead over the change rows only — so Spark
    plans a single shuffle and sorts once; no self-join, no
    gaps-and-islands grouping subquery.
    """
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = e.withColumn(
        "is_change",
        F.when(
            ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w)), 1
        ).otherwise(0),
    ).filter(F.col("is_change") == 1)
    starts = changes.select(
        "user_id",
        F.col("ts").alias("valid_from"),
        F.col("event_type").alias("state"),
        F.lead("ts")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("valid_to"),
    )
    return starts.select(
        "user_id",
        "state",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


@register(
    "q_rolling_7d_distinct_users",
    oracle="""
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
), days AS (
  SELECT DISTINCT d FROM du
), contrib AS (
  SELECT du.user_id, CAST(du.d + o * INTERVAL 1 DAY AS DATE) AS wd
  FROM du, UNNEST(generate_series(0, 6)) AS u(o)
)
SELECT CAST(c.wd AS TIMESTAMP) AS window_day,
       CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS n_users_7d
FROM contrib c JOIN days ON days.d = c.wd
GROUP BY c.wd
""",
    tags=("events", "rolling", "distinct"),
)
def q_rolling_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day.

    COUNT(DISTINCT) over a sliding frame has no window-function form
    (distinct state isn't subtractable), and collect_set frames blow
    memory — the scalable shape is: collapse to distinct (day, user)
    pairs first (the only full-data shuffle, with map-side partial
    dedup), explode each pair into the ≤7 window-days it serves, and
    hash-aggregate the distinct count per window-day. Shuffle volume
    after the collapse is days×users×7 — independent of raw event
    count, so 100 TB of events reduces before the expansion. A
    mergeable-sketch variant (HLL per day, merge 7) trades exactness
    for one less shuffle — see q_hll_sketch_rollup.
    """
    e = _events(spark, sf_dir)
    du = e.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    days = du.select("d").distinct().withColumnRenamed("d", "window_day")
    contrib = du.select(
        "user_id",
        F.explode(
            F.array(*[F.date_add(F.col("d"), o) for o in range(7)])
        ).alias("window_day"),
    )
    return (
        contrib.join(F.broadcast(days), "window_day")
        .groupBy("window_day")
        .agg(F.count_distinct("user_id").alias("n_users_7d"))
        # DATE collects as datetime.date but the DuckDB twin surfaces
        # pandas Timestamps; emit midnight NTZ timestamps so both
        # engines hand the comparator the same value type.
        .withColumn("window_day", F.col("window_day").cast("timestamp_ntz"))
    )


@register(
    "q_state_at_purchase",
    oracle="""
WITH activity AS (
  SELECT * FROM events WHERE event_type <> 'purchase'
), changes AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type IS DISTINCT FROM
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
              THEN 1 ELSE 0 END AS is_change
  FROM activity
), intervals AS (
  SELECT user_id, ts AS valid_from, event_type AS state,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM changes WHERE is_change = 1
), purchases AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT i.state,
       COUNT(*) AS n_purchases,
       ROUND(SUM(p.value), 4) AS total_value
FROM purchases p
JOIN intervals i
  ON i.user_id = p.user_id
 AND i.valid_from <= p.ts
 AND (i.valid_to IS NULL OR p.ts < i.valid_to)
GROUP BY i.state
""",
    tags=("events", "scd2", "interval-join"),
)
def q_state_at_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join: revenue by the SCD2 state each purchase
    happened in.

    The dimension-lookup every warehouse does against a type-2 table
    ("which plan/segment/state was the entity in at event time"),
    composed entirely in-plan: validity intervals derive from the
    user's NON-purchase activity via the SCD2 window (purchases are
    the facts being looked up — deriving states from all events would
    make every purchase trivially land in its own 'purchase' interval,
    a vacuous answer), then purchases join on user plus interval
    containment. Spark plans the user_id equality as the join key with
    the containment as a post-join residual — intervals per user are
    few, so the residual filters a handful of rows per match, not a
    cross product. Intervals partition each user's activity timeline,
    so a purchase matches at most one (purchases before any activity
    drop out of the inner join).
    """
    e = _events(spark, sf_dir)
    activity = e.filter(F.col("event_type") != "purchase")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = activity.withColumn(
        "is_change",
        F.when(
            ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w)), 1
        ).otherwise(0),
    ).filter(F.col("is_change") == 1)
    intervals = changes.select(
        "user_id",
        F.col("ts").alias("valid_from"),
        F.col("event_type").alias("state"),
        F.lead("ts").over(W.partitionBy("user_id").orderBy("ts", "event_id")).alias(
            "valid_to"
        ),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    contained = (F.col("valid_from") <= F.col("ts")) & (
        F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))
    )
    return (
        purchases.join(intervals, "user_id")
        .filter(contained)
        .groupBy("state")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


@register(
    "q_time_weighted_avg_value",
    oracle="""
WITH seq AS (
  SELECT user_id, value, epoch_us(ts) AS t_us,
         LEAD(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_us
  FROM events
)
SELECT user_id,
       ROUND(SUM(value * (next_us - t_us)) / SUM(next_us - t_us), 4)
         AS twa_value,
       ROUND((MAX(next_us) - MIN(t_us)) / 1000000.0, 4) AS span_s
FROM seq
WHERE next_us IS NOT NULL
GROUP BY user_id
HAVING SUM(next_us - t_us) > 0
""",
    tags=("events", "temporal", "twa"),
)
def q_time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of `value` per user (TimescaleDB's
    `time_weight('LOCF', ...)` semantics): each observation holds its
    value until the next one, so the mean weights each reading by how
    long it was current — the correct average for irregularly-sampled
    gauges, where the arithmetic mean over-counts busy periods.

    One window pass (lead over (ts, event_id) — the total order makes
    equal-timestamp ties deterministic: tied readings get zero
    duration) then a hash aggregate; shuffle ∝ users once, reused by
    both the window and the groupBy since they share the user_id key.
    Microsecond integer arithmetic end to end — no float time math to
    diverge between engines.
    """
    e = _events(spark, sf_dir)
    # TIMESTAMP_NTZ → µs: unix_micros needs LTZ, so go via the
    # NTZ-safe cast chain used across this module.
    t_us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "value",
        t_us.alias("t_us"),
        F.lead(t_us).over(w).alias("next_us"),
    ).filter(F.col("next_us").isNotNull())
    return (
        seq.groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value") * (F.col("next_us") - F.col("t_us")))
                / F.sum(F.col("next_us") - F.col("t_us")),
                4,
            ).alias("twa_value"),
            F.round(
                (F.max("next_us") - F.min("t_us")) / F.lit(1000000.0), 4
            ).alias("span_s"),
        )
        .filter(F.col("twa_value").isNotNull())
    )


@register(
    "q_session_window_value_sums",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                   >= {SESSION_GAP_S}::BIGINT * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), islands AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS sess
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL {SESSION_GAP_S} SECONDS AS session_end,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM islands
GROUP BY user_id, sess
""",
    tags=("events", "session-window"),
)
def q_session_window_value_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session aggregates via the NATIVE `session_window` API
    (batch form of the streaming session operator).

    `q_sessionize_users` builds sessions by hand (gaps-and-islands);
    this twin exercises Spark's built-in dynamic-gap session windows —
    the same operator the streaming path uses with a watermark — and
    pins its exact merge rule against an islands oracle: a new session
    starts when the gap is ≥ 30 min (the session window [start,
    last+gap) is end-EXCLUSIVE, so an event exactly at last+gap falls
    outside — hence `>=`, unlike the hand-rolled query's documented
    `>` contract). window.end = last_ts + gap, replayed as MAX(ts) +
    INTERVAL in the oracle.

    Scale: one shuffle on user_id, then per-key in-memory merge —
    exactly the state layout the streaming twin keeps per key.
    """
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.session_window("ts", f"{SESSION_GAP_S} seconds").alias("sw"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "q_attribution_position_based",
    oracle="""
WITH tagged AS (
  SELECT user_id, event_id, ts, event_type, value,
         FIRST_VALUE(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER w AS first_view,
         LAST_VALUE(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER w AS last_view,
         COUNT(CASE WHEN event_type = 'view' THEN 1 END) OVER w AS n_touches
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, CAST(n_touches AS BIGINT) AS n_touches,
       first_view, last_view,
       ROUND(value * CASE WHEN n_touches = 1 THEN 1.0 ELSE 0.4 END, 4)
           AS first_credit,
       ROUND(value * CASE WHEN n_touches = 1 THEN 0.0
                          WHEN n_touches = 2 THEN 0.6
                          ELSE 0.4 END, 4) AS last_credit,
       ROUND(value * CASE WHEN n_touches >= 3 THEN 0.2 ELSE 0.0 END, 4)
           AS middle_credit_total
FROM tagged
WHERE event_type = 'purchase' AND n_touches >= 1
""",
    tags=("events", "attribution", "multi-touch"),
)
def q_attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: each purchase
    splits credit 40% first view / 40% last view / 20% across middles
    (collapsing to 100% and 60/40 when there are 1 or 2 touches).

    Still ONE window pass (same shuffle as last-touch attribution):
    first/last/count over the trailing frame give every positional
    quantity the credit rule needs — no per-touch explode, no
    purchase-to-view range join, so the plan's cost is identical to
    the single-touch version at any scale.
    """
    e = _events(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    tagged = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "value",
        F.first(view_ts, ignorenulls=True).over(w).alias("first_view"),
        F.last(view_ts, ignorenulls=True).over(w).alias("last_view"),
        F.count(view_ts).over(w).alias("n_touches"),
    )
    n = F.col("n_touches")
    v = F.col("value")
    return tagged.filter((F.col("event_type") == "purchase") & (n >= 1)).select(
        "event_id",
        "user_id",
        n.cast("long").alias("n_touches"),
        "first_view",
        "last_view",
        F.round(v * F.when(n == 1, 1.0).otherwise(0.4), 4).alias("first_credit"),
        F.round(
            v * F.when(n == 1, 0.0).when(n == 2, 0.6).otherwise(0.4), 4
        ).alias("last_credit"),
        F.round(v * F.when(n >= 3, 0.2).otherwise(0.0), 4).alias("middle_credit_total"),
    )


@register(
    "q_top_session_paths",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR DATE_DIFF('second', LAG(ts) OVER w, ts) > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *,
         CAST(SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
  FROM flagged
), paths AS (
  SELECT user_id, session_no,
         ARRAY_TO_STRING(LIST(event_type ORDER BY ts, event_id)[1:3], '>') AS path,
         COUNT(*) AS session_len
  FROM numbered
  GROUP BY user_id, session_no
)
SELECT path,
       COUNT(*) AS n_sessions,
       ROUND(AVG(session_len), 4) AS avg_session_len
FROM paths
GROUP BY path
""",
    tags=("events", "paths", "sessionize"),
)
def q_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session entry paths: the first three event types of every
    session (joined with '>'), with session counts and mean length —
    the clickstream 'how do journeys start' rollup.

    Reuses the gap-sessionization window, then per-session paths via
    an ORDERED collect truncated to 3. The collected array is bounded
    by session length (the 30-minute gap caps it in practice — the
    same per-key-bounded contract as every sequence op here), and the
    output space is ≤ |event_types|³ rows, so the final agg is
    trivially small at any corpus size.
    """
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = F.unix_timestamp(F.col("ts"))
    gap_s = ts_s - F.lag(ts_s).over(w)
    numbered = e.withColumn(
        "new_session",
        F.when(gap_s.isNull() | (gap_s > SESSION_GAP_S), 1).otherwise(0),
    ).withColumn(
        "session_no",
        F.sum("new_session")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long"),
    )
    paths = numbered.groupBy("user_id", "session_no").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                1,
                3,
            ),
            ">",
        ).alias("path"),
        F.count(F.lit(1)).alias("session_len"),
    )
    return paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("session_len"), 4).alias("avg_session_len"),
    )


@register(
    "q_time_to_convert",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events
  GROUP BY user_id
)
SELECT CAST(FLOOR(DATE_DIFF('second', first_view, first_purchase) / 3600.0) AS BIGINT)
           AS hours_to_convert,
       COUNT(*) AS n_users
FROM firsts
WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
  AND first_purchase >= first_view
GROUP BY 1
""",
    tags=("events", "funnel", "conversion"),
)
def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: hours from each user's first view
    to their first purchase (users who purchased before ever viewing
    are excluded — they didn't convert THROUGH the funnel).

    One conditional-MIN hash-agg per user, then an hour-bucket rollup —
    no joins, no windows; the funnel-latency histogram at any scale is
    two aggregations.
    """
    e = _events(spark, sf_dir)
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    secs = F.unix_timestamp("first_purchase") - F.unix_timestamp("first_view")
    return (
        firsts.where(
            F.col("first_view").isNotNull()
            & F.col("first_purchase").isNotNull()
            & (F.col("first_purchase") >= F.col("first_view"))
        )
        .groupBy(F.floor(secs / 3600.0).cast("long").alias("hours_to_convert"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "q_running_distinct_event_types",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM events
)
SELECT user_id, event_id,
       CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS distinct_types_so_far
FROM flagged
""",
    tags=("events", "window", "running-distinct"),
)
def q_running_distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over an event stream — the window SQL
    can't express directly — via the first-occurrence-flag trick: mark
    each (user, type)'s first row with one window, running-SUM the
    flags with another.

    Two windows over the SAME (user_id)-keyed sort — one shuffle, no
    distinct-aggregate state. The standard rewrite whenever "distinct
    so far" is needed at scale.
    """
    e = _events(spark, sf_dir)
    w_first = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    flagged = e.withColumn(
        "first_seen",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("first_seen").over(w_run).cast("long").alias("distinct_types_so_far"),
    )


@register(
    "q_dow_hour_activity",
    oracle="""
SELECT CAST(dayofweek(ts) AS INTEGER) AS dow,
       CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
       COUNT(*) AS n_events,
       ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (), 6) AS share
FROM events
GROUP BY 1, 2
""",
    tags=("events", "calendar", "heatmap"),
)
def q_dow_hour_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity matrix with global shares — the
    calendar heatmap behind staffing/alerting baselines. One hash-agg
    to ≤168 cells; the normalizing window runs over those cells.

    DuckDB's dayofweek is 0=Sunday..6; Spark's is 1=Sunday..7 — the
    plan subtracts 1 to pin the 0-based contract.
    """
    e = _events(spark, sf_dir)
    agg = e.groupBy(
        (F.dayofweek("ts") - 1).cast("integer").alias("dow"),
        F.hour("ts").cast("integer").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return agg.select(
        "dow",
        "hour",
        "n_events",
        F.round(
            F.col("n_events") * 1.0 / F.sum("n_events").over(W.partitionBy()), 6
        ).alias("share"),
    )
