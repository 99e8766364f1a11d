"""Streaming event pipeline: watermarked windows, sessionization, dedup.

The reference has no streaming surface (SURVEY.md §2.5); this module is
the north-star extension (§7.2 step 5) built entirely on Structured
Streaming primitives. Design notes for scale:

- Source is a file stream over the same parquet layout as the batch
  catalog — swap in Kafka by replacing :func:`read_events_stream`; every
  downstream operator is source-agnostic.
- All stateful ops carry a watermark so state is bounded: late rows
  beyond the watermark are dropped deterministically instead of growing
  executor state forever.
- Aggregations shuffle on (window, key) — low-cardinality windows with
  high-cardinality keys hash-spread evenly; no global state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema of the events table (FIXTURES.md); file streams require an
#: explicit schema — inference is a batch-only convenience. ``ts`` is
#: parquet ``timestamp[us]`` with ``isAdjustedToUTC=false``, which
#: Spark 4 reads as TIMESTAMP_NTZ — declared as such so watermarks and
#: window() operate on a real timestamp with no conversion step.
#: (Earlier corpus drops stored TIMESTAMP(NANOS); the batch catalog's
#: ``normalize_nanos_timestamps`` still handles that long-typed shape.)
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, *, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-stream source over an events parquet directory.

    ``maxFilesPerTrigger`` is the micro-batch size knob (≙ the
    reference's source-side concurrency cap, docker-compose.yml:101).
    """
    from etl_project_spark.session import tune_session

    tune_session(spark)
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    # Watermarks demand TIMESTAMP (LTZ) event time —
    # EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise. The NTZ→LTZ cast
    # interprets wall-clock in the session zone; tune_session pins UTC
    # so batch twins (which aggregate the NTZ column directly) see the
    # same instants.
    return raw.withColumn("ts", F.col("ts").cast("timestamp_ltz"))


def stream_tumbling_counts(
    events: DataFrame, *, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts per event type.

    Batch twin: plans/events.py::q_tumbling_hourly_counts.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
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


def stream_sliding_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window event counts — each event lands in window/slide panes."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
        )
    )


def stream_session_windows(
    events: DataFrame, *, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based session windows per user (built-in session_window).

    Batch twin: plans/events.py::q_sessionize_users (lag + cumulative
    flag formulation of the same gap semantics).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def stream_dedup_events(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """Stateful exact dedup on event_id ALONE within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` (Spark 3.5+) keys state on just
    ``event_id`` while still expiring it at the watermark — so an
    at-least-once redelivery with a jittered timestamp (same id, ts a
    few seconds off) IS removed, which plain
    ``dropDuplicates([id, ts])`` would miss. An id seen again after the
    watermark has passed is treated as new — the documented trade-off
    of bounded-state streaming dedup.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_stream_click_purchase_join(
    events: DataFrame, *, watermark: str = "2 hours", horizon_minutes: int = 60
) -> DataFrame:
    """Stream-stream interval join: purchases attributed to the click
    that preceded them within ``horizon_minutes`` for the same user.

    Both sides carry a watermark and the join condition bounds the
    event-time distance, so each side's buffered state is evictable:
    a click older than watermark + horizon can never match a future
    purchase and is dropped. This is the canonical funnel/attribution
    join — unbounded state without the time bound, bounded with it.
    State shuffles on user_id (hash-spread, no hot key at scale).

    Batch twin: plans/events.py::q_stream_stream_join_twin.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        )
    )
    return clicks.join(purchases, cond).select(
        F.col("c_user_id").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        F.round("value", 4).alias("purchase_value"),
    )


def stream_static_join_segments(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static enrichment join: per-segment event rollup.

    The streaming analogue of the reference's enrichment stage
    (flows/etl.py:186-242): each micro-batch joins against a static
    dimension — here customer segments keyed by user_id — then
    aggregates. Stream-static joins need no watermark (the static side
    is re-broadcast per batch, state-free); the aggregate shuffles on
    (segment, type), both low-cardinality.

    Batch twin: plans/events.py::q_stream_static_join_twin.
    """
    dim = customers.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        events.join(F.broadcast(dim), "user_id")
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def run_to_memory_sink(
    df: DataFrame, query_name: str, *, timeout_s: float = 120.0
) -> None:
    """Drive a streaming DataFrame to completion against a memory sink.

    Test/demo helper: processes all available input (one trigger per
    micro-batch) and blocks until the stream is idle. Complete mode for
    aggregations, append for dedup-style passthroughs.
    """
    mode = "complete" if df.isStreaming and _has_aggregate(df) else "append"
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)


def _has_aggregate(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().analyzed().toString()
    return "Aggregate" in plan


# -- custom stateful operator (transformWithStateInPandas, Spark 4) ---------

def stream_user_totals_tws(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """Per-user running totals on the Spark 4 arbitrary-state v2 API
    (``transformWithStateInPandas``).

    Same semantics as :func:`stream_user_running_totals` but on the
    newer StatefulProcessor contract: typed ValueState handles, an
    explicit init/close lifecycle, and (unlike the v1 API) support for
    state TTL, timers, and multiple state variables per key — the seam
    for session models, decaying counters, or online feature state.
    State lives in the state store partitioned by user_id.

    Environment note: executing this requires (a) the RocksDB state
    store provider (``spark.sql.streaming.stateStore.providerClass``)
    and (b) the ``protobuf`` package for the state-server protocol —
    absent in this sandbox, so the integration test skips unless
    protobuf imports; the v1 operator above is the tested path here.
    """
    import pandas as pd

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql import types as T

    state_schema = T.StructType(
        [
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, total = (0, 0.0)
            if self._state.exists():
                n, total = self._state.get()
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 4)],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotals(),
            outputStructType="user_id BIGINT, n_events BIGINT, total_value DOUBLE",
            outputMode="Update",
            timeMode="None",
        )
    )


# -- custom stateful operator (applyInPandasWithState) ----------------------

RUNNING_STATE_SCHEMA = "n_events BIGINT, total_value DOUBLE"
RUNNING_OUTPUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, total_value DOUBLE, avg_value DOUBLE"
)


def stream_user_running_totals(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """Per-user running totals via a custom stateful operator.

    ``applyInPandasWithState`` is the arbitrary-state seam Structured
    Streaming offers for operators the built-ins can't express (custom
    accumulators, decaying counters, model state). State here is the
    (count, sum) pair per user; each micro-batch emits the user's
    updated running aggregate. State is partitioned by key across
    executors — no global state, scales with the key space.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 4)],
                "avg_value": [round(total / n, 4) if n else 0.0],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_OUTPUT_SCHEMA,
            stateStructType=RUNNING_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


ATTRIBUTION_STATE_SCHEMA = "last_view_us BIGINT, last_view_eid BIGINT"
ATTRIBUTION_OUTPUT_SCHEMA = (
    "user_id BIGINT, purchase_ts TIMESTAMP, view_ts TIMESTAMP, value DOUBLE"
)


def stream_attribution_last_touch(
    events: DataFrame, *, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming last-touch attribution: each purchase is credited to
    the user's most recent view seen so far.

    Batch twin: plans/events.py::q_attribution_last_touch (the
    last_value-ignorenulls window). Streaming can't look back over an
    unbounded frame, so the "latest view timestamp" becomes explicit
    keyed state — 8 bytes per user, the smallest possible stateful
    operator. Each micro-batch sorts its group slice by event time
    (arrival order within a batch is not time order), advances the
    state through views, and emits one attributed row per purchase
    that has a preceding view. State is hash-partitioned by user_id
    across executors; no global ordering is needed because attribution
    only reads one user's own timeline.

    Cross-batch disorder contract: a purchase that arrives AFTER a
    later view has already advanced the state (purchase before the
    view in (ts, event_id) order) cannot be attributed correctly — the
    view it should credit is gone. Such rows are DROPPED
    deterministically (the watermark late-data policy), never credited
    to a future view. Time-ordered sources and single-batch
    availableNow drains hit no drops and match the batch twin exactly;
    out-of-order feeds lose only the provably mis-attributable
    purchases.

    State is (last_view_us, last_view_eid): the event id rides along
    so EQUAL-timestamp ties resolve by event id across batches exactly
    as the batch twin's ``ORDER BY ts, event_id`` frame does — with
    time alone in state, a later-batch purchase at a tied timestamp
    was credited to a view the batch window places after it (round-5
    advice). Ordering is lexicographic on (ts, event_id) everywhere.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState

    def attribute(key, pdfs, state: GroupState):
        last_view_us, last_view_eid = state.get if state.exists else (None, None)
        out_user, out_pts, out_vts, out_val = [], [], [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for row in pdf.itertuples():
                ts_us = row.ts.value // 1000  # pandas ns → µs
                key_now = (ts_us, int(row.event_id))
                if row.event_type == "view":
                    if last_view_us is None or key_now > (last_view_us, last_view_eid):
                        last_view_us, last_view_eid = key_now
                elif (
                    row.event_type == "purchase"
                    and last_view_us is not None
                    # late-drop guard: state already advanced past this
                    # purchase's (ts, event_id) position → attribution
                    # would credit a view the batch frame orders AFTER
                    # the purchase; drop instead (see docstring).
                    and (last_view_us, last_view_eid) < key_now
                ):
                    out_user.append(key[0])
                    out_pts.append(row.ts)
                    out_vts.append(pd.Timestamp(last_view_us * 1000))
                    out_val.append(float(row.value))
        if last_view_us is not None:
            state.update((last_view_us, last_view_eid))
        yield pd.DataFrame(
            {
                "user_id": out_user,
                "purchase_ts": out_pts,
                "view_ts": out_vts,
                "value": out_val,
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            attribute,
            outputStructType=ATTRIBUTION_OUTPUT_SCHEMA,
            stateStructType=ATTRIBUTION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


SCD2_STATE_SCHEMA = "cur_state STRING, valid_from_us BIGINT"
SCD2_OUTPUT_SCHEMA = (
    "user_id BIGINT, state STRING, valid_from TIMESTAMP, valid_to TIMESTAMP"
)


def stream_scd2_user_state(
    events: DataFrame, *, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming SCD type-2: emit a closed validity interval each time
    a user's event-type state changes.

    Batch twin: plans/events.py::q_scd2_user_state_intervals. The
    batch form closes intervals with lead(); a stream cannot look
    ahead, so the closer is keyed state — (current state, its start) —
    and each transition emits the interval it terminates. The still-
    open interval lives only in state, exactly the CDC contract: a
    dimension row is published once its successor arrives. State is
    two fields per user, hash-partitioned; within-batch rows sort by
    event time before folding so arrival order never reorders
    transitions.

    Cross-batch disorder contract: a row older than the open
    interval's start (possible when a later micro-batch carries
    earlier event time, within the watermark) would close an INVERTED
    interval (valid_from > valid_to); such rows are DROPPED
    deterministically — the watermark late-data policy — so emitted
    intervals always satisfy valid_from <= valid_to. Time-ordered
    sources and single-batch availableNow drains hit no drops and
    match the batch twin's closed intervals exactly.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState

    def close_intervals(key, pdfs, state: GroupState):
        cur, start_us = state.get if state.exists else (None, None)
        out_state, out_from, out_to = [], [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for row in pdf.itertuples():
                ts_us = row.ts.value // 1000
                if cur is None:
                    cur, start_us = row.event_type, ts_us
                elif ts_us < start_us:
                    # late-drop guard: closing here would emit an
                    # inverted interval (see docstring).
                    continue
                elif row.event_type != cur:
                    out_state.append(cur)
                    out_from.append(pd.Timestamp(start_us * 1000))
                    out_to.append(row.ts)
                    cur, start_us = row.event_type, ts_us
        if cur is not None:
            state.update((cur, start_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out_state),
                "state": out_state,
                "valid_from": out_from,
                "valid_to": out_to,
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            close_intervals,
            outputStructType=SCD2_OUTPUT_SCHEMA,
            stateStructType=SCD2_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


def stream_ohlc_bars(
    events: DataFrame, *, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling OHLC bars per event type.

    Batch twin: plans/timeseries.py::q_ohlc_hourly_value — the same
    single-pass min_by/max_by aggregate list, swapped under a
    watermarked window so late ticks beyond the watermark drop instead
    of reopening a closed bar.
    """
    okey = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.min_by("value", okey).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", okey).alias("close"),
            F.count(F.lit(1)).alias("volume"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("bar_hour"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "volume",
            "total_value",
        )
    )


TRANSITION_STATE_SCHEMA = "last_ts_us BIGINT, last_eid BIGINT, last_type STRING"
TRANSITION_OUTPUT_SCHEMA = (
    "user_id BIGINT, prev_type STRING, next_type STRING, ts TIMESTAMP"
)


def stream_transition_pairs(
    events: DataFrame, *, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming Markov-transition extraction: one (prev_type,
    next_type) row per consecutive event in each user's timeline,
    carried across micro-batches by keyed state.

    Batch twin: plans/timeseries.py::q_event_transition_matrix (the
    LAG window) — the matrix itself is a downstream aggregate of these
    pairs. State is the user's last (ts_us, event_id, type); each
    batch sorts its slice by (ts, event_id) and advances through it.
    Cross-batch disorder contract (same as attribution): a row whose
    (ts, event_id) sorts at-or-before the state position would emit a
    transition the batch LAG orders differently — such rows DROP
    deterministically instead of corrupting the chain.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState

    def transit(key, pdfs, state: GroupState):
        last_us, last_eid, last_type = (
            state.get if state.exists else (None, None, None)
        )
        out_prev, out_next, out_ts = [], [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for row in pdf.itertuples():
                ts_us = row.ts.value // 1000
                key_now = (ts_us, int(row.event_id))
                if last_us is not None and key_now <= (last_us, last_eid):
                    continue  # late arrival: chain already advanced past it
                if last_type is not None:
                    out_prev.append(last_type)
                    out_next.append(row.event_type)
                    out_ts.append(row.ts)
                last_us, last_eid = key_now
                last_type = row.event_type
        if last_us is not None:
            state.update((last_us, last_eid, last_type))
        yield pd.DataFrame(
            {
                "user_id": key[0],
                "prev_type": out_prev,
                "next_type": out_next,
                "ts": out_ts,
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            transit,
            outputStructType=TRANSITION_OUTPUT_SCHEMA,
            stateStructType=TRANSITION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


def stream_stream_left_outer_join(
    events: DataFrame, *, watermark: str = "30 minutes", horizon_minutes: int = 60
) -> DataFrame:
    """LEFT OUTER stream-stream join: every click, with its in-horizon
    purchase when one exists and NULLs once the watermark proves none
    can arrive.

    The outer flavor is the capability inner joins can't express in
    streaming: the null-padded row for an unmatched click may only
    emit after the purchase-side watermark passes click_ts + horizon
    (before that a match could still arrive), so unmatched results
    trail matched ones by the watermark delay — clicks inside the
    final watermark window of a drained stream stay unemitted, which
    the test accounts for by restricting the comparison to the
    provably-flushed region.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        )
    )
    return clicks.join(purchases, cond, "left_outer").select(
        F.col("c_user_id").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
    )
