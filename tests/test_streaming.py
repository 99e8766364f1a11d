"""Streaming operators driven end to end with file-stream input and
memory sinks, checked against their registered batch twins (same
logical semantics ⇒ same results once the stream drains).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_project_spark.catalog import table_path
from etl_project_spark.streaming import events as SE
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def events_path(tmp_path_factory):
    """File-stream sources need a directory; the corpus is one parquet
    file — stage a symlink dir (read-only, testdata untouched)."""
    d = tmp_path_factory.mktemp("events_stream")
    (d / "events.parquet").symlink_to(table_path(SF_ORACLE, "events"))
    return str(d)


def _drain(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if name != "dedup" else "append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain in time"


def test_stream_tumbling_matches_batch(spark, events_path):
    stream = SE.read_events_stream(spark, events_path)
    assert stream.isStreaming
    _drain(SE.stream_tumbling_counts(stream), "tumbling")
    got = {
        (r.win_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM tumbling").collect()
    }
    from etl_project_spark.plans.registry import all_specs

    batch = all_specs()["q_tumbling_hourly_counts"].builder(spark, SF_ORACLE)
    want = {
        (r.win_start, r.event_type): (r.n_events, r.total_value)
        for r in batch.collect()
    }
    assert got == want


def test_stream_session_windows_drain(spark, events_path):
    stream = SE.read_events_stream(spark, events_path)
    _drain(SE.stream_session_windows(stream, gap="30 minutes"), "sessions")
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert rows
    for r in rows:
        assert r.session_end >= r.session_start
        assert r.n_events >= 1


def test_stream_session_windows_match_batch_twin(spark, events_path):
    """Full equivalence with the oracle-backed batch twin: the
    streaming session_window drained over the whole corpus must yield
    the EXACT session set (boundaries, counts, sums) that
    q_session_window_value_sums computes in batch — pinning that the
    incremental merge and the batch merge share one gap rule."""
    stream = SE.read_events_stream(spark, events_path)
    _drain(SE.stream_session_windows(stream, gap="30 minutes"), "sessions_eq")
    got = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.session_value)
        for r in spark.sql("SELECT * FROM sessions_eq").collect()
    }
    from etl_project_spark.plans.registry import all_specs

    batch = all_specs()["q_session_window_value_sums"].builder(spark, SF_ORACLE)
    want = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.total_value)
        for r in batch.collect()
    }
    assert got == want


def test_stream_stream_join_matches_batch(spark, events_path):
    """Stream-stream interval join drained over the full corpus must
    equal the batch twin (same condition, no late data in the fixture
    so the watermark drops nothing)."""
    stream = SE.read_events_stream(spark, events_path)
    q = (
        SE.stream_stream_click_purchase_join(stream)
        .writeStream.format("memory")
        .queryName("ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM ssjoin").collect()
    }
    from etl_project_spark.plans.registry import all_specs

    batch = all_specs()["q_stream_stream_join_twin"].builder(spark, SF_ORACLE)
    want = {(r.user_id, r.click_id, r.purchase_id) for r in batch.collect()}
    assert got == want
    assert want  # fixture must actually produce attributed purchases


def test_stream_dedup_removes_jittered_replays(spark, tmp_path):
    """At-least-once redelivery: same event_id, timestamp jittered by a
    few seconds. Id-only dedup (dropDuplicatesWithinWatermark) must
    emit each id once — the (id, ts)-keyed formulation would leak the
    replicas through."""
    import datetime

    base = datetime.datetime(2023, 11, 14, 22, 13, 20)  # naive → NTZ
    rows = []
    for eid in range(10):
        for jitter_s in (0, 3, 7):  # original + two jittered replays
            rows.append((
                eid, eid % 4, "click",
                base + datetime.timedelta(seconds=eid * 60 + jitter_s),
                1.0, "{}",
            ))
    src = str(tmp_path / "replayed")
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp_ntz, value double, props string",
    ).repartition(2).write.parquet(src)

    stream = SE.read_events_stream(spark, src)
    q = (
        SE.stream_dedup_events(stream)
        .writeStream.format("memory")
        .queryName("dedup_replay")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    out = spark.sql("SELECT event_id, COUNT(*) AS n FROM dedup_replay GROUP BY 1").collect()
    assert len(out) == 10
    assert all(r.n == 1 for r in out)


def test_stream_dedup_removes_nothing_on_unique_ids(spark, events_path):
    stream = SE.read_events_stream(spark, events_path)
    q = (
        SE.stream_dedup_events(stream)
        .writeStream.format("memory")
        .queryName("dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    n_stream = spark.sql("SELECT COUNT(*) AS n FROM dedup").collect()[0].n
    n_batch = spark.read.parquet(events_path).count()
    # event_id is unique in the corpus → dedup must be a no-op.
    assert n_stream == n_batch


def test_stream_sliding_counts_cover_tumbling(spark, events_path):
    stream = SE.read_events_stream(spark, events_path)
    _drain(SE.stream_sliding_counts(stream, window="1 hour", slide="30 minutes"), "sliding")
    rows = spark.sql("SELECT * FROM sliding").collect()
    assert rows
    # every event lands in window/slide = 2 panes → total pane-events
    # is exactly 2x the tumbling total
    total_pane_events = sum(r.n_events for r in rows)
    n_events = spark.read.parquet(events_path).count()
    assert total_pane_events == 2 * n_events


def test_stream_custom_stateful_running_totals(spark, events_path):
    stream = SE.read_events_stream(spark, events_path)
    q = (
        SE.stream_user_running_totals(stream)
        .writeStream.format("memory")
        .queryName("running")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    # Final state per user must equal the batch aggregate.
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql(
            "SELECT user_id, n_events, total_value FROM running"
        ).collect()
    }
    batch = (
        spark.read.parquet(events_path)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("t"))
        .collect()
    )
    for r in batch:
        assert got[r.user_id] == (r.n, r.t)


def test_stream_static_join_matches_batch(spark, events_path):
    from etl_project_spark.catalog import read_table
    from etl_project_spark.plans.registry import all_specs

    stream = SE.read_events_stream(spark, events_path)
    customers = read_table(spark, SF_ORACLE, "customer")
    _drain(SE.stream_static_join_segments(stream, customers), "segjoin")
    got = {
        (r.c_mktsegment, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM segjoin").collect()
    }
    batch = all_specs()["q_stream_static_join_twin"].builder(spark, SF_ORACLE)
    want = {
        (r.c_mktsegment, r.event_type): (r.n_events, r.total_value)
        for r in batch.collect()
    }
    assert got == want


def test_checkpoint_restart_is_exactly_once(spark, events_path, tmp_path):
    """File sink + checkpoint: draining, restarting from the same
    checkpoint, and draining again must not reprocess or duplicate —
    the exactly-once contract recovery depends on at scale."""
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain_once():
        stream = SE.read_events_stream(spark, events_path)
        q = (
            SE.stream_dedup_events(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "stream did not drain in time"

    drain_once()
    first = spark.read.parquet(sink).count()
    assert first > 0
    drain_once()  # restart from checkpoint: input unchanged → no new rows
    assert spark.read.parquet(sink).count() == first


def test_foreachbatch_incremental_merge(spark, events_path, tmp_path):
    """foreachBatch: per-micro-batch custom sink logic (the streaming
    MERGE pattern). Accumulate per-type counts across batches into a
    driver dict; the final state must equal the batch aggregation."""
    totals: dict[str, int] = {}

    def upsert(batch_df, batch_id):
        for r in batch_df.groupBy("event_type").count().collect():
            totals[r.event_type] = totals.get(r.event_type, 0) + r["count"]

    stream = SE.read_events_stream(spark, events_path, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    from etl_project_spark.catalog import read_table

    want = {
        r.event_type: r["count"]
        for r in read_table(spark, SF_ORACLE, "events").groupBy("event_type").count().collect()
    }
    assert totals == want


def test_stream_tws_running_totals_matches_batch(spark, events_path):
    """transformWithStateInPandas (arbitrary-state v2): final per-user
    totals must equal the batch aggregate — same check as the v1
    applyInPandasWithState operator above.

    Skips when protobuf is unavailable (the TWS state-server protocol
    needs it; not shipped in this sandbox) — the v1 operator test above
    covers the semantics either way."""
    pytest.importorskip("google.protobuf")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        _run_tws_assertions(spark, events_path)
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def _run_tws_assertions(spark, events_path):
    stream = SE.read_events_stream(spark, events_path)
    q = (
        SE.stream_user_totals_tws(stream)
        .writeStream.format("memory")
        .queryName("tws_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql(
            "SELECT user_id, n_events, total_value FROM tws_totals"
        ).collect()
    }
    batch = (
        spark.read.parquet(events_path)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("t"))
        .collect()
    )
    for r in batch:
        assert got[r.user_id] == (r.n, r.t)


def test_paginated_source_streams_pages_as_microbatches(spark):
    """The custom data source's streaming mode: pages become
    micro-batches (offset = page cursor), draining exactly the rows the
    batch scan would read."""
    import time

    from etl_project_spark.sources.paginated import (
        SyntheticShopFetcher,
        register_paginated_source,
    )

    register_paginated_source(spark)
    stream = (
        spark.readStream.format("paginated_table")
        .option("n_rows", 250)
        .option("rows_per_page", 100)
        .option("pages_per_trigger", 2)
        .load()
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("paged_stream")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT COUNT(*) AS n FROM paged_stream").collect()[0].n >= 250:
                break
            time.sleep(1)
    finally:
        q.stop()
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM paged_stream").collect())
    fetcher = SyntheticShopFetcher(n_rows=250, rows_per_page=100)
    want = sorted(row for p in range(3) for row in fetcher.fetch_page(p))
    assert got == want


def test_watermark_drops_late_rows(spark, tmp_path):
    """Late-data policy: a row arriving AFTER the watermark has passed
    its window is dropped deterministically. Two micro-batches through
    one checkpoint: batch 1 establishes event-time ~T, batch 2 appends
    a row 10 hours older than T (far beyond the 2h watermark) plus a
    fresh row. The late row must not appear in any emitted window; the
    fresh row's window must."""
    import datetime

    base_ts = datetime.datetime(2023, 11, 14, 22, 13, 20)  # naive → NTZ
    hour = datetime.timedelta(hours=1)

    def write_batch(rows, name):
        spark.createDataFrame(
            rows,
            "event_id long, user_id long, event_type string, ts timestamp_ntz, value double, props string",
        ).coalesce(1).write.mode("append").parquet(src)

    src = str(tmp_path / "late_src")
    sink = str(tmp_path / "late_sink")
    ckpt = str(tmp_path / "late_ckpt")

    def drain():
        stream = SE.read_events_stream(spark, src, max_files_per_trigger=1)
        q = (
            SE.stream_tumbling_counts(stream, window="1 hour", watermark="2 hours")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    # batch 1: 3 events at T and T+1h — advances the watermark to ~T+1h-2h
    write_batch(
        [(1, 1, "click", base_ts, 1.0, "{}"),
         (2, 1, "click", base_ts + hour, 1.0, "{}"),
         (3, 1, "click", base_ts + hour + datetime.timedelta(microseconds=1), 1.0, "{}")],
        "b1",
    )
    drain()
    # batch 2: one VERY late row (T - 10h, beyond watermark) + one fresh
    # row (T + 4h) that pushes the old windows past the watermark so
    # append mode finalizes them.
    write_batch(
        [(4, 1, "click", base_ts - 10 * hour, 99.0, "{}"),
         (5, 1, "click", base_ts + 4 * hour, 1.0, "{}")],
        "b2",
    )
    drain()
    # third drain with another advancing row finalizes remaining windows
    write_batch([(6, 1, "click", base_ts + 8 * hour, 1.0, "{}")], "b3")
    drain()

    out = spark.read.parquet(sink)
    starts = sorted(r.win_start for r in out.select("win_start").collect())

    late_window = base_ts - 10 * hour
    assert all(s.hour != late_window.hour or s.day != late_window.day for s in starts), starts
    # the finalized early windows carry only the on-time rows
    total = sum(r.n_events for r in out.collect())
    assert total >= 3  # events 1-3 finalized; late event 4 never counted
    assert not any(abs(r.total_value - 99.0) < 1e-9 for r in out.collect())


def test_stream_attribution_matches_batch_window(spark, events_path):
    """The stateful streaming attribution must agree with the batch
    last_value-ignorenulls window on the same corpus: identical
    (user, purchase_ts, view_ts, value) rows once the stream drains."""
    stream = SE.read_events_stream(spark, events_path)
    q = (
        SE.stream_attribution_last_touch(stream)
        .writeStream.format("memory")
        .queryName("attribution")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        (r.user_id, r.purchase_ts, r.view_ts, round(r.value, 6))
        for r in spark.sql("SELECT * FROM attribution").collect()
    }

    from pyspark.sql import Window as W

    e = spark.read.parquet(str(events_path))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    view_ts = F.last(
        F.when(F.col("event_type") == "view", F.col("ts")), ignorenulls=True
    ).over(w)
    want = {
        (r.user_id, r.ts, r.view_ts, round(r.value, 6))
        for r in e.withColumn("view_ts", view_ts)
        .filter((F.col("event_type") == "purchase") & F.col("view_ts").isNotNull())
        .select("user_id", "ts", "view_ts", "value")
        .collect()
    }
    assert got == want
    assert got  # non-vacuous: the corpus has view-preceded purchases


def test_stream_scd2_closed_intervals_match_batch(spark, events_path):
    """The streaming SCD2 closer must emit exactly the batch twin's
    CLOSED intervals (the open interval stays in state — the CDC
    publish-on-successor contract)."""
    stream = SE.read_events_stream(spark, events_path)
    q = (
        SE.stream_scd2_user_state(stream)
        .writeStream.format("memory")
        .queryName("scd2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        (r.user_id, r.state, r.valid_from, r.valid_to)
        for r in spark.sql("SELECT * FROM scd2").collect()
    }

    from etl_project_spark.plans.registry import all_specs

    batch = all_specs()["q_scd2_user_state_intervals"].builder(spark, SF_ORACLE)
    want = {
        (r.user_id, r.state, r.valid_from, r.valid_to)
        for r in batch.filter(F.col("valid_to").isNotNull()).collect()
    }
    assert got == want
    assert got  # corpus produces real transitions


def test_stream_attribution_state_survives_restart(spark, tmp_path):
    """A purchase arriving in a second drain (fresh query object, same
    checkpoint) must be attributed to a view seen in the FIRST drain —
    proving the keyed state round-trips through the state store."""
    import datetime

    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    src = str(tmp_path / "attr_src")
    sink = str(tmp_path / "attr_sink")
    ckpt = str(tmp_path / "attr_ckpt")

    def write_batch(rows):
        spark.createDataFrame(
            rows,
            "event_id long, user_id long, event_type string, ts timestamp_ntz, value double, props string",
        ).coalesce(1).write.mode("append").parquet(src)

    def drain():
        stream = SE.read_events_stream(spark, src, max_files_per_trigger=1)
        q = (
            SE.stream_attribution_last_touch(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    # drain 1: only a view — nothing emitted, state holds its ts
    write_batch([(1, 7, "view", base, 0.0, "{}")])
    drain()
    # drain 2 (restart from checkpoint): purchase 30 min later
    write_batch([(2, 7, "purchase", base + datetime.timedelta(minutes=30), 42.0, "{}")])
    drain()

    out = spark.read.parquet(sink).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.user_id, r.value) == (7, 42.0)
    assert r.view_ts == base  # attributed to the pre-restart view


def test_stream_attribution_drops_cross_batch_late_purchase(spark, tmp_path):
    """Cross-batch event-time disorder: a purchase OLDER than a view
    already folded into state must be dropped (late policy), never
    credited to the future view."""
    import datetime

    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    src = str(tmp_path / "late_attr_src")
    sink = str(tmp_path / "late_attr_sink")
    ckpt = str(tmp_path / "late_attr_ckpt")

    def write_batch(rows):
        spark.createDataFrame(
            rows,
            "event_id long, user_id long, event_type string, ts timestamp_ntz, value double, props string",
        ).coalesce(1).write.mode("append").parquet(src)

    def drain():
        stream = SE.read_events_stream(spark, src, max_files_per_trigger=1)
        q = (
            SE.stream_attribution_last_touch(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    write_batch([(1, 7, "view", base, 0.0, "{}")])
    drain()
    # batch 2: purchase 30 min BEFORE the already-seen view
    write_batch([(2, 7, "purchase", base - datetime.timedelta(minutes=30), 9.0, "{}")])
    drain()
    # batch 3: an on-time purchase still works afterwards
    write_batch([(3, 7, "purchase", base + datetime.timedelta(minutes=5), 5.0, "{}")])
    drain()

    out = spark.read.parquet(sink).collect()
    assert [(r.value, r.view_ts) for r in out] == [(5.0, base)]


def test_stream_scd2_never_emits_inverted_intervals_on_disorder(spark, tmp_path):
    """A state row older than the open interval's start (cross-batch
    disorder) is dropped; every emitted interval satisfies
    valid_from <= valid_to."""
    import datetime

    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    src = str(tmp_path / "late_scd_src")
    sink = str(tmp_path / "late_scd_sink")
    ckpt = str(tmp_path / "late_scd_ckpt")

    def write_batch(rows):
        spark.createDataFrame(
            rows,
            "event_id long, user_id long, event_type string, ts timestamp_ntz, value double, props string",
        ).coalesce(1).write.mode("append").parquet(src)

    def drain():
        stream = SE.read_events_stream(spark, src, max_files_per_trigger=1)
        q = (
            SE.stream_scd2_user_state(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    write_batch([(1, 7, "click", base, 0.0, "{}")])
    drain()
    # batch 2: a view BEFORE the open interval's start — must be dropped
    write_batch([(2, 7, "view", base - datetime.timedelta(minutes=30), 0.0, "{}")])
    drain()
    # batch 3: a normal later transition closes the click interval
    write_batch([(3, 7, "signup", base + datetime.timedelta(minutes=10), 0.0, "{}")])
    drain()

    out = spark.read.parquet(sink).collect()
    assert len(out) == 1
    r = out[0]
    assert r.state == "click" and r.valid_from == base
    assert r.valid_to == base + datetime.timedelta(minutes=10)
    assert r.valid_from <= r.valid_to


def test_stream_attribution_cross_batch_ts_tie_resolves_by_event_id(spark, tmp_path):
    """Equal-timestamp ties across batches resolve by event_id, exactly
    like the batch twin's ORDER BY ts, event_id frame: a later-batch
    purchase at the SAME ts as the state's view is credited only when
    the view's event_id is smaller (round-5 advice — requires the
    event id in state, not just the timestamp)."""
    import datetime

    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    src = str(tmp_path / "tie_src")
    sink = str(tmp_path / "tie_sink")
    ckpt = str(tmp_path / "tie_ckpt")

    def write_batch(rows):
        spark.createDataFrame(
            rows,
            "event_id long, user_id long, event_type string, ts timestamp_ntz, value double, props string",
        ).coalesce(1).write.mode("append").parquet(src)

    def drain():
        stream = SE.read_events_stream(spark, src, max_files_per_trigger=1)
        q = (
            SE.stream_attribution_last_touch(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    # user 7: view eid 10 at ts T; user 8: view eid 50 at ts T
    write_batch([(10, 7, "view", base, 0.0, "{}"),
                 (50, 8, "view", base, 0.0, "{}")])
    drain()
    # later batch, SAME ts T: user 7's purchase eid 20 > view eid 10 →
    # credited; user 8's purchase eid 40 < view eid 50 → the batch
    # frame orders that view AFTER the purchase → dropped.
    write_batch([(20, 7, "purchase", base, 11.0, "{}"),
                 (40, 8, "purchase", base, 22.0, "{}")])
    drain()

    out = spark.read.parquet(sink).collect()
    assert [(r.user_id, r.value, r.view_ts) for r in out] == [(7, 11.0, base)]


def test_stream_ohlc_matches_batch_twin(spark, events_path):
    """Every streaming OHLC bar must equal the batch q_ohlc_hourly_value
    row for the same (hour, type) — open/close tie-handling included."""
    stream = SE.read_events_stream(spark, events_path)
    _drain(SE.stream_ohlc_bars(stream), "ohlc_bars")
    got = {
        (r.bar_hour, r.event_type): (r.open, r.high, r.low, r.close, r.volume, r.total_value)
        for r in spark.sql("SELECT * FROM ohlc_bars").collect()
    }
    from etl_project_spark.plans.registry import all_specs

    batch = all_specs()["q_ohlc_hourly_value"].builder(spark, SF_ORACLE)
    want = {
        (r.bar_hour, r.event_type): (r.open, r.high, r.low, r.close, r.volume, r.total_value)
        for r in batch.collect()
    }
    assert got == want


def test_stream_transition_pairs_match_batch_matrix(spark, events_path):
    """Aggregating the streaming per-event transition pairs must
    reproduce q_event_transition_matrix's counts exactly (time-ordered
    source, so the cross-batch state chain sees the batch LAG order)."""
    stream = SE.read_events_stream(spark, events_path)
    q = (
        SE.stream_transition_pairs(stream)
        .writeStream.format("memory")
        .queryName("transition_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        (r.prev_type, r.next_type): r.n
        for r in spark.sql(
            "SELECT prev_type, next_type, COUNT(*) AS n FROM transition_pairs"
            " GROUP BY prev_type, next_type"
        ).collect()
    }
    from etl_project_spark.plans.registry import all_specs

    batch = all_specs()["q_event_transition_matrix"].builder(spark, SF_ORACLE)
    want = {
        (r.prev_type, r.next_type): r.n_transitions for r in batch.collect()
    }
    assert got == want


def test_stream_stream_left_outer_flushes_unmatched(spark, events_path):
    """The left-outer stream-stream join must (a) reproduce the batch
    left join exactly on the provably-flushed region and (b) actually
    emit null-padded rows for unmatched clicks there."""
    stream = SE.read_events_stream(spark, events_path)
    q = (
        SE.stream_stream_left_outer_join(stream)
        .writeStream.format("memory")
        .queryName("ss_left_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got_all = spark.sql("SELECT * FROM ss_left_outer").collect()

    e = spark.read.parquet(str(events_path)).withColumn(
        "ts", F.col("ts").cast("timestamp_ltz")
    )
    max_ts = e.agg(F.max("ts")).collect()[0][0]
    # flushed region: clicks whose horizon closed before the final
    # watermark (max event time - 30min delay)
    import datetime

    flush_cutoff = max_ts - datetime.timedelta(minutes=30 + 60)

    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    cond = (
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 60 MINUTES"))
    )
    want_rows = (
        clicks.join(purchases, cond, "left_outer")
        .filter(F.col("click_ts") < F.lit(flush_cutoff))
        .collect()
    )
    want = {(r.click_id, r.purchase_id) for r in want_rows}
    got = {
        (r.click_id, r.purchase_id)
        for r in got_all
        if r.click_ts < flush_cutoff
    }
    assert got == want
    unmatched = [p for _, p in want if p is None]
    assert unmatched, "no unmatched clicks in flushed region — vacuous"


# -- streaming sketch twins (round-8: CMS / HLL / KMV) ----------------------

@pytest.fixture(scope="module")
def documents_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("documents_stream")
    (d / "documents.parquet").symlink_to(table_path(SF_ORACLE, "documents"))
    return str(d)


def test_stream_countmin_cells_match_batch_sketch(spark, documents_path):
    """The drained streaming CMS counter table must equal the batch
    builder's cells bit-for-bit, and probing it for the batch query's
    top-20 terms must reproduce q_countmin_token_freq's cms_estimate —
    the sketch state is the same object whether fed incrementally or
    at rest."""
    import hashlib

    from etl_project_spark.catalog import read_table
    from etl_project_spark.plans.registry import all_specs
    from etl_project_spark.plans.sketches import _CMS_D, _CMS_W, cms_cell_counts
    from etl_project_spark.streaming import sketches as SK

    stream = SK.read_documents_stream(spark, documents_path)
    _drain(SK.stream_countmin_cells(stream), "cms_cells")
    got = {
        (r.seed, r.cell): r.total
        for r in spark.sql("SELECT * FROM cms_cells").collect()
    }
    docs = read_table(spark, SF_ORACLE, "documents")
    want = {(r.seed, r.cell): r.total for r in cms_cell_counts(docs).collect()}
    assert got == want

    def cell_of(seed: int, term: str) -> int:
        h = int(hashlib.md5(f"{seed}:{term}".encode()).hexdigest()[:15], 16)
        return h % _CMS_W

    probe = all_specs()["q_countmin_token_freq"].builder(spark, SF_ORACLE)
    for r in probe.collect():
        est = min(got[(s, cell_of(s, r.term))] for s in range(_CMS_D))
        assert est == r.cms_estimate


def test_stream_hll_registers_match_batch_estimate(spark, events_path):
    """Folding the drained streaming HLL register table through the
    shared estimator must reproduce the batch query's registers_used
    and est_distinct per event type — replays and duplicate users are
    absorbed by the idempotent register max, so the raw stream (no
    distinct) lands on the same state as the batch's distinct input."""
    from etl_project_spark.plans.registry import all_specs
    from etl_project_spark.plans.sketches import hll_estimate
    from etl_project_spark.streaming import sketches as SK

    stream = SE.read_events_stream(spark, events_path)
    _drain(SK.stream_hll_registers(stream), "hll_regs")
    got = {
        r.event_type: (r.registers_used, r.est_distinct)
        for r in hll_estimate(spark.table("hll_regs")).collect()
    }
    batch = all_specs()["q_hll_distinct_users"].builder(spark, SF_ORACLE)
    want = {
        r.event_type: (r.registers_used, r.est_distinct) for r in batch.collect()
    }
    assert got == want


def test_stream_kmv_final_state_matches_batch(spark, events_path):
    """The KMV custom-state operator's LAST emission per event type
    (update mode; identified by the cumulative n_rows counter) must
    carry the batch query's exact est_distinct — below k the state IS
    the distinct hash set, at >=k the same (k-1)/kth division on the
    same integers."""
    from etl_project_spark.plans.registry import all_specs
    from etl_project_spark.streaming import sketches as SK

    stream = SE.read_events_stream(spark, events_path)
    q = (
        SK.stream_kmv_distinct(stream)
        .writeStream.format("memory")
        .queryName("kmv_updates")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain in time"
    rows = spark.sql("SELECT * FROM kmv_updates").collect()
    assert rows
    final: dict[str, tuple] = {}
    for r in rows:
        if r.event_type not in final or r.n_rows > final[r.event_type][0]:
            final[r.event_type] = (r.n_rows, r.n_kept, r.est_distinct)
    batch = all_specs()["q_kmv_distinct_users"].builder(spark, SF_ORACLE)
    want = {r.event_type: (r.exact_distinct, r.est_distinct) for r in batch.collect()}
    assert set(final) == set(want)
    from etl_project_spark.plans.sketches import _KMV_K

    for et, (_n, n_kept, est) in final.items():
        exact, want_est = want[et]
        assert est == want_est
        assert n_kept == min(exact, _KMV_K)


def test_stream_weighted_reservoir_final_matches_batch(spark, documents_path):
    """A-ES is one-pass: the k best fixed priority keys survive any
    arrival order, so the stream's final reservoir per source must
    equal q_weighted_reservoir_docs exactly — ranks, doc ids, weights."""
    from etl_project_spark.plans.registry import all_specs
    from etl_project_spark.streaming import sketches as SK

    stream = SK.read_documents_stream(spark, documents_path)
    q = (
        SK.stream_weighted_reservoir(stream)
        .writeStream.format("memory")
        .queryName("reservoir_updates")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain in time"
    rows = spark.sql("SELECT * FROM reservoir_updates").collect()
    assert rows
    last_n: dict[str, int] = {}
    for r in rows:
        last_n[r.source] = max(last_n.get(r.source, 0), r.n_rows)
    final = {
        (r.source, r.rank): (r.doc_id, r.weight)
        for r in rows
        if r.n_rows == last_n[r.source]
    }
    batch = all_specs()["q_weighted_reservoir_docs"].builder(spark, SF_ORACLE)
    want = {(r.source, r.rank): (r.doc_id, r.weight) for r in batch.collect()}
    assert final == want


from etl_project_spark.streaming.sketches import (
    DOCUMENTS_RAW_SCHEMA as SD_DOCS_SCHEMA,
)


def test_stream_incremental_dedup_matches_batch(spark, tmp_path):
    """Stream-static incremental dedup: src19 documents streamed over
    multiple triggers against the static history gram index; the
    drained candidate scores + the consumer argmax rollup reproduce
    q_incremental_dedup_new_batch's full output exactly."""
    from pyspark.sql import Window as W

    from etl_project_spark.catalog import read_table
    from etl_project_spark.plans.registry import all_specs
    from etl_project_spark.streaming import dedup as SD

    docs = read_table(spark, SF_ORACLE, "documents")
    batch_dir = str(tmp_path / "arriving")
    # several files -> several micro-batches with maxFilesPerTrigger=1
    docs.filter("source = 'src19'").repartition(4).write.parquet(batch_dir)
    history = docs.filter("source <> 'src19'")
    index = SD.history_gram_index(history)

    stream = (
        spark.readStream.schema(SD_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(batch_dir)
    )
    q = (
        SD.stream_incremental_dedup_scores(stream, index)
        .writeStream.format("memory")
        .queryName("incdedup_scores")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain in time"
    scores = spark.sql(
        "SELECT DISTINCT doc_id, _hid, jac FROM incdedup_scores"
    )
    # each doc's grams arrive in one trigger, so (doc_id, _hid) must
    # finalize once — distinct may not collapse conflicting values
    assert (
        scores.groupBy("doc_id", "_hid").count().filter("count > 1").count() == 0
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("jac"), F.asc("_hid"))
    best = (
        scores.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("doc_id", "_hid", "jac")
    )
    got = {
        r.doc_id: (r.best_match_id, r.best_jaccard, r.is_near_dup)
        for r in docs.filter("source = 'src19'")
        .select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.col("_hid").alias("best_match_id"),
            F.coalesce("jac", F.lit(0.0)).alias("best_jaccard"),
            (F.coalesce("jac", F.lit(0.0)) >= 0.5).alias("is_near_dup"),
        )
        .collect()
    }
    want = {
        r.doc_id: (r.best_match_id, r.best_jaccard, r.is_near_dup)
        for r in all_specs()["q_incremental_dedup_new_batch"]
        .builder(spark, SF_ORACLE)
        .collect()
    }
    assert got == want


def test_stream_simhash_near_dup_matches_bruteforce(spark, tmp_path):
    """Stream-static SimHash twin: src19 documents streamed over
    multiple triggers against the static posting index must emit
    exactly the brute-force Hamming-<=3 (new x history) match set —
    each match exactly once (the canonical-combo filter stands in for
    dedup state), asserted against an oracle that is independent of
    the blocking scheme entirely."""
    from etl_project_spark.catalog import read_table
    from etl_project_spark.operators.dedup import simhash_fingerprints
    from etl_project_spark.streaming import dedup as SD

    docs = read_table(spark, SF_ORACLE, "documents")
    batch_dir = str(tmp_path / "arriving_simhash")
    docs.filter("source = 'src19'").repartition(4).write.parquet(batch_dir)
    history = docs.filter("source <> 'src19'")
    index = SD.history_simhash_index(history, max_hamming=3, eq_blocks=2)

    stream = (
        spark.readStream.schema(SD_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(batch_dir)
    )
    q = (
        SD.stream_simhash_near_dup(stream, index, max_hamming=3, eq_blocks=2)
        .writeStream.format("memory")
        .queryName("simhash_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain in time"
    rows = spark.sql(
        "SELECT doc_id, match_id, hamming FROM simhash_stream"
    ).collect()
    got = {(r.doc_id, r.match_id, r.hamming) for r in rows}
    # exactly-once without state: no (doc, match) pair may repeat
    assert len(got) == len(rows)

    # Brute-force oracle over the same fingerprint kernel (batch side),
    # independent of the posting/blocking scheme.
    new_fp = [
        (r._id, r._sim)
        for r in simhash_fingerprints(
            docs.filter("source = 'src19'"), "doc_id", "text"
        ).collect()
    ]
    hist_fp = [
        (r._id, r._sim)
        for r in simhash_fingerprints(history, "doc_id", "text").collect()
    ]
    want = set()
    for nid, nsim in new_fp:
        for hid, hsim in hist_fp:
            h = ((nsim ^ hsim) & 0xFFFFFFFFFFFFFFFF).bit_count()
            if h <= 3:
                want.add((nid, hid, h))
    assert got == want


def test_stream_repeated_span_positions_matches_batch(spark, tmp_path):
    """Stream-static repeated-span twin: the full corpus streamed file-
    by-file against the static duplicated-gram index must flag exactly
    the batch plan's duplicated positions, and the island rollup over
    the drained output must reproduce q_repeated_span_extraction's
    span set row-for-row."""
    from pyspark.sql import Window as W

    from etl_project_spark.catalog import read_table
    from etl_project_spark.plans.registry import all_specs
    from etl_project_spark.streaming import dedup as SD

    docs = read_table(spark, SF_ORACLE, "documents")
    batch_dir = str(tmp_path / "arriving_spans")
    docs.repartition(4).write.parquet(batch_dir)
    index = SD.corpus_dup_gram_index(docs, k=5)

    stream = (
        spark.readStream.schema(SD_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(batch_dir)
    )
    q = (
        SD.stream_repeated_span_positions(stream, index, k=5)
        .writeStream.format("memory")
        .queryName("span_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain in time"

    drained = spark.sql("SELECT doc_id, pos FROM span_stream")
    # exactly-once without state: no flagged position may repeat
    rows = drained.collect()
    assert len({(r.doc_id, r.pos) for r in rows}) == len(rows)

    # Island rollup on the drained output — the consumer-side finish,
    # same arithmetic as the batch plan (k=5, 10-token floor).
    w = W.partitionBy("doc_id").orderBy("pos")
    isl = (
        drained.withColumn(
            "is_break",
            F.when(F.col("pos") - F.lag("pos").over(w) > 5, 1).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("is_break").over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") - F.min("pos") + F.lit(5)).cast("long").alias(
                "span_tokens"
            ),
            F.count(F.lit(1)).cast("long").alias("n_dup_grams"),
        )
        .filter(F.col("span_tokens") >= 10)
    )
    got = {
        (r.doc_id, r.span_start, r.span_tokens, r.n_dup_grams)
        for r in isl.collect()
    }
    want = {
        (r.doc_id, r.span_start, r.span_tokens, r.n_dup_grams)
        for r in all_specs()["q_repeated_span_extraction"]
        .builder(spark, SF_ORACLE)
        .collect()
    }
    assert got == want and want


def test_stream_incremental_topk_matches_batch(spark, tmp_path):
    """Incremental top-k maintenance: split the embedding corpus into
    4 files, stream them one per micro-batch, merge each batch's
    distributed top-k into the k-row accumulator — the final state
    must equal the one-shot batch brute_force_topk exactly (scores,
    ids, AND order), proving the monoid merge respects the
    (score DESC, id ASC) tie rule across batch boundaries."""
    from etl_project_spark.catalog import read_table
    from etl_project_spark.operators.similarity import brute_force_topk
    from etl_project_spark.plans.similarity import QUERY_VEC
    from etl_project_spark.streaming import similarity as SS

    src = str(tmp_path / "emb")
    read_table(spark, SF_ORACLE, "embeddings").repartition(4).write.parquet(src)

    state: list = []
    stream = SS.read_embeddings_stream(spark, src, max_files_per_trigger=1)
    q = SS.incremental_topk_query(
        stream,
        QUERY_VEC,
        k=10,
        checkpoint=str(tmp_path / "ckpt"),
        state=state,
    )
    assert q.awaitTermination(180)
    assert len(q.recentProgress) >= 4  # genuinely incremental, not one batch

    want = [
        (float(r.score), int(r.vec_id))
        for r in brute_force_topk(
            spark.read.parquet(src), "embedding", QUERY_VEC, k=10
        ).collect()
    ]
    assert state == want


def test_stream_incremental_topk_merge_dedups_by_id(spark, tmp_path):
    """foreachBatch is at-least-once: a replayed or pre-seeded stale
    (score, id) tuple for an id the corpus also yields must NOT occupy
    a second accumulator slot (it could evict a distinct true top-k
    row). The merge dedups by id keeping the best score, so a stale
    worse-score duplicate of the true top-1 vanishes and the final
    state still equals the batch answer exactly (ADVICE r12)."""
    from etl_project_spark.catalog import read_table
    from etl_project_spark.operators.similarity import brute_force_topk
    from etl_project_spark.plans.similarity import QUERY_VEC
    from etl_project_spark.streaming import similarity as SS

    src = str(tmp_path / "emb")
    read_table(spark, SF_ORACLE, "embeddings").repartition(2).write.parquet(src)

    want = [
        (float(r.score), int(r.vec_id))
        for r in brute_force_topk(
            spark.read.parquet(src), "embedding", QUERY_VEC, k=10
        ).collect()
    ]
    # stale duplicate of the true top-1 with a worse score
    state: list = [(want[0][0] - 1.0, want[0][1])]
    stream = SS.read_embeddings_stream(spark, src, max_files_per_trigger=1)
    q = SS.incremental_topk_query(
        stream,
        QUERY_VEC,
        k=10,
        checkpoint=str(tmp_path / "ckpt"),
        state=state,
    )
    assert q.awaitTermination(180)
    assert state == want
    assert len({vid for _, vid in state}) == len(state)


def test_curation_doc_state_matches_hashed_margin_agg(spark):
    """The stream side's stateless array-fold classifier must be
    BIGINT-identical to the batch explode-aggregate (the property that
    makes the stream/batch equality exact, not a tolerance)."""
    from etl_project_spark.catalog import read_table
    from etl_project_spark.plans.quality import hashed_margin_agg
    from etl_project_spark.streaming import pipeline as SP

    docs = read_table(spark, SF_ORACLE, "documents")
    got = {
        r.doc_id: (r.n_feats, r._sw)
        for r in SP.curation_doc_state(docs).collect()
    }
    want = {
        r.doc_id: (r.n_feats, r._sw) for r in hashed_margin_agg(docs).collect()
    }
    assert got == want and want


def test_stream_curation_audit_matches_batch(spark, tmp_path):
    """Stream-static incremental curation: src19 documents streamed
    over multiple triggers against the static nkey index; the drained
    canonical state + the shared shard-audit rollup reproduce
    q_incremental_curation_audit's full output exactly."""
    from etl_project_spark.catalog import read_table
    from etl_project_spark.plans.registry import all_specs
    from etl_project_spark.streaming import pipeline as SP

    docs = read_table(spark, SF_ORACLE, "documents")
    batch_dir = str(tmp_path / "arriving")
    # several files -> several micro-batches with maxFilesPerTrigger=1;
    # repartition splits nkey groups ACROSS triggers, exercising the
    # cross-trigger min-merge
    docs.filter("source = 'src19'").repartition(4).write.parquet(batch_dir)
    hist = SP.history_nkey_index(docs.filter("source <> 'src19'"))

    stream = (
        spark.readStream.schema(SD_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(batch_dir)
    )
    q = (
        SP.stream_curation_canonicals(stream, hist)
        .writeStream.format("memory")
        .queryName("curation_canon")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain in time"
    # update mode re-emits a key's row whenever a smaller doc_id
    # arrives; the drain rollup keeps the final (min) state per nkey
    state = spark.sql("SELECT * FROM curation_canon")
    final = (
        state.groupBy("nkey")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by(
                F.struct("source", "n_chars", "n_feats", "_sw"), F.col("doc_id")
            ).alias("_p"),
        )
        .select("doc_id", "_p.source", "_p.n_chars", "_p.n_feats", "_p._sw")
    )
    got = {
        r.shard: (r.n_docs, r.total_chars, r.n_sources)
        for r in SP.curation_shard_audit(final).collect()
    }
    want = {
        r.shard: (r.n_docs, r.total_chars, r.n_sources)
        for r in all_specs()["q_incremental_curation_audit"]
        .builder(spark, SF_ORACLE)
        .collect()
    }
    assert got == want and want
