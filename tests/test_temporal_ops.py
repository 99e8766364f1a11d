"""Unit tests for asof_join direction='nearest': tie rule, one-sided
matches, and the tolerance cutoff — the paths the registry query's
natural data may not exercise every round.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from etl_project_spark.operators.temporal import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, datetime(2024, 1, 1, 12, 0, 0)),   # between errors: 11:00 and 12:30
            (2, 10, datetime(2024, 1, 1, 23, 0, 0)),   # after the last error
            (3, 20, datetime(2024, 1, 1, 6, 0, 0)),    # before the only error
            (4, 30, datetime(2024, 1, 1, 9, 0, 0)),    # key with no right rows
            (5, 40, datetime(2024, 1, 1, 9, 0, 0)),    # EXACT tie: errors at 8:00 and 10:00
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, datetime(2024, 1, 1, 11, 0, 0), 101),
            (10, datetime(2024, 1, 1, 12, 30, 0), 102),
            (20, datetime(2024, 1, 1, 7, 0, 0), 201),
            (40, datetime(2024, 1, 1, 8, 0, 0), 401),
            (40, datetime(2024, 1, 1, 10, 0, 0), 402),
        ],
        "user_id long, err_ts timestamp, err_id long",
    )
    return left, right.select(
        "user_id", "err_ts", F.col("err_id")
    )


def _run(spark, tolerance=None):
    left, right = _frames(spark)
    out = asof_join(
        left,
        right,
        left_key="user_id",
        right_key="user_id",
        left_time="ts",
        right_time="err_ts",
        value_cols=["err_id"],
        direction="nearest",
        tolerance=tolerance,
    )
    return {r.event_id: r.err_id for r in out.collect()}


def test_nearest_picks_closer_side(spark):
    got = _run(spark)
    assert got[1] == 102  # 12:30 is 30min away vs 11:00 an hour away
    assert got[2] == 102  # only backward exists
    assert got[3] == 201  # only forward exists
    assert got[4] is None  # no right rows for the key at all


def test_nearest_tie_prefers_backward(spark):
    got = _run(spark)
    # 9:00 sits exactly 1h from both 8:00 and 10:00 — documented rule:
    # backward wins exact-distance ties
    assert got[5] == 401


def test_nearest_tolerance_nulls_far_matches(spark):
    got = _run(spark, tolerance=F.expr("INTERVAL 45 MINUTES"))
    assert got[1] == 102        # 30 min away — inside tolerance
    assert got[2] is None       # hours away
    assert got[3] is None       # an hour away
    assert got[5] is None       # exactly 60 min > 45 min
