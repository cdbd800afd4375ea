"""Rollup routing: rollup-served answers must equal raw-served answers;
non-derivable measures fall back to raw."""

from __future__ import annotations

import datetime as dt

import pytest

from habits_etl_spark.plans.routing import DailyQuery, can_route_to_rollup, daily_series
from habits_etl_spark.streaming.rollup import batch_daily_rollup

SCHEMA = "ts timestamp, user_email string, habit string, value double"


@pytest.fixture()
def warehouse(spark, tmp_path):
    rows = [
        (dt.datetime(2024, 1, d, h), u, habit, float(v))
        for d in (5, 6, 7)
        for h, u, habit, v in [
            (9, "a@x.com", "workout", 1.0),
            (10, "a@x.com", "meditation_minutes", 15.0),
            (11, "b@x.com", "workout", 0.0),
        ]
    ]
    events = spark.createDataFrame(rows, SCHEMA)
    rollup_path = str(tmp_path / "rollup")
    batch_daily_rollup(events).write.partitionBy("day").parquet(rollup_path)
    return events, rollup_path


def test_route_decision():
    assert can_route_to_rollup(DailyQuery(measures=("count_done", "avg_value")))
    assert not can_route_to_rollup(DailyQuery(measures=("p99_value",)))


def test_rollup_equals_raw(spark, warehouse):
    events, rollup_path = warehouse
    q = DailyQuery(
        measures=("count_done", "avg_value", "sum_meditation"),
        users=("a@x.com",),
        day_start="2024-01-05",
        day_end="2024-01-07",
    )
    via_rollup = daily_series(spark, q, rollup_path=rollup_path)
    via_raw = daily_series(spark, q, rollup_path=None, events=events)
    key = lambda r: (str(r.day), r.user_email, r.habit)  # noqa: E731
    a = {key(r): (r.count_done, r.avg_value, r.sum_meditation) for r in via_rollup.collect()}
    b = {key(r): (r.count_done, r.avg_value, r.sum_meditation) for r in via_raw.collect()}
    assert a == b and len(a) == 4  # 2 days x 2 habits for user a
