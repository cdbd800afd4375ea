"""Edge semantics for the binned point-in-interval join: half-open
bounds, intervals spanning many bins, no duplicate matches, and no
nested-loop plan."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from habits_etl_spark.operators.range_join import point_in_interval_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_half_open_bounds_and_multi_bin_spans(spark):
    intervals = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), _ts("2024-01-02T00:00:00")),  # 1 day
            (2, _ts("2024-01-01T00:00:00"), _ts("2024-03-01T00:00:00")),  # spans ~9 bins
        ],
        "iv_id int, iv_start timestamp, iv_end timestamp",
    )
    points = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T00:00:00")),  # == start: included
            (11, _ts("2024-01-02T00:00:00")),  # == iv1 end: excluded there, in iv2
            (12, _ts("2024-02-15T12:00:00")),  # deep inside iv2 only
            (13, _ts("2024-03-01T00:00:00")),  # == iv2 end: excluded everywhere
        ],
        "pid int, ts timestamp",
    )
    out = point_in_interval_join(points, intervals, "ts", "iv_start", "iv_end", bin_days=7)
    got = sorted((r.pid, r.iv_id) for r in out.collect())
    assert got == [(10, 1), (10, 2), (11, 2), (12, 2)]


def test_no_duplicate_matches_per_pair(spark):
    # one long interval covering every point: each point must match once
    intervals = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), _ts("2025-01-01T00:00:00"))],
        "iv_id int, iv_start timestamp, iv_end timestamp",
    )
    points = spark.range(100).select(
        F.col("id").alias("pid"),
        (F.to_timestamp(F.lit("2024-01-01")) + F.make_interval(days=F.col("id").cast("int"))).alias("ts"),
    )
    out = point_in_interval_join(points, intervals, "ts", "iv_start", "iv_end", bin_days=7)
    assert out.count() == 100
    assert out.select("pid").distinct().count() == 100


def test_plan_has_no_nested_loop(spark):
    intervals = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), _ts("2024-02-01T00:00:00"))],
        "iv_id int, iv_start timestamp, iv_end timestamp",
    )
    points = spark.createDataFrame(
        [(1, _ts("2024-01-05T00:00:00"))], "pid int, ts timestamp"
    )
    out = point_in_interval_join(points, intervals, "ts", "iv_start", "iv_end")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "Cartesian" not in plan
