"""Golden date-parsing tests — bit-exact ports of the reference's
tests/test_parse_date.py plus coverage of every cascade branch
(reference etl/transform.py:20-68)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from habits_etl_spark.functions.datetime_ops import (
    parse_report_date_expr,
    parse_serial_date_expr,
)

TZ = "America/Chicago"


def parse_many(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    rows = df.select(parse_report_date_expr(F.col("s"), TZ).alias("ts")).collect()
    return [r.ts for r in rows]


def test_parse_mmddyyyy_to_utc(spark):
    # reference tests/test_parse_date.py:4-8 — noon CDT == 17:00Z
    (ts,) = parse_many(spark, ["8/22/2025"])
    assert (ts.hour, ts.minute) == (17, 0)
    assert ts.date() == dt.date(2025, 8, 22)


def test_parse_serial_date_to_utc(spark):
    # reference tests/test_parse_date.py:10-13 asserts hour==17 (noon CDT).
    # NB the reference's comment claims 45519 == 2025-08-22; the true value
    # of serial 45519 is 2024-08-15 (the reference test only checks hours,
    # so it passes there too). We assert the full correct instant.
    df = spark.createDataFrame([(45519.0,)], "v double")
    (row,) = df.select(parse_serial_date_expr(F.col("v"), TZ).alias("ts")).collect()
    assert row.ts == dt.datetime(2024, 8, 15, 17, 0)
    assert row.ts.hour == 17  # the reference's own assertion
    # and through the full cascade as a string literal
    (ts,) = parse_many(spark, ["45519"])
    assert ts == dt.datetime(2024, 8, 15, 17, 0)


def test_serial_with_time_component(spark):
    # 45519.25 == 06:00 local == 11:00Z CDT (fractional day wins, no noon anchor)
    (ts,) = parse_many(spark, ["45519.25"])
    assert ts == dt.datetime(2024, 8, 15, 11, 0)


def test_all_date_only_formats_noon_anchor(spark):
    expected = dt.datetime(2025, 8, 22, 17, 0)  # noon CDT
    values = ["8/22/2025", "2025-08-22", "8/22/25", "Aug 22, 2025", "August 22, 2025"]
    assert parse_many(spark, values) == [expected] * len(values)


def test_datetime_formats_local_wall_time(spark):
    # 10:30 CDT == 15:30Z
    expected = dt.datetime(2025, 8, 22, 15, 30)
    values = ["2025-08-22 10:30:00", "8/22/2025 10:30", "8/22/2025 10:30:00"]
    assert parse_many(spark, values) == [expected] * len(values)


def test_iso_fallback(spark):
    naive, offset = parse_many(spark, ["2025-08-22T10:30:00", "2025-08-22T10:30:00+02:00"])
    assert naive == dt.datetime(2025, 8, 22, 15, 30)  # local wall time
    assert offset == dt.datetime(2025, 8, 22, 8, 30)  # explicit offset respected


def test_dst_winter_anchor(spark):
    # noon CST == 18:00Z (winter) — the anchor must follow the DST rule
    (ts,) = parse_many(spark, ["1/15/2025"])
    assert ts == dt.datetime(2025, 1, 15, 18, 0)


def test_unparseable_is_null(spark):
    (ts,) = parse_many(spark, ["not a date"])
    assert ts is None
