"""Property-based tests (hypothesis) for the date-parse cascade — the
highest-correctness-risk area (SURVEY §7.3.1-3). The expected value is
computed independently with zoneinfo, never by the code under test.

Strategy note: hypothesis drives CASE GENERATION; evaluation is batched
through one Spark job per test (a Spark round-trip per example would be
minutes per test)."""

from __future__ import annotations

import datetime as dt
from zoneinfo import ZoneInfo

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from habits_etl_spark.functions.datetime_ops import parse_report_date_expr

TZ = "America/Chicago"
LOCAL = ZoneInfo(TZ)
UTC = ZoneInfo("UTC")

dates = st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2035, 12, 31))
times = st.times()


def expected_noon(d: dt.date) -> dt.datetime:
    return (
        dt.datetime.combine(d, dt.time(12, 0), tzinfo=LOCAL)
        .astimezone(UTC)
        .replace(tzinfo=None)
    )


def expected_wall(d: dt.date, t: dt.time) -> dt.datetime:
    naive = dt.datetime.combine(d, t.replace(microsecond=0))
    try:
        return naive.replace(tzinfo=LOCAL).astimezone(UTC).replace(tzinfo=None)
    except Exception:  # nonexistent local times around DST; zoneinfo shifts
        return None


def run_cases(spark, cases):
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    return [
        r.ts
        for r in df.select(parse_report_date_expr(F.col("s"), TZ).alias("ts")).collect()
    ]


@settings(max_examples=30, deadline=None)
@given(st.lists(dates, min_size=1, max_size=20))
def test_date_only_formats_anchor_to_local_noon(spark, ds):
    fmts = ["%m/%d/%Y", "%Y-%m-%d", "%b %d, %Y", "%B %d, %Y"]
    cases, want = [], []
    for i, d in enumerate(ds):
        cases.append(d.strftime(fmts[i % len(fmts)]))
        want.append(expected_noon(d))
    assert run_cases(spark, cases) == want


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(dates, times), min_size=1, max_size=15))
def test_datetime_strings_parse_as_local_wall_time(spark, pairs):
    cases, want = [], []
    for d, t in pairs:
        t = t.replace(microsecond=0)
        cases.append(f"{d:%Y-%m-%d} {t:%H:%M:%S}")
        want.append(expected_wall(d, t))
    got = run_cases(spark, cases)
    for g, w in zip(got, want):
        if w is not None:  # skip DST-nonexistent wall times (engine-defined)
            assert g == w


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(dates, st.integers(0, 86399)), min_size=1, max_size=15))
def test_serial_dates_roundtrip(spark, pairs):
    base = dt.date(1899, 12, 30)
    cases, want = [], []
    for d, secs in pairs:
        serial = (d - base).days + secs / 86400
        # reference rounds frac*86400; build exact-representable fractions
        cases.append(repr(serial))
        if secs == 0:
            want.append(expected_noon(d))
        else:
            w = dt.datetime.combine(d, dt.time(0, 0)) + dt.timedelta(seconds=secs)
            want.append(expected_wall(w.date(), w.time()))
    got = run_cases(spark, cases)
    for c, g, w in zip(cases, got, want):
        if w is not None:
            assert g is not None, c
            assert abs((g - w).total_seconds()) <= 1, (c, g, w)  # float serial rounding
