"""Property tests: the binned range join must equal the naive theta join
on arbitrary inputs (any bin width), and the Morton interleave must be a
bijection on its domain."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from habits_etl_spark.operators.range_join import point_in_interval_join
from habits_etl_spark.sinks.zorder import _interleave_bits

EPOCH = dt.datetime(2024, 1, 1)


def _dtm(hours):
    return EPOCH + dt.timedelta(hours=int(hours))


@st.composite
def intervals_and_points(draw):
    n_iv = draw(st.integers(1, 5))
    ivs = []
    for i in range(n_iv):
        start = draw(st.integers(0, 24 * 60))
        length = draw(st.integers(0, 24 * 30))
        ivs.append((i, _dtm(start), _dtm(start + length)))
    pts = [
        (j, _dtm(draw(st.integers(0, 24 * 90))))
        for j in range(draw(st.integers(1, 8)))
    ]
    return ivs, pts


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=intervals_and_points(), bin_days=st.sampled_from([1, 3, 7, 30]))
def test_binned_equals_naive_theta_join(spark, data, bin_days):
    ivs, pts = data
    intervals = spark.createDataFrame(ivs, "iv_id int, s timestamp, e timestamp")
    points = spark.createDataFrame(pts, "pid int, ts timestamp")
    binned = point_in_interval_join(points, intervals, "ts", "s", "e", bin_days=bin_days)
    got = sorted((r.pid, r.iv_id) for r in binned.collect())
    naive = sorted(
        (p_id, iv_id)
        for iv_id, s, e in ivs
        for p_id, ts in pts
        if s <= ts < e
    )
    assert got == naive


def test_morton_interleave_is_bijective(spark):
    bits = 5
    side = 1 << bits
    df = spark.range(side * side).select(
        (F.col("id") % side).alias("a"), (F.col("id") / side).cast("bigint").alias("b")
    )
    z = df.select(_interleave_bits(F.col("a"), F.col("b"), bits).alias("z"))
    stats = z.agg(
        F.count_distinct("z").alias("n"), F.min("z").alias("lo"), F.max("z").alias("hi")
    ).collect()[0]
    assert stats.n == side * side
    assert stats.lo == 0 and stats.hi == side * side - 1


@st.composite
def two_interval_sets(draw):
    def some_intervals(n_max):
        out = []
        for i in range(draw(st.integers(1, n_max))):
            start = draw(st.integers(0, 24 * 60))
            length = draw(st.integers(0, 24 * 21))  # incl. zero-length
            out.append((i, _dtm(start), _dtm(start + length)))
        return out

    return some_intervals(5), some_intervals(4)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=two_interval_sets(), bin_days=st.sampled_from([1, 3, 7, 30]))
def test_overlap_join_equals_naive_theta_join(spark, data, bin_days):
    """interval_overlap_join == naive overlap theta join on arbitrary
    inputs — every true pair exactly once (the overlap-start-bin anchor
    argument), zero-length and boundary-touching intervals included
    (half-open: touching endpoints do NOT overlap)."""
    from habits_etl_spark.operators.range_join import interval_overlap_join

    ivs_a, ivs_b = data
    a = spark.createDataFrame(ivs_a, "a_id int, a_s timestamp, a_e timestamp")
    b = spark.createDataFrame(ivs_b, "b_id int, b_s timestamp, b_e timestamp")
    got = sorted(
        (r.a_id, r.b_id)
        for r in interval_overlap_join(
            a, b, "a_s", "a_e", "b_s", "b_e", bin_days=bin_days
        ).collect()
    )
    naive = sorted(
        (a_id, b_id)
        for a_id, a_s, a_e in ivs_a
        for b_id, b_s, b_e in ivs_b
        if a_s < b_e and b_s < a_e
    )
    assert got == naive
