"""Tests for the approximate twins of exact aggregates."""

from __future__ import annotations


def test_approx_percentiles_track_exact(spark, sf_dir):
    """percentile_approx at accuracy=10000 must stay within a tight
    absolute band of the exact interpolated percentile per group (the
    sketch's rank error is ~n/accuracy; these groups are far smaller)."""
    from habits_etl_spark.plans import QUERIES

    exact = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in QUERIES["agg_percentiles"](spark, sf_dir).collect()
    }
    approx = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in QUERIES["agg_approx_percentiles"](spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for et, (e50, e90, e99) in exact.items():
        a50, a90, a99 = approx[et]
        # approx picks an actual data value; exact interpolates between two
        # — the gap is bounded by one inter-sample spacing at each rank,
        # which at the tiny test group sizes is wide in the tail (p99 of a
        # few hundred samples), hence the relative bands
        assert abs(a50 - e50) <= max(1.0, 0.05 * abs(e50)), (et, a50, e50)
        assert abs(a90 - e90) <= max(1.0, 0.10 * abs(e90)), (et, a90, e90)
        assert abs(a99 - e99) <= max(2.0, 0.40 * abs(e99)), (et, a99, e99)


def test_hll_partial_merge_tracks_exact(spark, sf_dir):
    """Daily-sketch union estimate must track exact distinct users within
    HLL's lgConfigK=14 error envelope (~0.8% typical; allow 2%)."""
    from pyspark.sql import functions as F

    from habits_etl_spark.plans import QUERIES
    from habits_etl_spark.plans.common import t

    approx = {
        r.event_type: r.approx_users
        for r in QUERIES["agg_hll_partial_merge"](spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.exact
        for r in t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, ex in exact.items():
        assert abs(approx[et] - ex) <= max(0.02 * ex, 1), (et, approx[et], ex)
