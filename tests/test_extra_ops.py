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


def test_table_diff_counts_match_perturbation(spark, sf_dir):
    from pyspark.sql import functions as F

    from habits_etl_spark.plans.common import t
    from habits_etl_spark.plans.extra import op_table_diff

    e = t(spark, sf_dir, "events")
    got = {r.status: r.n_rows for r in op_table_diff(spark, sf_dir).collect()}
    removed = e.filter(F.col("user_id") % 97 == 0).count()
    added = e.filter(F.col("user_id") % 89 == 0).count()
    changed = e.filter(
        (F.col("user_id") % 97 != 0)
        & (F.col("event_id") % 11 == 0)
        & (F.col("value") != 0)
    ).count()
    total = e.count()
    assert got.get("removed", 0) == removed
    assert got.get("added", 0) == added
    assert got.get("changed", 0) == changed
    assert sum(got.values()) == total + added


def test_corr_matches_numpy(spark, sf_dir):
    import numpy as np
    from pyspark.sql import functions as F

    from habits_etl_spark.plans.common import t
    from habits_etl_spark.plans.extra import agg_corr_value_hour

    rows = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value", F.hour("ts").alias("h"))
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append((r.value, r.h))
    got = {r.event_type: r.corr_value_hour for r in agg_corr_value_hour(spark, sf_dir).collect()}
    assert set(got) == set(by_type)
    for et, pairs in by_type.items():
        x, y = zip(*pairs)
        want = float(np.corrcoef(x, y)[0, 1])
        assert abs(got[et] - want) < 1e-6, (et, got[et], want)
