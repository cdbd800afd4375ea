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


def test_equidepth_hist_bucket_invariants(spark, sf_dir):
    from pyspark.sql import functions as F

    from habits_etl_spark.plans.common import t
    from habits_etl_spark.plans.extra import _HIST_BUCKETS, agg_equidepth_hist

    rows = agg_equidepth_hist(spark, sf_dir).collect()
    counts = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .count()
        .collect()
    )
    totals = {r.event_type: r["count"] for r in counts}
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, bs in by_type.items():
        bs.sort(key=lambda r: r.bucket)
        assert [b.bucket for b in bs] == list(range(1, _HIST_BUCKETS + 1))
        assert sum(b.n_rows for b in bs) == totals[et]
        assert max(b.n_rows for b in bs) - min(b.n_rows for b in bs) <= 1  # equi-depth
        for a, b in zip(bs, bs[1:]):
            assert a.hi <= b.lo + 1e-9  # value-ordered tiles
            assert a.lo <= a.hi


def test_first_touch_attribution_matches_python(spark, sf_dir):
    import datetime

    from pyspark.sql import functions as F

    from habits_etl_spark.plans.common import t
    from habits_etl_spark.plans.extra import (
        _SESSION_GAP_MIN,
        win_first_touch_attribution,
    )

    ev = (
        t(spark, sf_dir, "events")
        .select("user_id", "event_id", "event_type", "ts")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    want = {}
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        sess_no, prev = 0, None
        first_click: dict[int, datetime.datetime] = {}
        for r in rows:
            if prev is None or (r.ts - prev).total_seconds() > _SESSION_GAP_MIN * 60:
                sess_no += 1
            prev = r.ts
            if r.event_type == "click" and sess_no not in first_click:
                first_click[sess_no] = r.ts
            if r.event_type == "purchase":
                ft = first_click.get(sess_no)
                want[r.event_id] = ft if (ft is not None and ft <= r.ts) else None
    got = {
        r.event_id: r.first_touch_ts_s
        for r in win_first_touch_attribution(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    fmt = "%Y-%m-%d %H:%M:%S.%f"
    for ev_id, ft in want.items():
        assert got[ev_id] == (ft.strftime(fmt) if ft else None), ev_id


def test_ewma_matches_python_fir(spark, sf_dir):
    from pyspark.sql import functions as F

    from habits_etl_spark.plans.common import t
    from habits_etl_spark.plans.windows import _EWMA_ALPHA, _EWMA_K, win_ewma_smooth

    daily = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .groupBy("user_id", F.date_format(F.date_trunc("DAY", "ts"), "yyyy-MM-dd").alias("d"))
        .agg(F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("v"))
        .collect()
    )
    series: dict[int, list] = {}
    for r in daily:
        series.setdefault(r.user_id, []).append((r.d, r.v))
    got = {
        (r.user_id, r.day_s): (r.sum_value, r.ewma)
        for r in win_ewma_smooth(spark, sf_dir).collect()
    }
    assert len(got) == len(daily)
    for uid, pts in series.items():
        pts.sort()
        vals = [v for _, v in pts]
        for i, (d, v) in enumerate(pts):
            num = den = 0.0
            for j in range(_EWMA_K):
                if i - j >= 0:
                    wgt = _EWMA_ALPHA * (1 - _EWMA_ALPHA) ** j
                    num += wgt * vals[i - j]
                    den += wgt
            sv, ew = got[(uid, d)]
            assert sv == v
            assert abs(ew - round(num / den, 6)) < 1e-9
            lo = min(vals[max(0, i - _EWMA_K + 1) : i + 1])
            hi = max(vals[max(0, i - _EWMA_K + 1) : i + 1])
            assert lo - 1e-6 <= ew <= hi + 1e-6  # convex combination


def test_scd2_intervals_partition_and_alternate(spark, sf_dir):
    from habits_etl_spark.plans.extra import op_scd2_user_tier

    rows = op_scd2_user_tier(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, ivs in by_user.items():
        ivs.sort(key=lambda r: r.version)
        assert [r.version for r in ivs] == list(range(1, len(ivs) + 1))
        for a, b in zip(ivs, ivs[1:]):
            assert a.tier != b.tier  # consecutive versions always differ
            assert a.valid_to_s < b.valid_from_s  # intervals ordered, disjoint
        currents = [r for r in ivs if r.is_current]
        assert len(currents) == 1 and currents[0] is ivs[-1]


def test_gini_matches_python_and_bounds(spark, sf_dir):
    from pyspark.sql import functions as F

    from habits_etl_spark.plans.common import t
    from habits_etl_spark.plans.extra import agg_value_gini

    rows = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type", "user_id")
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("x"))
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append((r.x, r.user_id))
    got = {r.event_type: (r.n, r.gini) for r in agg_value_gini(spark, sf_dir).collect()}
    assert set(got) == set(by_type)
    for et, xs in by_type.items():
        xs.sort()
        vals = [x for x, _ in xs]
        n = len(vals)
        want = 2 * sum((i + 1) * x for i, x in enumerate(vals)) / (n * sum(vals)) - (
            n + 1
        ) / n
        assert got[et][0] == n
        assert abs(got[et][1] - round(want, 6)) < 1e-9
        assert 0.0 <= got[et][1] < 1.0  # non-negative mass -> G in [0, 1)


def test_q20_dominant_suppliers_matches_bruteforce(spark, sf_dir):
    from pyspark.sql import functions as F

    from habits_etl_spark.plans.common import t
    from habits_etl_spark.plans.star3 import _Q20_SHARE, join_q20_dominant_suppliers

    li = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .collect()
    )
    totals: dict[int, float] = {}
    for r in li:
        totals[r.l_partkey] = totals.get(r.l_partkey, 0.0) + r.q
    dom = {r.l_suppkey for r in li if r.q > _Q20_SHARE * totals[r.l_partkey]}
    supp = {
        r.s_suppkey: r.s_name
        for r in t(spark, sf_dir, "supplier").select("s_suppkey", "s_name").collect()
    }
    got = {r.s_name for r in join_q20_dominant_suppliers(spark, sf_dir).collect()}
    assert got == {supp[s] for s in dom}
