"""Structural invariants for the wave-17 privacy/order-statistics
family (exact values are hash-checked against the DuckDB oracle by
tools/check_correctness.py; these assert the properties that must hold
on ANY input)."""

from __future__ import annotations

from habits_etl_spark.plans.privacy import (
    agg_weighted_median,
    ext_dp_noisy_counts,
    ext_k_anonymity_audit,
    ext_l_diversity_audit,
    ext_skyline_2d,
)


def test_k_anonymity_audit_consistent(spark, sf_dir):
    r = ext_k_anonymity_audit(spark, sf_dir).collect()[0]
    assert r.n_classes >= 1
    assert r.min_k >= 1
    assert 0 <= r.unique_rows <= r.rows_at_risk
    assert 0.0 <= r.at_risk_share <= 1.0
    if r.min_k == 1:
        assert r.unique_rows >= 1


def test_l_diversity_audit_consistent(spark, sf_dir):
    r = ext_l_diversity_audit(spark, sf_dir).collect()[0]
    assert r.n_classes >= 1
    assert r.min_l >= 1
    assert 0 <= r.homogeneous_classes <= r.n_classes
    assert 0.0 <= r.homogeneous_share <= 1.0
    # each homogeneous class holds at least one row (min_l >= 1 => k >= 1)
    assert r.rows_in_homogeneous >= r.homogeneous_classes or (
        r.homogeneous_classes == 0 and r.rows_in_homogeneous == 0
    )


def test_dp_counts_hide_exactness_but_stay_close(spark, sf_dir):
    from habits_etl_spark.plans.common import t

    rows = ext_dp_noisy_counts(spark, sf_dir).collect()
    true = {
        r["event_type"]: r["count"]
        for r in t(spark, sf_dir, "events")
        .groupBy("event_type")
        .count()
        .collect()
    }
    assert set(r.event_type for r in rows) == set(true)
    for r in rows:
        # noisy = true + noise, and Laplace(1/eps=1) noise is small w.h.p.
        assert abs(r.noisy_n - r.noise - true[r.event_type]) < 1e-6
        assert abs(r.noise) < 50  # scale-1 Laplace tail bound, loose
    # determinism: a second run draws the identical noise
    again = {r.event_type: r.noise for r in ext_dp_noisy_counts(spark, sf_dir).collect()}
    assert again == {r.event_type: r.noise for r in rows}


def test_weighted_median_is_a_weight_midpoint(spark, sf_dir):
    from habits_etl_spark.plans.common import t
    from pyspark.sql import functions as F

    rows = agg_weighted_median(spark, sf_dir).collect()
    assert rows
    li = t(spark, sf_dir, "lineitem")
    for r in rows:
        below = (
            li.filter(
                (F.col("l_returnflag") == r.flag)
                & (F.col("l_extendedprice") < r.weighted_median_price)
            )
            .agg(F.sum("l_quantity"))
            .collect()[0][0]
            or 0.0
        )
        # strictly-below mass can never reach half the total weight
        assert below <= r.total_weight / 2 + 1e-6


def test_skyline_is_mutually_nondominated(spark, sf_dir):
    rows = ext_skyline_2d(spark, sf_dir).collect()
    assert rows
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r.segment, []).append(r)
    for pts in by_seg.values():
        for a in pts:
            for b in pts:
                if a.o_orderkey == b.o_orderkey:
                    continue
                # no skyline point strictly dominates another
                assert not (
                    a.o_totalprice > b.o_totalprice and a.order_day > b.order_day
                )
