"""Structural invariants for the wave-15 robust-statistics family
(exact values are hash-checked against the DuckDB oracle by
tools/check_correctness.py; these assert the properties that must hold
on ANY input)."""

from __future__ import annotations

import math

from habits_etl_spark.plans.robust import (
    _ACF_MAX_LAG,
    agg_autocorrelation,
    agg_benford_deviation,
    agg_mad_outliers,
    agg_weekday_seasonality,
    ext_changepoint_cusum,
)


def test_mad_outliers_bounded(spark, sf_dir):
    rows = agg_mad_outliers(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.mad >= 0.0
        assert 0 <= r.n_outliers <= r.n
        # a MAD screen at 3 sigma-equivalents can only flag a minority
        assert r.n_outliers < r.n / 2


def test_acf_in_valid_range(spark, sf_dir):
    rows = agg_autocorrelation(spark, sf_dir).collect()
    assert rows
    lags_seen = set()
    for r in rows:
        assert -1.0 - 1e-6 <= r.acf <= 1.0 + 1e-6
        assert 1 <= r.lag <= _ACF_MAX_LAG
        assert r.n >= 2
        lags_seen.add(r.lag)
    assert lags_seen == set(range(1, _ACF_MAX_LAG + 1))


def test_cusum_picks_one_day_per_type(spark, sf_dir):
    rows = ext_changepoint_cusum(spark, sf_dir).collect()
    assert rows
    types = [r.event_type for r in rows]
    assert len(types) == len(set(types))  # exactly one changepoint per type
    for r in rows:
        assert r.cusum_stat >= 0.0
        assert r.n_days >= 1


def test_seasonal_indices_average_to_one(spark, sf_dir):
    rows = agg_weekday_seasonality(spark, sf_dir).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        assert r.seasonal_index > 0.0
        assert 1 <= r.dow <= 7
        by_type.setdefault(r.event_type, []).append(r)
    for seq in by_type.values():
        # weighted by days-per-dow the indices reconstruct the overall mean;
        # with a full grid the plain average is ~1 (30 days ≈ balanced weeks)
        mean_idx = sum(r.seasonal_index for r in seq) / len(seq)
        assert 0.8 < mean_idx < 1.2


def test_benford_is_a_distribution(spark, sf_dir):
    rows = sorted(agg_benford_deviation(spark, sf_dir).collect(), key=lambda r: r.d)
    assert [r.d for r in rows] == list(range(1, 10))
    assert math.isclose(sum(r.observed_p for r in rows), 1.0, abs_tol=1e-3)
    assert math.isclose(sum(r.benford_p for r in rows), 1.0, abs_tol=1e-3)
    for r in rows:
        assert math.isclose(r.deviation, r.observed_p - r.benford_p, abs_tol=2e-6)
