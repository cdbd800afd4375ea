"""Structural invariants for the wave-18 trend/survival family (exact
values are hash-checked against the DuckDB oracle by
tools/check_correctness.py; these assert the properties that must hold
on ANY input)."""

from __future__ import annotations

from habits_etl_spark.plans.trend import (
    agg_forecast_backtest,
    agg_trend_ols,
    agg_trend_theil_sen,
    ext_kaplan_meier,
)


def test_ols_r2_in_unit_interval(spark, sf_dir):
    rows = agg_trend_ols(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n >= 2
        assert -1e-6 <= r.r2 <= 1.0 + 1e-6
        assert r.slope_per_day is not None and r.intercept is not None


def test_theil_sen_pair_count(spark, sf_dir):
    ols = {r.event_type: r for r in agg_trend_ols(spark, sf_dir).collect()}
    rows = agg_trend_theil_sen(spark, sf_dir).collect()
    assert rows
    for r in rows:
        n = ols[r.event_type].n
        assert r.n_pairs == n * (n - 1) // 2  # all ordered day pairs


def test_backtest_metrics_ordering(spark, sf_dir):
    rows = agg_forecast_backtest(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_scored >= 1
        assert r.mae >= 0.0 and r.mape >= 0.0
        # RMSE >= MAE always (Jensen)
        assert r.rmse >= r.mae - 1e-6


def test_km_curve_monotone_and_bounded(spark, sf_dir):
    rows = sorted(ext_kaplan_meier(spark, sf_dir).collect(), key=lambda r: r.day)
    assert rows
    prev_s, prev_n = 1.0, None
    for r in rows:
        assert 0.0 < r.survival <= 1.0
        assert r.survival <= prev_s + 1e-9  # survival never increases
        assert 0 < r.n_converted < r.n_at_risk
        if prev_n is not None:
            assert r.n_at_risk <= prev_n  # risk set shrinks over time
        prev_s, prev_n = r.survival, r.n_at_risk
