"""Structural invariants for the wave-24 training-table/decomposition
family (exact values are hash-checked against the DuckDB oracle by
tools/check_correctness.py; these assert the properties that must hold
on ANY input)."""

from __future__ import annotations

import math

from habits_etl_spark.plans.timeseries2 import (
    _CHURN_CUTOFF,
    agg_forecast_intervals,
    ext_churn_training_table,
    ts_seasonal_residual,
    win_max_drawdown,
)


def test_churn_table_is_leak_free_by_construction(spark, sf_dir):
    from pyspark.sql import functions as F

    from habits_etl_spark.plans.common import t

    rows = ext_churn_training_table(spark, sf_dir).collect()
    assert rows
    ev = t(spark, sf_dir, "events")
    cutoff = F.lit(_CHURN_CUTOFF).cast("timestamp")
    n_past_users = ev.filter(F.col("ts") < cutoff).select("user_id").distinct().count()
    assert len(rows) == n_past_users  # one row per pre-cutoff user
    for r in rows:
        assert r.n_purchases <= r.n_events
        assert r.days_active >= 1
        assert r.recency_days >= 0  # features never see past the cutoff
        assert r.purchase_value >= 0.0
    # label sanity: churned users are exactly those absent after cutoff
    future_users = {
        x.user_id
        for x in ev.filter(F.col("ts") >= cutoff).select("user_id").distinct().collect()
    }
    for r in rows:
        assert r.churned == (r.user_id not in future_users)


def test_drawdown_nonnegative_and_bounded(spark, sf_dir):
    rows = win_max_drawdown(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # a drop can never exceed the peak it fell from
        assert 0.0 <= r.max_drawdown <= r.peak_value
    # daily series fluctuate: at least one type has a real drawdown
    assert any(r.max_drawdown > 0.0 for r in rows)


def test_decomposition_reconstructs_actual(spark, sf_dir):
    rows = ts_seasonal_residual(spark, sf_dir).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        assert math.isclose(
            r.actual, r.trend * r.seasonal_factor + r.residual, abs_tol=1e-4
        )
        assert r.seasonal_factor > 0.0
        by_type.setdefault(r.event_type, []).append(r)
    # seasonal factors are normalized: day-weighted mean ~ 1 per type
    for seq in by_type.values():
        m = sum(r.seasonal_factor for r in seq) / len(seq)
        assert 0.9 < m < 1.1


def test_forecast_interval_contains_point(spark, sf_dir):
    rows = agg_forecast_intervals(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.lo80 <= r.hi80
        # the empirical band must straddle the point unless residuals
        # were one-sided; both bounds derive from point + quantiles
        assert r.n_residuals >= 2
        assert r.forecast_day > "2024-01-30"
