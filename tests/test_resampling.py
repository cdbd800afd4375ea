"""Structural invariants for the wave-26 resampling/curve family
(exact values are hash-checked against the DuckDB oracle by
tools/check_correctness.py; these assert the properties that must hold
on ANY input)."""

from __future__ import annotations

import math

from habits_etl_spark.plans.resampling import (
    _BOOT_B,
    _GAINS_BINS,
    agg_feature_calibration,
    agg_poisson_bootstrap_ci,
    ext_cumulative_gains,
)


def test_bootstrap_ci_brackets_the_point_estimate(spark, sf_dir):
    r = agg_poisson_bootstrap_ci(spark, sf_dir).collect()[0]
    assert r.n_replicas == _BOOT_B
    assert r.ci_lo <= r.ci_hi
    # the point estimate lies inside (or at worst at the edge of) the CI
    assert r.ci_lo - 1e-6 <= r.point_mean <= r.ci_hi + 1e-6
    # CI width shrinks like 1/sqrt(n): sanity-band it around the sample
    assert (r.ci_hi - r.ci_lo) < r.point_mean  # not absurdly wide
    # determinism: a rerun reproduces the identical interval
    again = agg_poisson_bootstrap_ci(spark, sf_dir).collect()[0]
    assert (again.ci_lo, again.ci_hi) == (r.ci_lo, r.ci_hi)


def test_gains_curve_monotone_and_terminal(spark, sf_dir):
    rows = sorted(ext_cumulative_gains(spark, sf_dir).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, _GAINS_BINS + 1))
    gains = [r.cum_gain for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(gains, gains[1:]))  # non-decreasing
    assert math.isclose(gains[-1], 1.0, abs_tol=1e-6)  # all positives captured
    assert math.isclose(rows[-1].lift, 1.0, abs_tol=1e-3)  # full-pop lift is 1
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 1  # equal-frequency deciles


def test_ece_bounds(spark, sf_dir):
    r = agg_feature_calibration(spark, sf_dir).collect()[0]
    assert 0.0 <= r.ece <= 1.0  # ECE is a mass-weighted mean of |diffs| in [0,1]
    assert 1 <= r.n_bins <= 10
    assert r.n_rows >= 1
