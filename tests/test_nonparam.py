"""Structural invariants for the wave-27 null-safe/nonparametric
family (exact values are hash-checked against the DuckDB oracle by
tools/check_correctness.py; these assert the properties that must hold
on ANY input)."""

from __future__ import annotations

import math

from habits_etl_spark.plans.nonparam import (
    agg_kendall_tau,
    agg_runs_test,
    join_null_safe_eq,
)


def test_null_safe_join_conserves_all_events(spark, sf_dir):
    from pyspark.sql import functions as F

    from habits_etl_spark.plans.common import t

    rows = join_null_safe_eq(spark, sf_dir).collect()
    total = (
        t(spark, sf_dir, "events").filter(F.col("value").isNotNull()).count()
    )
    # THE null-safe property: no event dropped, including null buckets
    assert sum(r.n_events for r in rows) == total
    by_tier = {r.tier_name: r for r in rows}
    assert "unclassified" in by_tier
    assert by_tier["unclassified"].n_events > 0  # the bucket a plain join loses


def test_runs_test_consistency(spark, sf_dir):
    rows = agg_runs_test(spark, sf_dir).collect()
    assert rows
    for r in rows:
        n = r.n_above + r.n_below
        # runs are bounded by the sequence structure
        assert 1 <= r.n_runs <= n
        assert r.n_runs <= 2 * min(r.n_above, r.n_below) + 1
        expect = 1.0 + 2.0 * r.n_above * r.n_below / n
        assert math.isclose(r.expected_runs, expect, abs_tol=1e-4)
        if r.z_stat is not None:
            # z sign matches runs vs expectation
            assert (r.z_stat >= 0) == (r.n_runs >= r.expected_runs)


def test_kendall_tau_pair_accounting(spark, sf_dir):
    r = agg_kendall_tau(spark, sf_dir).collect()[0]
    # every unordered day pair votes exactly once
    assert r.concordant + r.discordant <= r.n_pairs
    n = int((1 + math.isqrt(1 + 8 * r.n_pairs)) // 2)
    assert n * (n - 1) // 2 == r.n_pairs  # pairs = C(days, 2)
    if r.tau_b is not None:
        assert -1.0 - 1e-6 <= r.tau_b <= 1.0 + 1e-6
        denom = math.sqrt(r.n_pairs - r.ties_x) * math.sqrt(
            r.n_pairs - r.ties_y
        )
        assert math.isclose(
            r.tau_b, (r.concordant - r.discordant) / denom, abs_tol=1e-5
        )
