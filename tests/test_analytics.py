"""Invariants for the retention / funnel analytics family (values are
hash-checked against the DuckDB oracle by tools/check_correctness.py; these
assert the structural properties that must hold on ANY input)."""

from __future__ import annotations

from habits_etl_spark.plans.analytics import ext_event_funnel, win_retention_cohort


def test_retention_bounds(spark, sf_dir):
    rows = win_retention_cohort(spark, sf_dir).collect()
    assert rows
    total_users = sum(r.n_users for r in rows)  # cohorts partition the users
    assert total_users > 0
    for r in rows:
        assert 0 <= r.d1_retained <= r.n_users
        assert 0 <= r.d7_retained <= r.n_users
        assert 0.0 <= r.d1_rate <= 1.0 and 0.0 <= r.d7_rate <= 1.0


def test_funnel_monotone(spark, sf_dir):
    rows = ext_event_funnel(spark, sf_dir).collect()
    assert [r.stage_ord for r in rows] == [1, 2, 3]
    ns = [r.n_users for r in rows]
    assert ns[0] >= ns[1] >= ns[2]  # a funnel can only narrow
    assert rows[0].pct_of_cohort == 1.0
    for r in rows:
        assert 0.0 <= r.pct_of_cohort <= 1.0
