"""Structural invariants for the wave-16 basket/journey family (exact
values are hash-checked against the DuckDB oracle by
tools/check_correctness.py; these assert the properties that must hold
on ANY input)."""

from __future__ import annotations

from habits_etl_spark.plans.journey import (
    _PATH_TOPK,
    agg_time_to_convert,
    ext_basket_pairs,
    ext_journey_paths_topk,
    ext_user_journey_entropy,
    win_inter_event_times,
)


def test_basket_rules_are_consistent(spark, sf_dir):
    rows = ext_basket_pairs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.antecedent != r.consequent
        assert 0.0 < r.support <= 1.0
        assert 0.0 < r.confidence <= 1.0
        assert r.lift > 0.0
        # support can never exceed confidence (n_ab/N <= n_ab/n_a)
        assert r.support <= r.confidence + 1e-9
    # pair symmetry of co-occurrence counts: n(a,b) == n(b,a)
    by_pair = {(r.antecedent, r.consequent): r.n_ab for r in rows}
    for (a, b), n in by_pair.items():
        if (b, a) in by_pair:
            assert by_pair[(b, a)] == n


def test_journey_paths_topk_sorted_and_bounded(spark, sf_dir):
    rows = ext_journey_paths_topk(spark, sf_dir).collect()
    assert 1 <= len(rows) <= _PATH_TOPK
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        assert len(r.path.split(">")) == 3
        assert 0.0 < r.share <= 1.0


def test_time_to_convert_consistent(spark, sf_dir):
    rows = agg_time_to_convert(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_converted <= r.n_signups
        assert 0.0 <= r.conversion_rate <= 1.0
        if r.n_converted:
            assert r.median_days >= 0.0
            assert r.p90_days >= r.median_days - 1e-9


def test_journey_entropy_bounds(spark, sf_dir):
    import math

    rows = ext_user_journey_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_types >= 1
        assert r.n_events >= r.n_types
        # entropy of a k-way distribution is within [0, ln k]
        assert -1e-6 <= r.type_entropy_nats <= math.log(r.n_types) + 1e-6


def test_inter_event_gap_ordering(spark, sf_dir):
    rows = win_inter_event_times(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_gaps >= 1
        assert 0.0 <= r.median_gap_s <= r.p90_gap_s <= r.max_gap_s + 1e-9
        assert 0.0 < r.mean_gap_s <= r.max_gap_s
