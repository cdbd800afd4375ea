"""Structural invariants for the wave-19 experimentation/BI family
(exact values are hash-checked against the DuckDB oracle by
tools/check_correctness.py; these assert the properties that must hold
on ANY input)."""

from __future__ import annotations

import math

from habits_etl_spark.plans.experiment import (
    _CF_TOPK,
    agg_delta_contribution,
    agg_psi_drift,
    agg_wow_growth,
    ext_ab_test_welch,
    ext_user_similarity_topk,
)


def test_ab_split_covers_all_users_and_aa_is_null(spark, sf_dir):
    from habits_etl_spark.plans.common import t

    r = ext_ab_test_welch(spark, sf_dir).collect()[0]
    n_users = t(spark, sf_dir, "events").select("user_id").distinct().count()
    assert r.n_a + r.n_b == n_users
    assert r.n_a > 0 and r.n_b > 0
    assert 0.0 <= r.conv_a <= 1.0 and 0.0 <= r.conv_b <= 1.0
    # this is an A/A comparison by construction: both stats near zero
    assert abs(r.welch_t) < 4.0
    if r.prop_z is not None:
        assert abs(r.prop_z) < 4.0


def test_wow_growth_reconstructs_ratio(spark, sf_dir):
    rows = agg_wow_growth(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.prev_value != 0
        expect = (r.total_value - r.prev_value) / r.prev_value
        assert math.isclose(r.wow_growth, expect, abs_tol=1e-5)


def test_delta_contribution_shares_sum_to_one(spark, sf_dir):
    rows = agg_delta_contribution(spark, sf_dir).collect()
    assert rows
    total_delta = sum(r.delta for r in rows)
    assert abs(total_delta) > 0
    share_sum = sum(r.delta_share for r in rows)
    assert math.isclose(share_sum, 1.0, abs_tol=1e-4)
    for r in rows:
        assert math.isclose(
            r.delta, r.cur_value - r.prev_value, abs_tol=1e-3
        )


def test_psi_nonnegative(spark, sf_dir):
    r = agg_psi_drift(spark, sf_dir).collect()[0]
    # PSI is a symmetrized KL — nonnegative up to per-term rounding
    assert r.psi >= -1e-6
    assert r.n_bins >= 2


def test_user_similarity_topk_blocked_path_matches_single_block(
    spark, sf_dir, monkeypatch
):
    """The adaptive grid runs g==1 (coalesce+mapInPandas, no shuffle) at
    test scale; force a multi-block grid and assert the SUMMA-style
    cogroup+merge-window path returns the identical ranked result —
    blocking must never change any value."""
    import habits_etl_spark.plans.experiment as ex

    single = sorted(
        map(tuple, ext_user_similarity_topk(spark, sf_dir).collect())
    )
    monkeypatch.setattr(ex, "_CF_BLOCK_ROWS", 25)  # forces g > 1
    blocked = sorted(
        map(tuple, ext_user_similarity_topk(spark, sf_dir).collect())
    )
    assert blocked == single


def test_user_similarity_topk_shape(spark, sf_dir):
    rows = ext_user_similarity_topk(spark, sf_dir).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        assert r.user_id != r.neighbor_id
        assert -1.0 - 1e-6 <= r.cosine <= 1.0 + 1e-6
        by_user.setdefault(r.user_id, []).append(r)
    for seq in by_user.values():
        seq.sort(key=lambda r: r.rank)
        assert [r.rank for r in seq] == list(range(1, len(seq) + 1))
        assert len(seq) <= _CF_TOPK
        sims = [r.cosine for r in seq]
        assert sims == sorted(sims, reverse=True)
