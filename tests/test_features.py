"""Structural invariants for the wave-14 feature-engineering family
(exact values are hash-checked against the DuckDB oracle by
tools/check_correctness.py; these assert the properties that must hold
on ANY input)."""

from __future__ import annotations

import math

from habits_etl_spark.plans.features import (
    _FH_BUCKETS,
    _QB_BINS,
    _RFM_NTILES,
    ext_feature_scale,
    ext_hashed_features,
    ext_quantile_bin,
    ext_rfm_features,
    ext_target_encode,
    ext_time_split_embargo,
)


def test_rfm_scores_in_range_and_balanced(spark, sf_dir):
    rows = ext_rfm_features(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.r_score <= _RFM_NTILES
        assert 1 <= r.f_score <= _RFM_NTILES
        assert 1 <= r.m_score <= _RFM_NTILES
        assert r.recency_days >= 0 and r.frequency >= 1
    # ntile balance: bucket sizes differ by at most 1
    for attr in ("r_score", "f_score", "m_score"):
        counts: dict[int, int] = {}
        for r in rows:
            counts[getattr(r, attr)] = counts.get(getattr(r, attr), 0) + 1
        assert max(counts.values()) - min(counts.values()) <= 1


def test_target_encode_shrinks_toward_global_mean(spark, sf_dir):
    rows = ext_target_encode(spark, sf_dir).collect()
    assert rows
    total_n = sum(r.n for r in rows)
    g_mean = sum(r.seg_mean * r.n for r in rows) / total_n
    for r in rows:
        lo, hi = sorted((r.seg_mean, g_mean))
        # smoothing pulls the encoding strictly between segment and global mean
        assert lo - 1e-3 <= r.encoded <= hi + 1e-3


def test_quantile_bins_partition_the_orders(spark, sf_dir):
    rows = sorted(ext_quantile_bin(spark, sf_dir).collect(), key=lambda r: r.bin)
    assert [r.bin for r in rows] == list(range(1, _QB_BINS + 1))
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 1  # equal-frequency
    for r in rows:
        assert r.lo <= r.bin_mean <= r.hi
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo  # bins are ordered and non-overlapping


def test_feature_scale_ranges(spark, sf_dir):
    rows = ext_feature_scale(spark, sf_dir).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        assert -1e-6 <= r.v_minmax <= 1.0 + 1e-6
        by_type.setdefault(r.event_type, []).append(r.v_zscore)
    for zs in by_type.values():
        if len(zs) > 1:
            m = sum(zs) / len(zs)
            assert abs(m) < 0.01  # z-scores are centered per group


def test_hashed_features_cover_all_rows(spark, sf_dir):
    from habits_etl_spark.plans.common import t

    rows = ext_hashed_features(spark, sf_dir).collect()
    n_events = t(spark, sf_dir, "events").count()
    assert sum(r.n_rows for r in rows) == n_events  # every row lands in a bucket
    for r in rows:
        assert 0 <= r.bucket < _FH_BUCKETS
        assert r.n_features >= 1


def test_time_split_embargo_partitions_events(spark, sf_dir):
    from habits_etl_spark.plans.common import t

    rows = {r.split: r for r in ext_time_split_embargo(spark, sf_dir).collect()}
    assert set(rows) <= {"train", "embargo", "test"}
    n_events = t(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows.values()) == n_events
    assert math.isclose(rows["train"].user_overlap_with_train, 1.0)
    for r in rows.values():
        assert 0.0 <= r.user_overlap_with_train <= 1.0
        assert r.n_users_seen_in_train <= r.n_users
