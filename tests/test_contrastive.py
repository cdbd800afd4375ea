"""Structural invariants for the wave-25 training-pair family (exact
values are hash-checked against the DuckDB oracle by
tools/check_correctness.py; these assert the properties that must hold
on ANY input)."""

from __future__ import annotations

import math

from habits_etl_spark.plans.contrastive import (
    _NEG_K,
    ext_class_weights,
    ext_hard_negatives_topk,
    ext_negative_sampling,
    ext_triplet_mining,
)


def test_class_weights_average_to_one(spark, sf_dir):
    rows = ext_class_weights(spark, sf_dir).collect()
    assert rows
    total = sum(r.n for r in rows)
    # corpus-weighted mean of the balanced weights is exactly 1
    weighted = sum(r.weight * r.n for r in rows) / total
    assert math.isclose(weighted, 1.0, abs_tol=1e-3)
    assert math.isclose(sum(r.freq for r in rows), 1.0, abs_tol=1e-3)
    # rarer classes always get larger weights
    by_n = sorted(rows, key=lambda r: r.n)
    ws = [r.weight for r in by_n]
    assert ws == sorted(ws, reverse=True)


def test_negatives_never_collide_with_positives(spark, sf_dir):
    from pyspark.sql import functions as F

    from habits_etl_spark.plans.common import t

    neg = ext_negative_sampling(spark, sf_dir)
    ev = t(spark, sf_dir, "events")
    basket = ev.select(
        "user_id",
        F.date_format(F.date_trunc("DAY", "ts"), "yyyy-MM-dd").alias("day"),
        F.col("event_type").alias("negative_item"),
    ).distinct()
    collisions = neg.join(basket, ["user_id", "day", "negative_item"]).count()
    assert collisions == 0  # a sampled negative is never a positive
    rows = neg.collect()
    per_key: dict = {}
    for r in rows:
        assert 1 <= r.rank <= _NEG_K
        per_key.setdefault((r.user_id, r.day), []).append(r.rank)
    for ranks in per_key.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # determinism: a rerun samples the identical negatives
    again = {
        (r.user_id, r.day, r.rank): r.negative_item
        for r in ext_negative_sampling(spark, sf_dir).collect()
    }
    assert again == {
        (r.user_id, r.day, r.rank): r.negative_item for r in rows
    }


def test_hard_negatives_are_cross_label_and_sorted(spark, sf_dir):
    rows = ext_hard_negatives_topk(spark, sf_dir).collect()
    assert rows
    from habits_etl_spark.plans.common import t

    labels = {
        r.vec_id: r.label
        for r in t(spark, sf_dir, "embeddings").select("vec_id", "label").collect()
    }
    by_anchor: dict = {}
    for r in rows:
        assert labels[r.negative_id] == r.n_label
        assert r.n_label != labels[r.anchor_id]  # strictly cross-label
        by_anchor.setdefault(r.anchor_id, []).append(r)
    for seq in by_anchor.values():
        seq.sort(key=lambda r: r.rank)
        cs = [r.cos for r in seq]
        assert cs == sorted(cs, reverse=True)  # hardest first


def test_triplets_pick_extremes(spark, sf_dir):
    trip = {r.anchor_id: r for r in ext_triplet_mining(spark, sf_dir).collect()}
    hard = ext_hard_negatives_topk(spark, sf_dir).collect()
    for r in hard:
        if r.rank == 1 and r.anchor_id in trip:
            # the triplet's negative IS the rank-1 hard negative
            assert trip[r.anchor_id].negative_id == r.negative_id
            assert math.isclose(trip[r.anchor_id].neg_cos, r.cos, abs_tol=1e-6)
    for r in trip.values():
        assert math.isclose(
            r.margin, round(r.pos_cos - r.neg_cos, 4), abs_tol=1e-6
        )
        assert r.violates_margin == (r.pos_cos - r.neg_cos < 0.2)
