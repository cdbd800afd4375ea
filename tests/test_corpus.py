"""Structural invariants for the wave-20 corpus-linguistics family
(exact values are hash-checked against the DuckDB oracle by
tools/check_correctness.py; these assert the properties that must hold
on ANY input)."""

from __future__ import annotations

import math

from habits_etl_spark.plans.corpus import (
    agg_source_diversity,
    ext_heaps_law_fit,
    ext_source_vocab_overlap,
    win_doc_novelty_curve,
)


def test_heaps_fit_shape(spark, sf_dir):
    r = ext_heaps_law_fit(spark, sf_dir).collect()[0]
    assert r.n_points >= 2
    # vocabulary growth is sublinear: 0 <= beta <= 1 on any real corpus
    assert -1e-6 <= r.heaps_beta <= 1.0 + 1e-6
    assert r.heaps_k > 0.0


def test_vocab_overlap_set_algebra(spark, sf_dir):
    rows = ext_source_vocab_overlap(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.src_a < r.src_b  # each unordered pair appears once
        assert 0 < r.n_common <= min(r.vocab_a, r.vocab_b)
        assert 0.0 < r.jaccard <= 1.0
        assert 0.0 < r.containment <= 1.0
        assert r.jaccard <= r.containment + 1e-9  # |∩|/|∪| <= |∩|/min
        union = r.vocab_a + r.vocab_b - r.n_common
        assert math.isclose(r.jaccard, r.n_common / union, abs_tol=1e-5)


def test_source_diversity_bounds(spark, sf_dir):
    rows = agg_source_diversity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_langs >= 1 and r.n_docs >= r.n_langs
        assert -1e-6 <= r.shannon_nats <= math.log(r.n_langs) + 1e-6
        # Gini-Simpson of k categories is within [0, 1 - 1/k]
        assert -1e-6 <= r.simpson_index <= 1.0 - 1.0 / r.n_langs + 1e-6


def test_novelty_curve_conserves_vocab(spark, sf_dir):
    rows = sorted(win_doc_novelty_curve(spark, sf_dir).collect(), key=lambda r: r.doc_id)
    assert rows
    assert rows[0].novelty_rate == 1.0  # the first document is all-new
    total_new = sum(r.n_new_types for r in rows)
    heaps = ext_heaps_law_fit(spark, sf_dir).collect()[0]
    assert heaps is not None
    for r in rows:
        assert 0 <= r.n_new_types <= r.n_types
        assert 0.0 <= r.novelty_rate <= 1.0
    # every type is new exactly once: totals equal the corpus vocabulary
    distinct_types = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("explode(split(trim(text), '\\\\s+')) AS w")
        .distinct()
        .count()
    )
    assert total_new == distinct_types
