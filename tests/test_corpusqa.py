"""Structural invariants for the wave-28 corpus-QA family (exact
values are hash-checked against the DuckDB oracle by
tools/check_correctness.py; these assert the properties that must hold
on ANY input)."""

from __future__ import annotations

from pyspark.sql import functions as F

from habits_etl_spark.plans.common import t
from habits_etl_spark.plans.corpusqa import (
    ext_int8_quantize,
    ext_source_nchars_quantiles,
    ext_source_reuse_matrix,
    ext_utf8_quality_audit,
)


def test_utf8_audit_conserves_docs_and_bounds(spark, sf_dir):
    rows = ext_utf8_quality_audit(spark, sf_dir).collect()
    assert rows
    total = t(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == total  # every doc audited once
    for r in rows:
        assert 0 <= r.ctrl_docs <= r.n_docs
        assert 0 <= r.replacement_docs <= r.n_docs
        assert r.nonascii_chars >= 0
        assert 0.0 < r.printable_ratio <= 1.0 + 1e-9


def test_nchars_quantiles_bracket_the_data(spark, sf_dir):
    rows = ext_source_nchars_quantiles(spark, sf_dir).collect()
    assert rows
    bounds = {
        r["source"]: r
        for r in t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.min("n_chars").alias("lo"),
            F.max("n_chars").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    for r in rows:
        b = bounds[r.source]
        assert r.n_docs == b.n
        # quantiles are order statistics: monotone and inside [min, max]
        assert b.lo - 1e-9 <= r.p50 <= r.p90 <= b.hi + 1e-9


def test_reuse_matrix_pairs_are_canonical(spark, sf_dir):
    rows = ext_source_reuse_matrix(spark, sf_dir).collect()
    seen = set()
    for r in rows:
        assert r.source_a < r.source_b  # each unordered pair exactly once
        assert (r.source_a, r.source_b) not in seen
        seen.add((r.source_a, r.source_b))
        assert r.shared_8grams >= 1


def test_int8_quantize_error_bounds(spark, sf_dir):
    rows = ext_int8_quantize(spark, sf_dir).collect()
    assert rows
    # absmax rounding step is am/127, so per-value error <= am/254
    worst_am = (
        t(spark, sf_dir, "embeddings")
        .select(F.explode("embedding").alias("x"))
        .agg(F.max(F.abs(F.col("x").cast("double"))))
        .collect()[0][0]
    )
    cap = worst_am / 254.0 + 1e-9
    n_labels = (
        t(spark, sf_dir, "embeddings").select("label").distinct().count()
    )
    assert len(rows) == n_labels
    for r in rows:
        assert 0.0 <= r.mse <= r.max_abs_err**2 + 1e-12
        assert 0.0 <= r.max_abs_err <= cap


def test_embedding_energy_profile_monotone(spark, sf_dir):
    from habits_etl_spark.plans.corpusqa import ext_embedding_energy_profile

    rows = ext_embedding_energy_profile(spark, sf_dir).collect()
    assert rows
    total = t(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == total  # zero-norm vecs excluded only
    for r in rows:
        # nested prefixes: energy mass is monotone in k, bounded by 1
        assert 0.0 < r.energy_8 <= r.energy_16 <= r.energy_32 <= 1.0 + 1e-9
        # sqrt(r) >= r on [0,1], so mean cosine dominates mean energy
        assert r.trunc16_cos >= r.energy_16 - 1e-9
        assert r.trunc16_cos <= 1.0 + 1e-9
