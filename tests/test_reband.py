"""Re-band lifecycle invariants (r14): the executable retune and its
recall audit must agree with each other and with the default layout.

Structural fact the tests pin: the 4x4 layout's bands are unions of
adjacent 8x2 bands, so a 4-minima band collision implies both contained
2-minima band collisions — rebanded candidates (hence the verified
rebanded RESULT) are a subset of the default result. And the audit's
kept=True rows are, by definition, exactly the default pairs that still
collide under 4x4 — i.e. the rebanded output."""

from __future__ import annotations

from habits_etl_spark.plans.ext_pipeline import (
    ext_near_dedup_minhash_rebanded,
    ext_reband_recall_audit,
)
from habits_etl_spark.plans.ext_text import ext_near_dedup_minhash


def _pairset(df):
    return {(r.doc_a, r.doc_b, r.jaccard) for r in df.collect()}


def test_rebanded_is_subset_of_default(spark, sf_dir):
    default = _pairset(ext_near_dedup_minhash(spark, sf_dir))
    rebanded = _pairset(ext_near_dedup_minhash_rebanded(spark, sf_dir))
    assert rebanded <= default
    # the fixture's template dups are high-jaccard, so the deeper layout
    # must keep a substantial fraction (s-curve at j>=0.8 is >0.85)
    assert len(rebanded) >= 0.5 * len(default) > 0


def test_audit_kept_equals_rebanded_output(spark, sf_dir):
    audit = ext_reband_recall_audit(spark, sf_dir).collect()
    default = _pairset(ext_near_dedup_minhash(spark, sf_dir))
    rebanded = _pairset(ext_near_dedup_minhash_rebanded(spark, sf_dir))
    assert {(r.doc_a, r.doc_b, r.jaccard) for r in audit} == default
    kept = {(r.doc_a, r.doc_b, r.jaccard) for r in audit if r.kept}
    assert kept == rebanded


def test_cluster_safe_split_has_zero_leakage(spark, sf_dir):
    """The fix op's invariants: same-cluster docs share a split, so the
    measured residual leakage is zero — while the naive doc_id split
    (ext_split_leakage) does leak on the same pair graph, which is what
    makes the fix non-vacuous on this fixture."""
    from habits_etl_spark.plans.ext_pipeline import (
        ext_cluster_safe_split,
        ext_split_leakage,
    )

    rows = {r.split: r for r in ext_cluster_safe_split(spark, sf_dir).collect()}
    assert sorted(rows) == ["test", "train", "val"]
    assert all(r.leaked_pairs == 0 for r in rows.values())
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.docs for r in rows.values()) == n_docs
    assert abs(sum(r.doc_share for r in rows.values()) - 1.0) < 1e-4
    for r in rows.values():
        assert 0 < r.clusters <= r.docs
    # the naive split leaks on the same pair graph (non-vacuity witness)
    assert ext_split_leakage(spark, sf_dir).count() > 0
