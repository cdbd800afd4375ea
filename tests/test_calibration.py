"""The r14 classifier-calibration audit must be reconstructable from its
two parent operators in plain Python."""

from __future__ import annotations

from collections import defaultdict


def test_calibration_matches_parents(spark, sf_dir):
    from habits_etl_spark.plans import QUERIES
    from habits_etl_spark.plans.ext_curation5 import ext_classifier_calibration

    probs = {
        r.doc_id: r.quality_prob
        for r in QUERIES["ext_quality_classifier"](spark, sf_dir).collect()
    }
    passed = {
        r.doc_id: r.passed
        for r in QUERIES["ext_gopher_rules"](spark, sf_dir).collect()
    }
    bins = defaultdict(lambda: [0, 0.0, 0])  # n, sum_prob, n_pass
    for doc_id, p in probs.items():
        if doc_id not in passed:
            continue
        b = min(int(p * 10), 9)
        bins[b][0] += 1
        bins[b][1] += p
        bins[b][2] += 1 if passed[doc_id] else 0

    got = {r.bin: r for r in ext_classifier_calibration(spark, sf_dir).collect()}
    assert set(got) == set(bins)
    for b, (n, sp, np_) in bins.items():
        r = got[b]
        assert r.n_docs == n
        assert abs(r.mean_predicted - sp / n) < 1e-6
        assert abs(r.rule_pass_rate - np_ / n) < 1e-6
        assert abs(r.calibration_gap - (r.mean_predicted - r.rule_pass_rate)) < 1e-9
    # a reliability table must be monotone in its own predictions:
    # higher-probability bins predict higher keep rates by construction
    preds = [got[b].mean_predicted for b in sorted(got)]
    assert preds == sorted(preds)
