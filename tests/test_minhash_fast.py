"""xxhash64 MinHash variant: precision is exact by construction (shared
verification stage), recall is checked against brute-force Jaccard ground
truth, and the two hash choices agree on the verified pair set here."""

from __future__ import annotations

from habits_etl_spark.plans.common import t
from habits_etl_spark.plans.ext_text import (
    _JACCARD_THRESHOLD,
    _SHINGLE_N,
    ext_near_dedup_minhash,
    ext_near_dedup_minhash_fast,
)


def _bruteforce_pairs(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    sh = {}
    for r in docs:
        w = r.text.strip().split()
        if len(w) < _SHINGLE_N:
            continue
        sh[r.doc_id] = {
            " ".join(w[i : i + _SHINGLE_N]) for i in range(len(w) - _SHINGLE_N + 1)
        }
    ids = sorted(sh)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if not inter:
                continue
            j = inter / (len(sh[a]) + len(sh[b]) - inter)
            if j >= _JACCARD_THRESHOLD:
                out[(a, b)] = round(j, 4)
    return out


def test_fast_variant_precision_and_recall(spark, sf_dir):
    truth = _bruteforce_pairs(spark, sf_dir)
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ext_near_dedup_minhash_fast(spark, sf_dir).collect()
    }
    # precision 1.0 by construction: the exact-verify stage re-checks
    # every candidate, so anything reported must be in the ground truth
    for pair, j in got.items():
        assert pair in truth and truth[pair] == j, pair
    # recall: banding is probabilistic, but at these similarities the
    # candidate probability is near 1 — require >= 90% of true pairs
    assert truth, "fixture has no near-dup pairs to check"
    assert len(got) >= 0.9 * len(truth), (len(got), len(truth))


def test_fast_and_md5_variants_agree_after_verification(spark, sf_dir):
    slow = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ext_near_dedup_minhash(spark, sf_dir).collect()
    }
    fast = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ext_near_dedup_minhash_fast(spark, sf_dir).collect()
    }
    # candidate sets may differ (different hash families) but the exact
    # verification makes reported-pair VALUES identical where both found
    # the pair, and on this fixture both find the same set
    assert slow == fast
