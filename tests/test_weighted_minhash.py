"""ICWS weighted MinHash (ext_weighted_minhash_pairs): estimator and
pipeline invariants the oracle hash cannot state by itself —
brute-force agreement for surfaced pairs, exact-duplicate recall, and
the precision-by-construction contract."""

from __future__ import annotations

import os
from collections import Counter

import pytest

from habits_etl_spark.plans.common import t as load
from habits_etl_spark.plans.ext_text import (
    _ICWS_THR,
    ext_weighted_minhash_pairs,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _tf_vectors(spark):
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    vecs = {}
    for r in docs:
        ws = r.text.strip().split()
        if len(ws) >= 2:
            vecs[r.doc_id] = Counter(
                f"{a} {b}" for a, b in zip(ws, ws[1:])
            )
    return vecs


def _wj(a: Counter, b: Counter) -> float:
    keys = set(a) | set(b)
    smin = sum(min(a[k], b[k]) for k in keys)
    smax = sum(max(a[k], b[k]) for k in keys)
    return smin / smax


@pytest.fixture(scope="module")
def result(spark):
    return {
        (r.doc_a, r.doc_b): r.w_jaccard
        for r in ext_weighted_minhash_pairs(spark, SF_DIR).collect()
    }


def test_surfaced_pairs_carry_true_weighted_jaccard(spark, result):
    vecs = _tf_vectors(spark)
    assert result, "fixture should surface at least one near-dup pair"
    for (a, b), jw in result.items():
        assert a < b
        assert jw >= _ICWS_THR
        assert jw == pytest.approx(_wj(vecs[a], vecs[b]), abs=1e-12)


def test_exact_duplicates_always_recalled(spark, result):
    """Identical tf vectors => identical ICWS signatures => same buckets
    in every band, so jw == 1.0 pairs can never be missed."""
    vecs = _tf_vectors(spark)
    by_vec: dict = {}
    for d, v in vecs.items():
        by_vec.setdefault(frozenset(v.items()), []).append(d)
    exact = {
        (a, b)
        for ds in by_vec.values()
        for i, a in enumerate(ds)
        for b in ds[i + 1 :]
    }
    missing = {tuple(sorted(p)) for p in exact} - set(result)
    assert not missing
    for p in exact:
        assert result[tuple(sorted(p))] == 1.0


def test_no_pair_below_threshold_emitted(result):
    assert all(jw >= _ICWS_THR for jw in result.values())
