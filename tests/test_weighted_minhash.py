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


def test_icws_argmin_tie_margin_exceeds_decimal_grid():
    """The residual cross-engine tie class (ADVICE r11 / docstring
    caveat): the argmin keys are double->DECIMAL(28,12) casts computed
    independently per engine, so a pick could only swap engines if the
    min-vs-runner-up gap within some (doc, k) were at the 1e-12 grid
    scale. Turn the docstring's 'gap >> 1e-12 in practice' claim into a
    checked invariant: over EVERY (doc, k) of the fixture corpus, the
    runner-up gap must exceed 1000x the grid — no sub-ulp ln()
    disagreement between JVM and libm can swap a signature pick."""
    import duckdb

    from habits_etl_spark.plans.ext_text import (
        _ICWS_K,
        _ICWS_TOK_DUCK,
        _icws_a_duck,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    (min_gap, n_groups) = con.execute(
        f"""
        WITH tok AS MATERIALIZED ({_ICWS_TOK_DUCK}),
        icws AS (
          SELECT doc_id, k, {_icws_a_duck()} AS a
          FROM (SELECT doc_id, token, tf, k,
                       md5(token || '|' || CAST(k AS VARCHAR)) AS h
                FROM tok CROSS JOIN (SELECT unnest(range(0, {_ICWS_K})) AS k))
        ),
        ranked AS (
          SELECT doc_id, k, a,
                 row_number() OVER (PARTITION BY doc_id, k ORDER BY a) AS rn
          FROM icws
        )
        SELECT min(CAST(gap.a2 - gap.a1 AS DOUBLE)), count(*)
        FROM (
          SELECT doc_id, k,
                 min(CASE WHEN rn = 1 THEN a END) AS a1,
                 min(CASE WHEN rn = 2 THEN a END) AS a2
          FROM ranked GROUP BY 1, 2
        ) gap
        WHERE gap.a2 IS NOT NULL
        """
    ).fetchone()
    assert n_groups > 0
    assert min_gap > 1e-9, (min_gap, n_groups)  # 1000x the 1e-12 grid
