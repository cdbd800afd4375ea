"""Reference-equivalence tests for retrieval wave 2 (RRF fusion, MMR
diversification) and the KL drift monitor."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from habits_etl_spark.plans.common import t
from habits_etl_spark.plans.ext_curation7 import (
    _KL_BIN_W,
    _KL_BOUNDARY,
    _KL_NBINS,
    agg_histogram_kl_drift,
)
from habits_etl_spark.plans.ext_retrieval import bm25_topk_over
from habits_etl_spark.plans.ext_retrieval2 import (
    _MMR_K,
    _MMR_LAMBDA,
    _MMR_POOL,
    _RRF_C,
    _RRF_TOPK,
    _SEM_QUERY_VEC,
    _semantic_topk,
    ext_hybrid_rrf_topk,
    ext_mmr_diversify,
)


def _vecs(spark, sf_dir):
    return {
        r.vec_id: [float(x) for x in r.embedding]
        for r in t(spark, sf_dir, "embeddings").collect()
    }


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / math.sqrt(sum(x * x for x in a)) / math.sqrt(sum(x * x for x in b))


def test_rrf_fusion_matches_component_rankings(spark, sf_dir):
    lex = [
        (r.doc_id, r.score)
        for r in bm25_topk_over(t(spark, sf_dir, "documents"))
        .select("doc_id", "score")
        .collect()
    ]
    lex_rank = {
        d: i + 1
        for i, (d, _) in enumerate(sorted(lex, key=lambda x: (-x[1], x[0])))
    }
    sem = [(r.vec_id, r.cos) for r in _semantic_topk(spark, sf_dir).collect()]
    sem_rank = {
        d: i + 1
        for i, (d, _) in enumerate(sorted(sem, key=lambda x: (-x[1], x[0])))
    }
    expect_scores = {}
    for d in set(lex_rank) | set(sem_rank):
        s = 0.0
        if d in lex_rank:
            s += 1.0 / (_RRF_C + lex_rank[d])
        if d in sem_rank:
            s += 1.0 / (_RRF_C + sem_rank[d])
        expect_scores[d] = round(s, 6)
    expect_top = sorted(expect_scores.items(), key=lambda kv: (-kv[1], kv[0]))[
        :_RRF_TOPK
    ]
    got = ext_hybrid_rrf_topk(spark, sf_dir).collect()
    assert [(r.doc_id, r.rrf) for r in got] == expect_top
    for r in got:
        assert r.lex_rk == lex_rank.get(r.doc_id)
        assert r.sem_rk == sem_rank.get(r.doc_id)


def test_mmr_matches_python_reference(spark, sf_dir):
    vecs = _vecs(spark, sf_dir)
    q = vecs[_SEM_QUERY_VEC]
    rel_all = sorted(
        ((round(_cos(vecs[i], q), 4), -i) for i in vecs if i != _SEM_QUERY_VEC),
        reverse=True,
    )[:_MMR_POOL]
    rel = {-ni: c for c, ni in rel_all}
    selected = []
    while len(selected) < min(_MMR_K, len(rel)):
        best = None
        for cand, rc in rel.items():
            if cand in {s for s, _ in selected}:
                continue
            mx = max(
                (round(_cos(vecs[cand], vecs[s]), 4) for s, _ in selected),
                default=0.0,
            )
            score = round(_MMR_LAMBDA * rc - (1 - _MMR_LAMBDA) * mx, 6)
            if best is None or (-score, cand) < best[0]:
                best = ((-score, cand), cand, score)
        selected.append((best[1], best[2]))
    got = ext_mmr_diversify(spark, sf_dir).orderBy("rank").collect()
    assert [(r.vec_id, r.mmr_score) for r in got] == selected
    assert [r.rank for r in got] == list(range(1, len(selected) + 1))


def test_kl_drift_matches_python(spark, sf_dir):
    import datetime

    boundary = datetime.datetime.fromisoformat(_KL_BOUNDARY)
    rows = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "ts", "value")
        .collect()
    )
    counts = defaultdict(lambda: [[0] * _KL_NBINS, [0] * _KL_NBINS])
    for r in rows:
        period = 0 if r.ts < boundary else 1
        b = min(int(r.value // _KL_BIN_W), _KL_NBINS - 1)
        counts[r.event_type][period][b] += 1
    got = {r.event_type: r for r in agg_histogram_kl_drift(spark, sf_dir).collect()}
    assert set(got) == set(counts)
    for et, (cp, cq) in counts.items():
        n_p, n_q = sum(cp), sum(cq)
        kl = sum(
            ((c + 1.0) / (n_p + _KL_NBINS))
            * math.log(
                ((c + 1.0) / (n_p + _KL_NBINS)) / ((d + 1.0) / (n_q + _KL_NBINS))
            )
            for c, d in zip(cp, cq)
        )
        r = got[et]
        assert (r.n_first_half, r.n_second_half) == (n_p, n_q)
        assert abs(r.kl_divergence - kl) < 1e-6
        assert r.kl_divergence >= 0.0
