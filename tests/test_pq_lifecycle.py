"""PQ index lifecycle invariants (r14): the layout sim's decision table
and the executed retune must be consistent with each other and with the
deployed layout.

Structural facts pinned here: quantization distortion is monotone
decreasing in the subspace count (finer subvectors can only fit better —
each m=2k codebook can represent every m=k reconstruction), and the
retuned (m=16) search, holding the shortlist and re-rank constant, must
not lose recall vs the deployed m=8 search beyond noise.
"""

from __future__ import annotations

import collections

from habits_etl_spark.plans.ext_vectors3 import ext_pq_topk
from habits_etl_spark.plans.ext_vectors4 import (
    _PQ_RETUNE_M,
    _PQ_SIM_LAYOUTS,
    ext_pq_layout_sim,
    ext_pq_topk_retuned,
)


def test_layout_sim_distortion_monotone(spark, sf_dir):
    rows = {r.m_sub: r for r in ext_pq_layout_sim(spark, sf_dir).collect()}
    assert sorted(rows) == sorted(_PQ_SIM_LAYOUTS)
    counts = {r.vectors for r in rows.values()}
    assert len(counts) == 1  # every layout scored the whole corpus
    for r in rows.values():
        assert r.code_bits == r.m_sub * 4  # log2(k)=4 at the deployed k=16
        assert 0.0 <= r.mean_recon_err <= r.max_recon_err
    errs = [rows[m].mean_recon_err for m in sorted(rows)]
    # finer m -> lower err. Representability guarantees this only for
    # OPTIMAL codebooks; 3-round Lloyd fits from hash-picked seeds get a
    # small tolerance so a regenerated fixture can't fail the test on a
    # near-tie (the shipped fixture measures strict gaps of ~0.17-0.24)
    for hi, lo in zip(errs, errs[1:]):
        assert lo <= hi + 0.05, errs
    # the selected layout is the distortion argmin of the table — a
    # DELIBERATE coupling: if a new fixture moves the argmin, the
    # _PQ_RETUNE_M constant must be re-decided with it
    assert min(rows.values(), key=lambda r: r.mean_recon_err).m_sub == _PQ_RETUNE_M


def _mean_recall(df, emb):
    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return num / (na * nb)

    got = collections.defaultdict(list)
    for r in df.collect():
        got[r.query_id].append(r)
    recalls = []
    for q in sorted(got):
        rs = got[q]
        assert len(rs) == 5
        keys = [(-r.cos, r.neighbor_id) for r in rs]
        assert keys == sorted(keys)
        exact = sorted(
            ((cos(emb[q], emb[i]), -i) for i in emb if i != q), reverse=True
        )[:5]
        ex = {-i for _, i in exact}
        recalls.append(len(ex & {r.neighbor_id for r in rs}) / 5)
    assert len(recalls) == 10
    return sum(recalls) / len(recalls)


def test_retuned_recall_not_worse_than_deployed(spark, sf_dir):
    emb = {
        r.vec_id: list(r.embedding)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    deployed = _mean_recall(ext_pq_topk(spark, sf_dir), emb)
    retuned = _mean_recall(ext_pq_topk_retuned(spark, sf_dir), emb)
    # same shortlist size and re-rank; only the code fidelity changed.
    # Finer codes rank the true neighbors into the shortlist at least as
    # often — allow one shortlist swap of noise across the 50 slots.
    assert retuned >= deployed - 0.02, (retuned, deployed)
    assert retuned >= 0.6, retuned
