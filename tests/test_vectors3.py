"""PQ encode + ADC search (wave 5): code-domain invariants, reconstruction
loss bounds, and shortlist-re-rank recall against a pure-Python exact
scan."""

from __future__ import annotations

import collections
import math

from habits_etl_spark.plans.ext_vectors3 import (
    _PQ_K,
    _PQ_M,
    ext_pq_codes,
    ext_pq_topk,
)


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


def test_pq_codes_invariants(spark, sf_dir):
    from types import SimpleNamespace

    raw = ext_pq_codes(spark, sf_dir).collect()
    # codes ship as a csv string (engine-portable driver hashing — r10)
    rows = [
        SimpleNamespace(
            vec_id=r.vec_id,
            label=r.label,
            codes=[int(c) for c in r.codes.split(",")],
            recon_err=r.recon_err,
        )
        for r in raw
    ]
    n_corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(rows) == n_corpus
    for r in rows:
        assert len(r.codes) == _PQ_M
        assert all(0 <= c < _PQ_K for c in r.codes)
        # squared distance between unit vector and reconstruction: >= 0,
        # and < 2 would hold even for orthogonal reconstructions of unit
        # norm; a trained codebook must do clearly better on average
        assert r.recon_err >= 0.0
    mean_err = sum(r.recon_err for r in rows) / len(rows)
    assert mean_err < 1.2, mean_err
    # the quantizer actually uses its code space (not collapsed to one cell)
    per_sub = [collections.Counter(r.codes[m] for r in rows) for m in range(_PQ_M)]
    for m, cnt in enumerate(per_sub):
        assert len(cnt) >= _PQ_K // 2, (m, cnt)


def test_pq_topk_recall_and_exactness(spark, sf_dir):
    rows = ext_pq_topk(spark, sf_dir).collect()
    emb = {
        r.vec_id: list(r.embedding)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    got = collections.defaultdict(list)
    for r in rows:
        got[r.query_id].append(r)
    assert sorted(got) == list(range(10))
    recalls = []
    for q in range(10):
        rs = got[q]
        assert len(rs) == 5
        # descending cos, neighbor_id tie-break, self excluded
        keys = [(-r.cos, r.neighbor_id) for r in rs]
        assert keys == sorted(keys)
        assert all(r.neighbor_id != q for r in rs)
        # the re-rank stage scores EXACT cosine: each reported cos must
        # match the Python dot product to rounding
        for r in rs:
            assert abs(_cos(emb[q], emb[r.neighbor_id]) - r.cos) < 1e-3
        exact = sorted(
            ((_cos(emb[q], emb[i]), -i) for i in emb if i != q), reverse=True
        )[:5]
        ex = {-i for _, i in exact}
        recalls.append(len(ex & {r.neighbor_id for r in rs}) / 5)
    # 32-bit codes + 64-candidate shortlist: mean observed ~0.76; bound
    # leaves margin for float-sum nondeterminism in centroid training
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_ivfpq_topk_recall_and_exactness(spark, sf_dir):
    from habits_etl_spark.plans.ext_vectors3 import _IVFPQ_N_PROBE, ext_ivfpq_topk
    from habits_etl_spark.plans.ext_vectors2 import _KM_K

    rows = ext_ivfpq_topk(spark, sf_dir).collect()
    emb = {
        r.vec_id: list(r.embedding)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    got = collections.defaultdict(list)
    for r in rows:
        got[r.query_id].append(r)
    assert sorted(got) == list(range(10))
    recalls = []
    for q in range(10):
        rs = got[q]
        assert 0 < len(rs) <= 5
        keys = [(-r.cos, r.neighbor_id) for r in rs]
        assert keys == sorted(keys)
        assert all(r.neighbor_id != q for r in rs)
        for r in rs:
            assert abs(_cos(emb[q], emb[r.neighbor_id]) - r.cos) < 1e-3
        exact = sorted(
            ((_cos(emb[q], emb[i]), -i) for i in emb if i != q), reverse=True
        )[:5]
        ex = {-i for _, i in exact}
        recalls.append(len(ex & {r.neighbor_id for r in rs}) / 5)
    # flat-ADC recall is ~0.76 (test above); probing 3/8 cells can only
    # lose cell misses on top — demand it keeps most of it
    assert _IVFPQ_N_PROBE < _KM_K  # the probe actually prunes
    assert sum(recalls) / len(recalls) >= 0.4, recalls


def test_ivf_cell_layout_prunes_partitions(spark, sf_dir, tmp_path):
    """The 100 TB materialization ext_ivfpq_topk's docstring names: corpus
    written partitioned by coarse cell, so a query's probed-cell filter
    becomes partition pruning — non-probed cells are never read."""
    from pyspark.sql import functions as F

    from habits_etl_spark.plans.ext_vectors2 import _argmax_cell_expr
    from habits_etl_spark.plans.ext_vectors2 import _normed_embeddings

    base = _normed_embeddings(spark, sf_dir)
    # deterministic one-hot "centroids": real assignment expression, no
    # training job needed for a layout test
    cents = [[1.0 if i == m * 16 else 0.0 for i in range(64)] for m in range(4)]
    coded = base.withColumn("cell", _argmax_cell_expr(cents)).select("vec_id", "cell")
    path = str(tmp_path / "ivf_index")
    coded.write.partitionBy("cell").parquet(path)

    probed = spark.read.parquet(path).filter(F.col("cell").isin(0, 2))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters")[1][:200], plan[:1500]
    # semantic check: the pruned read equals reading exactly those two
    # partition dirs, and is a strict subset of the table
    direct = spark.read.parquet(f"{path}/cell=0", f"{path}/cell=2").count()
    assert probed.count() == direct
    assert probed.count() < spark.read.parquet(path).count()
