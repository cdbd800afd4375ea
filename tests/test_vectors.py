"""Vector-operator tests: exact kernel sanity + LSH recall vs exact top-k."""

from __future__ import annotations

from pyspark.sql import functions as F

from habits_etl_spark.plans.ext_vectors import cosine_expr, dot_expr


def test_dot_and_cosine_kernels(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]), ([1.0, 0.0, 0.0], [1.0, 0.0, 0.0])],
        "a array<double>, b array<double>",
    )
    rows = df.select(
        dot_expr(F.col("a"), F.col("b")).alias("dot"),
        F.round(cosine_expr(F.col("a"), F.col("b")), 6).alias("cos"),
    ).collect()
    assert rows[0].dot == 32.0
    assert abs(rows[0].cos - 0.974632) < 1e-6
    assert rows[1].cos == 1.0


def test_planes_are_pairwise_independent():
    """The r10-r11 planes took sign bits from crc32 PARITY — but CRC is
    GF(2)-linear, so within a digit-length class of plane indices every
    pair of planes was equal or complementary (up to the two
    i-digit-length blocks). 128 'independent' planes collapsed to ~6
    effective projections and 4 observed band values per 8-bit band (64
    distinct buckets across a 500-vector corpus): the SRP s-curve the
    recall math assumes was never in effect, and changing band_bits was
    a measurable no-op. md5-derived planes must be pairwise distinct,
    non-complementary, and sign-balanced."""
    from habits_etl_spark.plans.ext_vectors import _DIM, _plane_signs

    keys = [f"pairs:{p}" for p in range(128)] + [f"ann:{p}" for p in range(128)]
    seen: dict[tuple, str] = {}
    for k in keys:
        pl = tuple(_plane_signs(k))
        comp = tuple(-x for x in pl)
        assert pl not in seen, f"{k} duplicates plane {seen[pl]}"
        assert comp not in seen, f"{k} is the complement of {seen[comp]}"
        seen[pl] = k
        # sign balance: |sum| over 64 +-1 draws is ~N(0, 8); 40 = 5 sigma
        assert abs(sum(pl)) < 40, f"{k} is sign-degenerate: {sum(pl)}"


def test_band_space_is_actually_used(spark, sf_dir):
    """Regression for the crc32 degeneracy one level up: on the real
    fixture the 16x8-bit pair banding must spread the corpus over far
    more than the ~4 values/band the linear planes produced. With
    independent planes a 500-vector corpus fills most of each band's 256
    values."""
    from habits_etl_spark.plans.ext_vectors import (
        _PAIR_BAND_BITS,
        _PAIR_BANDS,
        _band_vals_from_proj,
        _prepped_embeddings,
        _proj_array_expr,
    )

    p = _prepped_embeddings(spark, sf_dir)
    keys = [f"pairs:{i}" for i in range(_PAIR_BANDS * _PAIR_BAND_BITS)]
    proj = p.select("vec_id", _proj_array_expr("v", keys).alias("pj"))
    bands = _band_vals_from_proj("pj", _PAIR_BANDS, _PAIR_BAND_BITS)
    n_buckets = (
        proj.select(
            F.explode(
                F.array(*[
                    F.struct(F.lit(i).alias("bi"), bv.alias("bv"))
                    for i, bv in enumerate(bands)
                ])
            ).alias("b")
        )
        .select("b.bi", "b.bv")
        .distinct()
        .count()
    )
    # 500 vectors x 16 bands: degenerate planes gave 64 buckets total;
    # independent planes give thousands (most of 16 x min(500, 256)).
    assert n_buckets > 1000, f"band space collapsed again: {n_buckets} buckets"


def test_lsh_recall_vs_exact(spark, sf_dir):
    """The LSH-bucketed ANN must recover a reasonable fraction of the exact
    top-5 neighbors (it's approximate by design; the driver records a
    rows-only check, recall is asserted here)."""
    from habits_etl_spark.plans import QUERIES

    exact = QUERIES["ext_topk_sim_search"](spark, sf_dir).collect()
    approx = QUERIES["ext_ann_lsh_bucketed"](spark, sf_dir).collect()
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact}
    approx_pairs = {(r.query_id, r.neighbor_id) for r in approx}
    # every approx hit must be a real neighbor pair with correctly computed
    # cosine; recall target is modest because the fixture's exact top-5
    # neighbors are WEAK (cos 0.26-0.39, median 0.31) — the 32x8 banding
    # s-curve predicts ~0.42 at the median, measured 0.30 (r12, the first
    # measurement with genuinely independent planes)
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.2, f"LSH recall collapsed: {recall}"
    ex_cos = {(r.query_id, r.neighbor_id): r.cos for r in exact}
    for r in approx:
        if (r.query_id, r.neighbor_id) in ex_cos:
            assert abs(ex_cos[(r.query_id, r.neighbor_id)] - r.cos) < 1e-9


def test_cosine_pairs_lsh_is_verified_subset(spark, sf_dir):
    """The banded-LSH pairs path must emit ONLY true pairs (precision 1.0,
    because candidates are exact-verified) with exactly-matching cosines;
    recall follows the SRP s-curve (deterministic planes => a fixed value
    on this fixture). The crc32-era "measured 0.48" was an artifact of
    the degenerate planes (the effective ~4-bit buckets scanned ~30% of
    the corpus — brute force in disguise); with independent md5 planes
    the honest 16x8 s-curve at this fixture's weak pair cosines
    (0.4-0.6) predicts ~0.33 and measures 0.26 at sf0.001."""
    from habits_etl_spark.plans import QUERIES

    exact = {
        (r.vec_a, r.vec_b): r.cos
        for r in QUERIES["ext_embedding_cosine_pairs"](spark, sf_dir).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b): r.cos
        for r in QUERIES["ext_cosine_pairs_lsh"](spark, sf_dir).collect()
    }
    assert set(lsh) <= set(exact), "LSH emitted a pair the exact op did not"
    for k, cos in lsh.items():
        assert abs(exact[k] - cos) < 1e-9
    recall = len(lsh) / len(exact)
    assert recall >= 0.15, f"LSH pair recall collapsed: {recall}"


def test_blocked_matmul_pairs_equal_expression_join(spark, sf_dir):
    """The r12 block-matmul exact-pairs path must reproduce the old
    arm-join + fold-dot form VALUE-FOR-VALUE (the oracle hash gate
    asserts this against DuckDB; this pins the Spark-vs-Spark
    refactor directly, including the rounded cosines)."""
    from habits_etl_spark.plans.ext_vectors import (
        _cosine_pairs_from,
        _exact_pairs_blocked,
        _pair_arms,
        _prepped_embeddings,
    )

    p = _prepped_embeddings(spark, sf_dir)
    a, b = _pair_arms(p)
    old = {
        (r.vec_a, r.vec_b): (r.label_a, r.label_b, r.cos)
        for r in _cosine_pairs_from(a.join(b, F.col("vec_a") < F.col("vec_b"))).collect()
    }
    new = {
        (r.vec_a, r.vec_b): (r.label_a, r.label_b, r.cos)
        for r in _exact_pairs_blocked(spark, p).collect()
    }
    assert old == new


def test_numpy_and_expression_bands_agree(spark, sf_dir):
    """The Arrow/numpy band path (_banded_rows) must produce EXACTLY the
    (vec_id, band_idx, band_val) relation the pure-expression reference
    path does — numpy's pairwise summation vs the sequential fold can
    only disagree where a projection sits within ~1e-13 of zero, and the
    margin assertion below shows this fixture is nowhere near that knife
    edge (the documented ICWS-tie residual class)."""
    import numpy as np

    from habits_etl_spark.plans.ext_vectors import (
        _band_vals_from_proj,
        _banded_rows,
        _plane_signs,
        _prepped_embeddings,
        _proj_array_expr,
    )

    p = _prepped_embeddings(spark, sf_dir)
    got = {
        (r.vec_id, r.band_idx, r.band_val)
        for r in _banded_rows(p, "pairs", 16, 8).collect()
    }
    keys = [f"pairs:{i}" for i in range(128)]
    proj = p.select("vec_id", _proj_array_expr("v", keys).alias("pj"))
    bands = _band_vals_from_proj("pj", 16, 8)
    want = set()
    for r in proj.select(
        "vec_id", *[bv.alias(f"b{i}") for i, bv in enumerate(bands)]
    ).collect():
        for i in range(16):
            want.add((r.vec_id, i, r[f"b{i}"]))
    assert got == want

    # sign-flip margin: the smallest |projection| across the corpus must
    # dwarf double-summation noise (~1e-13 on O(1) folds)
    V = np.vstack([r.v for r in p.select("v").collect()])
    M = np.array([_plane_signs(k) for k in keys]).T
    margin = np.abs(V @ M).min()
    assert margin > 1e-9, f"projection margin too thin: {margin}"


def test_scale_tuned_banding_cuts_candidates_and_keeps_precision(spark, sf_dir):
    """The banding law (band_bits ~ log2 n, _lsh_candidate_pairs): wider
    band keys must cut the candidate budget ~2^extra_bits on noise-level
    collisions (measured 12x at 8->12 bits on this fixture, at BOTH
    sf0.001 and sf0.1 — it is a property of the key space, not the
    corpus), while the exact verify keeps precision 1.0 at any
    parameterization. This is the knob a 10x-larger corpus turns instead
    of accepting n^2/2^bits candidate growth."""
    from habits_etl_spark.plans import QUERIES
    from habits_etl_spark.plans.ext_vectors import (
        _lsh_candidate_pairs,
        _prepped_embeddings,
        scale_tuned_cosine_pairs,
    )

    p = _prepped_embeddings(spark, sf_dir)
    cand8 = _lsh_candidate_pairs(p, 16, 8).count()
    cand12 = _lsh_candidate_pairs(p, 16, 12).count()
    assert cand12 * 4 < cand8, f"wider bands did not cut candidates: {cand8} -> {cand12}"

    exact = {
        (r.vec_a, r.vec_b): r.cos
        for r in QUERIES["ext_embedding_cosine_pairs"](spark, sf_dir).collect()
    }
    tuned = {
        (r.vec_a, r.vec_b): r.cos
        for r in scale_tuned_cosine_pairs(spark, sf_dir, band_bits=12).collect()
    }
    assert set(tuned) <= set(exact), "scale-tuned LSH emitted a non-pair"
    for k, cos in tuned.items():
        assert abs(exact[k] - cos) < 1e-9


def test_exact_pairs_gate_refuses_past_max(spark, sf_dir, monkeypatch):
    """_EXACT_PAIRS_MAX refusal contract (r13, VERDICT r12 #6): the
    driver-side corpus collect inside _exact_pairs_blocked is safe ONLY
    while the gate holds, and since r13 the gate lives INSIDE the helper
    so every caller — ext_embedding_cosine_pairs AND the
    ext_embedding_dup_clusters path in ext_pipeline (ADVICE r12 medium)
    — inherits it. Above the gate the documented refusal must fire
    BEFORE any collect, naming the LSH scale path; at/below the gate the
    helper serves. The LSH id itself must keep serving a corpus the
    exact op refuses."""
    import pytest

    from habits_etl_spark.plans import ext_vectors
    from habits_etl_spark.plans.ext_pipeline import ext_embedding_dup_clusters
    from habits_etl_spark.plans.ext_vectors import (
        _exact_pairs_blocked,
        _prepped_embeddings,
        ext_cosine_pairs_lsh,
        ext_embedding_cosine_pairs,
    )

    p = _prepped_embeddings(spark, sf_dir)
    n = p.count()
    assert n > 1  # fixture sanity

    monkeypatch.setattr(ext_vectors, "_EXACT_PAIRS_MAX", n - 1)
    with pytest.raises(ValueError, match="ext_cosine_pairs_lsh"):
        _exact_pairs_blocked(spark, p)
    with pytest.raises(ValueError, match="_EXACT_PAIRS_MAX"):
        ext_embedding_cosine_pairs(spark, sf_dir)
    # the cluster path (ext_pipeline) must inherit the same refusal —
    # pre-r13 it collected unconditionally (ADVICE r12 medium)
    with pytest.raises(ValueError, match="ext_cosine_pairs_lsh"):
        ext_embedding_dup_clusters(spark, sf_dir).collect()
    # the honest-approximate scale path still serves the same corpus
    assert ext_cosine_pairs_lsh(spark, sf_dir).count() >= 0

    monkeypatch.setattr(ext_vectors, "_EXACT_PAIRS_MAX", n)
    assert _exact_pairs_blocked(spark, p).count() > 0


def test_exact_pairs_empty_corpus_returns_empty(spark):
    """ADVICE r12: np.vstack on a zero-row corpus raised ValueError where
    the old join form returned empty — the helper must short-circuit to
    an empty DataFrame with the contract schema."""
    from habits_etl_spark.plans.ext_vectors import _exact_pairs_blocked

    empty = spark.createDataFrame(
        [], "vec_id long, label string, v array<double>, nrm double"
    )
    out = _exact_pairs_blocked(spark, empty)
    assert out.count() == 0
    assert out.columns == ["vec_a", "vec_b", "label_a", "label_b", "cos"]


def test_exact_pairs_broadcast_is_memoized(spark, sf_dir):
    """ADVICE r12: the corpus broadcast must be reused across invocations
    on the same corpus (one handle per distinct corpus per session), not
    leaked one-per-call."""
    from habits_etl_spark.plans import ext_vectors
    from habits_etl_spark.plans.ext_vectors import (
        _exact_pairs_blocked,
        _prepped_embeddings,
    )

    p = _prepped_embeddings(spark, sf_dir)
    _exact_pairs_blocked(spark, p).count()
    before = len(ext_vectors._PAIRS_BCAST_MEMO)
    _exact_pairs_blocked(spark, p).count()
    assert len(ext_vectors._PAIRS_BCAST_MEMO) == before
