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


def test_plane_signs_match_spark_crc32(spark):
    """_plane_signs derives the literal LSH hyperplanes with zlib.crc32;
    they must equal what the pre-r10 runtime F.crc32 expressions
    constant-folded to, or every SRP bucket silently changes. Pins the
    zlib/Spark crc32 bit-equality over the exact key format."""
    from habits_etl_spark.plans.ext_vectors import _DIM, _plane_signs

    keys = ["pairs:0", "pairs:127", "7"]
    want = {k: _plane_signs(k) for k in keys}
    cols = [
        F.when(
            F.crc32(F.concat_ws(":", F.lit(k), F.lit(str(i))).cast("binary")) % 2 == 0,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0)).alias(f"k{ki}_{i}")
        for ki, k in enumerate(keys)
        for i in (0, 1, 31, _DIM - 1)
    ]
    row = spark.range(1).select(*cols).collect()[0]
    for ki, k in enumerate(keys):
        for i in (0, 1, 31, _DIM - 1):
            assert row[f"k{ki}_{i}"] == want[k][i], (k, i)


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
    # cosine; recall target is modest at 12 bits on random-ish vectors
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
    on this fixture; ~0.33 predicted at the 0.4 threshold, measured 0.48)."""
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
    assert recall >= 0.4, f"LSH pair recall collapsed: {recall}"
