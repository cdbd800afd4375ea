"""Embedding similarity operators over ``embeddings(vec_id, embedding
float[64], label)`` (SURVEY §2.12 ext_topk_sim_search; BASELINE
north-star 'similarity search').

The kernels are pure SQL expressions — ``zip_with`` + ``aggregate`` fold
for the dot product — so they run JVM-side in codegen, no Python. Math is
done in float64 after casting the float32 arrays up, and scores are
rounded to 4 decimals before any ordering so the Spark and DuckDB top-k
cuts agree.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from habits_etl_spark.plans.common import query, t

_TOP_K = 5
_N_QUERIES = 10  # vec_id < 10 are the query vectors
_COS_THRESHOLD = 0.4


def dot_expr(a: Column, b: Column) -> Column:
    """Sum_i a[i]*b[i] in float64 (left-to-right fold)."""
    prod = F.zip_with(
        F.transform(a, lambda x: x.cast("double")),
        F.transform(b, lambda x: x.cast("double")),
        lambda x, y: x * y,
    )
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


_SQL_COS = (
    "list_dot_product(a.v, b.v)"
    " / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
)


@query(
    "ext_topk_sim_search",
    f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, b.label AS neighbor_label,
             round({_SQL_COS}, 4) AS cos
      FROM e a JOIN e b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {_N_QUERIES}
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
      FROM scored
    )
    SELECT query_id, neighbor_id, neighbor_label, cos, rk FROM ranked WHERE rk <= {_TOP_K}
    """,
)
def ext_topk_sim_search(spark, sf_dir):
    """Brute-force cosine top-k (the exact baseline; SURVEY §2.12): the
    {_N_QUERIES} query vectors are broadcast against the corpus, scored
    JVM-side, and cut with a per-query row_number.

    Scale: the broadcast-queries × corpus-scan shape is the right 100 TB
    baseline (queries are small; the corpus never shuffles — only
    (query × corpus) partial top-k results do, via WindowGroupLimit /
    TakeOrdered). The sub-linear path is ext_ann_lsh_bucketed below."""
    e = t(spark, sf_dir, "embeddings")
    # Normalize ONCE per vector (cast to float64 + L2 norm) — computing the
    # norm inside the pair expression would redo it per candidate pair,
    # turning an O(N + Q·N) kernel into O(3·Q·N) folds.
    prepped = e.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn("nrm", F.sqrt(F.aggregate(
        F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )))
    q = prepped.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("q_v"),
        F.col("nrm").alias("q_nrm"),
    )
    corpus = prepped.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("v").alias("c_v"),
        F.col("nrm").alias("c_nrm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("q_v"), F.col("c_v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        corpus.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            F.round(dot / (F.col("q_nrm") * F.col("c_nrm")), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _TOP_K)
    )


@query(
    "ext_embedding_cosine_pairs",
    f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           a.label AS label_a, b.label AS label_b,
           round({_SQL_COS}, 4) AS cos
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE {_SQL_COS} >= {_COS_THRESHOLD}
    """,
)
def ext_embedding_cosine_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (BASELINE north-star
    'embedding-cosine near-dup'): all pairs above a cosine threshold.
    Exact quadratic baseline at test scale; at 100 TB the LSH-bucketed
    variant below prunes the pair space first."""
    e = t(spark, sf_dir, "embeddings")
    prepped = e.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn("nrm", F.sqrt(F.aggregate(
        F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )))
    a = prepped.select(
        F.col("vec_id").alias("vec_a"), F.col("label").alias("label_a"),
        F.col("v").alias("v_a"), F.col("nrm").alias("n_a"),
    )
    b = prepped.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("label_b"),
        F.col("v").alias("v_b"), F.col("nrm").alias("n_b"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("v_a"), F.col("v_b"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("n_a") * F.col("n_b"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .filter(cos >= _COS_THRESHOLD)
        .select("vec_a", "vec_b", "label_a", "label_b", F.round(cos, 4).alias("cos"))
    )


@query("ext_ann_ivf_probe")  # rows-only check: approximate by design
def ext_ann_ivf_probe(spark, sf_dir):
    """IVF-style ANN (SURVEY §2.12 'an IVF or LSH-bucketed variant'):

    1. pick deterministic coarse centroids (every k-th corpus vector — a
       one-pass stand-in for a k-means fit, which at 100 TB would be a
       sampled offline job);
    2. assign every corpus vector to its nearest centroid (broadcast
       centroids x corpus scan — one pass);
    3. probe: each query searches only the ``n_probe`` closest centroids'
       inverted lists, then exact cosine re-rank inside them.

    Scale: the corpus scans once for assignment; query cost drops from
    O(N) to O(N * n_probe / n_cells). Approximate (cell misses possible),
    hence rows-only; recall vs exact is asserted in tests/test_vectors.py."""
    n_cells = 16
    n_probe = 4
    e = t(spark, sf_dir, "embeddings")
    prepped = e.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn("nrm", F.sqrt(F.aggregate(
        F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )))

    total = prepped.count()  # bounded metadata read (one count of the corpus)
    step = max(total // n_cells, 1)
    centroids = prepped.filter((F.col("vec_id") % step == 0) & (F.col("vec_id") / step < n_cells)).select(
        (F.col("vec_id") / step).cast("int").alias("cell_id"),
        F.col("v").alias("c_v"),
        F.col("nrm").alias("c_nrm"),
    )

    dot_vc = F.aggregate(
        F.zip_with(F.col("v"), F.col("c_v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sim_to_centroid = dot_vc / (F.col("nrm") * F.col("c_nrm"))
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("__sim").desc(), F.col("cell_id"))
    assigned = (
        prepped.crossJoin(F.broadcast(centroids))
        .withColumn("__sim", sim_to_centroid)
        .withColumn("__rk", F.row_number().over(w_assign))
        .filter(F.col("__rk") == 1)
        .select("vec_id", "label", "v", "nrm", "cell_id")
    )

    queries_assigned = (
        assigned.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("q_v"), F.col("nrm").alias("q_nrm"))
        .crossJoin(F.broadcast(centroids))
        .withColumn(
            "__sim",
            F.aggregate(
                F.zip_with(F.col("q_v"), F.col("c_v"), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ) / (F.col("q_nrm") * F.col("c_nrm")),
        )
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("__sim").desc(), F.col("cell_id"))
            ),
        )
        .filter(F.col("__rk") <= n_probe)
        .select("query_id", "q_v", "q_nrm", "cell_id")
    )

    dot_qc = F.aggregate(
        F.zip_with(F.col("q_v"), F.col("v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        assigned.join(F.broadcast(queries_assigned), "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot_qc / (F.col("q_nrm") * F.col("nrm")), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w).cast("bigint")).filter(
        F.col("rk") <= _TOP_K
    )


@query("ext_ann_lsh_bucketed")  # rows-only check: approximate by design
def ext_ann_lsh_bucketed(spark, sf_dir):
    """Sub-linear ANN path (SURVEY §2.12 'IVF or LSH-bucketed variant'):
    sign-random-projection LSH. Each vector gets a b-bit signature from
    deterministic pseudo-hyperplanes (hash-derived ±1 components, so the
    planes need no driver-side state and the whole thing is one
    expression); candidates = same-bucket pairs vs the query set, then
    exact cosine re-rank inside buckets.

    Scale: corpus scan emits (bucket, vec) once; only bucket-collision
    pairs are scored — at 1000 executors the bucket join replaces the
    full cross product. Approximate (bucket misses are possible), hence
    rows-only driver check; recall is asserted against the exact top-k in
    tests/test_vectors.py."""
    n_bits = 12
    e = t(spark, sf_dir, "embeddings")

    def signature(emb: Column) -> Column:
        # bit j = sign of dot(v, h_j) where h_j[i] = +1/-1 from a hash of (j, i)
        bits = []
        for j in range(n_bits):
            proj = F.aggregate(
                F.zip_with(
                    F.transform(emb, lambda x: x.cast("double")),
                    F.transform(
                        F.sequence(F.lit(0), F.lit(63)),
                        lambda i: F.when(
                            F.crc32(F.concat_ws(":", F.lit(str(j)), i.cast("string"))) % 2 == 0,
                            F.lit(1.0),
                        ).otherwise(F.lit(-1.0)),
                    ),
                    lambda x, h: x * h,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**j))
        return sum(bits[1:], bits[0])

    sig = e.select("vec_id", "label", "embedding", signature(F.col("embedding")).alias("bucket"))
    q = sig.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    cand = sig.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine_expr(F.col("q_emb"), F.col("embedding")), 4).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w).cast("bigint")).filter(
        F.col("rk") <= _TOP_K
    )
