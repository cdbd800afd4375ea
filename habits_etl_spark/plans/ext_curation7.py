"""Corpus/analytics operators, wave 10: vector-space outlier detection,
triangle structure in the similarity graph, and core decomposition of the
near-duplicate graph.

The three cover the "graph & geometry health" layer of a curation
pipeline: ext_embedding_outliers screens broken vectors BEFORE they
poison clustering/ANN stages; ext_knn_triangles measures how clique-like
the similarity neighborhoods are (dense triangles = tight semantic
clusters / template farms, triangle-free = chains of weak links); and
ext_kcore_dupgraph classifies each document by the densest subgraph it
survives in, the routing signal for aggressive-vs-gentle dedup policies.

Reference parity: the reference has no curation surface; these extend it
per the BASELINE north-star list, like plans/ext_pipeline.py.
Cross-engine float rule: decimal exact sums for anything aggregated
(plans/common.py rule 1); doubles that feed a comparison are rounded
first, and mean/variance are derived from decimal exact sums through the
SAME literal double expression in both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from habits_etl_spark.plans.common import query, t
from habits_etl_spark.plans.ext_curation6 import _KNN_K, _KNN_RANKED_CTE

# --- embedding outliers (diagonal Mahalanobis) -------------------------------

# Flag when the squared diagonal-Mahalanobis distance exceeds twice its
# expectation (E[md2] = n_dims for well-behaved vectors).
_OUT_FACTOR = 2


@query(
    "ext_embedding_outliers",
    f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    x AS (
      SELECT vec_id, label,
             unnest(list_transform(generate_series(1, len(v)),
                    i -> struct_pack(dim := i, val := v[i]))) AS u
      FROM e
    ),
    x2 AS (SELECT vec_id, label, u.dim AS dim, u.val AS val FROM x),
    st AS (
      SELECT label, dim,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(val AS DECIMAL(28,12))) AS sx,
             sum(CAST(val * val AS DECIMAL(28,12))) AS sxx
      FROM x2 GROUP BY 1, 2
    ),
    mv AS (
      SELECT label, dim,
             CAST(sx AS DOUBLE) / n AS m,
             CAST(sxx AS DOUBLE) / n
               - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) AS var
      FROM st
    ),
    z AS (
      SELECT x2.vec_id, x2.label,
             CASE WHEN mv.var > 0.0
                  THEN ((x2.val - mv.m) * (x2.val - mv.m)) / mv.var
                  ELSE 0.0 END AS z2
      FROM x2 JOIN mv ON x2.label = mv.label AND x2.dim = mv.dim
    )
    SELECT vec_id, label,
           CAST(count(*) AS BIGINT) AS n_dims,
           round(CAST(sum(CAST(z2 AS DECIMAL(28,12))) AS DOUBLE), 6) AS md2,
           round(CAST(sum(CAST(z2 AS DECIMAL(28,12))) AS DOUBLE), 6)
             > {_OUT_FACTOR}.0 * count(*) AS is_outlier
    FROM z GROUP BY 1, 2 ORDER BY vec_id
    """,
)
def ext_embedding_outliers(spark, sf_dir):
    """Per-vector outlier score in embedding space: the squared
    diagonal-Mahalanobis distance of each vector from its label
    population (per-label, per-dimension mean/variance), flagged when it
    exceeds twice the expected value of n_dims. This is the vector-
    quality screen a pipeline runs BEFORE SemDeDup/kNN stages — zeroed,
    clipped, or wrong-scale embeddings land at extreme md2 and would
    otherwise poison centroids and neighbor lists.

    Scale: the long-form explode is map-side; the (label, dim) moment
    table is label×dim-bounded (640 rows here), broadcast back into a
    second map stage; the per-vector reduce is one hash-agg keyed by
    vec_id. Nothing quadratic, no windows. Mean/variance come from
    decimal exact sums pushed through the SAME literal double expression
    in both engines, z² re-sums in decimal, and the outlier flag
    compares the ROUNDED md2 — engine-identical end to end."""
    e = t(spark, sf_dir, "embeddings")
    x = e.select(
        "vec_id",
        "label",
        F.posexplode(
            F.transform("embedding", lambda c: c.cast("double"))
        ).alias("dim0", "val"),
    ).select("vec_id", "label", (F.col("dim0") + 1).alias("dim"), "val")
    st = x.groupBy("label", "dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("val").cast("decimal(28,12)")).alias("sx"),
        F.sum((F.col("val") * F.col("val")).cast("decimal(28,12)")).alias("sxx"),
    )
    m = F.col("sx").cast("double") / F.col("n")
    mv = st.select(
        "label",
        "dim",
        m.alias("m"),
        (F.col("sxx").cast("double") / F.col("n") - m * m).alias("var"),
    )
    z2 = F.when(
        F.col("var") > 0.0,
        ((F.col("val") - F.col("m")) * (F.col("val") - F.col("m"))) / F.col("var"),
    ).otherwise(F.lit(0.0))
    md2 = F.round(F.sum(F.col("z2").cast("decimal(28,12)")).cast("double"), 6)
    return (
        x.join(F.broadcast(mv), ["label", "dim"])
        .select("vec_id", "label", z2.alias("z2"))
        .groupBy("vec_id", "label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dims"),
            md2.alias("md2"),
            (md2 > _OUT_FACTOR * F.count(F.lit(1))).alias("is_outlier"),
        )
        .orderBy("vec_id")
    )


# --- triangles in the mutual-kNN graph ---------------------------------------


@query(
    "ext_knn_triangles",
    f"""
    WITH {_KNN_RANKED_CTE},
    knn AS (SELECT src_id, nbr_id FROM ranked WHERE rk <= {_KNN_K}),
    mutual AS (
      SELECT a.src_id AS a, a.nbr_id AS b
      FROM knn a JOIN knn b ON b.src_id = a.nbr_id AND b.nbr_id = a.src_id
      WHERE a.src_id < a.nbr_id
    )
    SELECT m1.a AS vec_a, m1.b AS vec_b, m2.b AS vec_c
    FROM mutual m1
    JOIN mutual m2 ON m2.a = m1.b
    JOIN mutual m3 ON m3.a = m1.a AND m3.b = m2.b
    ORDER BY vec_a, vec_b, vec_c
    """,
)
def ext_knn_triangles(spark, sf_dir):
    """Triangles in the MUTUAL kNN graph (edges kept only when both
    endpoints list each other in their top-{k}): each output row is one
    (a < b < c) triangle. Triangle density over mutual-kNN edges is the
    classic tightness signal — template farms and boilerplate clusters
    close their triangles, topical chains don't — and feeds the same
    routing decisions as coreness below.

    Scale: mutual-filtering first is the whole trick — it needs one
    self-join of the k·|V|-row kNN list (k rows per vector, NOT the
    corpus), and the canonical a<b orientation halves it. The triangle
    enumeration is then two joins of that mutual edge list against
    itself; with edges hash-partitioned by key and max-degree bounded by
    k, candidate fan-out per edge is ≤ k, so the join output is O(k·|E|)
    — never a corpus-sized product. (Same plan MapReduce triangle
    counting uses post node-ordering.)"""
    from habits_etl_spark.plans.ext_curation6 import ext_knn_graph_blocked

    knn = ext_knn_graph_blocked(spark, sf_dir).select("src_id", "nbr_id")
    rev = knn.select(
        F.col("src_id").alias("r_src"), F.col("nbr_id").alias("r_nbr")
    )
    mutual = (
        knn.join(
            rev,
            (F.col("r_src") == F.col("nbr_id")) & (F.col("r_nbr") == F.col("src_id")),
        )
        .filter(F.col("src_id") < F.col("nbr_id"))
        .select(F.col("src_id").alias("a"), F.col("nbr_id").alias("b"))
    )
    m1 = mutual
    m2 = mutual.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    m3 = mutual.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    return (
        m1.join(m2, F.col("b") == F.col("b2"))
        .join(m3, (F.col("a3") == F.col("a")) & (F.col("c3") == F.col("c")))
        .select(
            F.col("a").alias("vec_a"),
            F.col("b").alias("vec_b"),
            F.col("c").alias("vec_c"),
        )
        .orderBy("vec_a", "vec_b", "vec_c")
    )


# --- coreness of the near-dup graph ------------------------------------------


@query("ext_kcore_dupgraph")  # no oracle: iterative fixpoint (like ext_pagerank_dupgraph)
def ext_kcore_dupgraph(spark, sf_dir):
    """Coreness of every document in the MinHash near-duplicate candidate
    graph (operators/kcore.py): the largest k for which the doc survives
    iterated removal of degree-<k nodes. Dense boilerplate cores keep
    high coreness after peeling; thin re-post chains collapse to 1 — the
    routing signal for aggressive-vs-gentle dedup, complementing
    ext_pagerank_dupgraph's within-neighborhood ranking.

    rows-only driver check; exact semantics pinned in tests/test_kcore.py
    against a Python peeling reference."""
    from habits_etl_spark.operators.kcore import coreness
    from habits_etl_spark.plans.ext_text import ext_near_dedup_minhash

    docs = t(spark, sf_dir, "documents").select(F.col("doc_id").alias("node"))
    pairs = ext_near_dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    sym = pairs.selectExpr("doc_a AS src", "doc_b AS dst").union(
        pairs.selectExpr("doc_b AS src", "doc_a AS dst")
    )
    return (
        coreness(docs, sym)
        .select(F.col("node").alias("doc_id"), "coreness")
        .orderBy(F.col("coreness").desc(), "doc_id")
    )
