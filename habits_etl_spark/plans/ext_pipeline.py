"""Pipeline-composition operators: the end-to-end decisions a training-data
pipeline actually ships — which doc to KEEP per duplicate cluster, cluster
structure over embedding near-dups, and per-doc salient terms (TF-IDF).

These compose the primitives in ext_text / ext_vectors / operators.clusters
into the deliverable artifacts (keep lists, cluster maps, term profiles),
each with a DuckDB oracle so the composition — not just the parts — is
verified. Reference parity: the reference has no dedup surface at all;
these extend it per the BASELINE north-star list (dedup / similarity /
text analysis as first-class engine ops).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from habits_etl_spark.operators.clusters import connected_components
from habits_etl_spark.plans.common import query, t
from habits_etl_spark.plans.ext_text import _MINHASH_CTES, _MINHASH_FINAL, _TOK_DUCK
from habits_etl_spark.plans.ext_vectors import (
    _EXACT_PAIRS_CTE,
    _EXACT_PAIRS_FINAL,
    _prepped_embeddings,
    _pair_arms,
    _cosine_pairs_from,
)


def _cc_sql(src: str, dst: str) -> str:
    """Recursive-CTE connected components over a ``pairs`` CTE: every
    vertex collects all reachable labels; min(label) is the canonical
    (minimum) member id. Quadratic closure — fine as an oracle over
    collision-scale pair sets; the Spark side uses the O(log n) label
    propagation in operators/clusters.py."""
    return f"""edges AS (
      SELECT {src} AS u, {dst} AS v FROM pairs
      UNION
      SELECT {dst} AS u, {src} AS v FROM pairs
    ),
    walk AS (
      SELECT u, u AS label FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.v AS u, w.label FROM walk w JOIN edges e ON e.u = w.u
    ),
    comp AS (SELECT u, min(label) AS cluster_id FROM walk GROUP BY u)"""


@query(
    "ext_dedup_keep_policy",
    f"""
    WITH RECURSIVE {_MINHASH_CTES},
    pairs AS ({_MINHASH_FINAL}),
    {_cc_sql("doc_a", "doc_b")},
    all_docs AS (
      SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id, d.n_chars
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.u
    ),
    ranked AS (
      SELECT doc_id, cluster_id,
             row_number() OVER (PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS rk
      FROM all_docs
    )
    SELECT doc_id, cluster_id, rk = 1 AS keep FROM ranked ORDER BY doc_id
    """,
)
def ext_dedup_keep_policy(spark, sf_dir):
    """The dedup DECISION (what a pipeline actually emits): every document
    mapped to its duplicate cluster (own id when unclustered) with a keep
    flag — keep the longest member (n_chars), ties to the smallest doc_id.

    Composition: MinHash pair graph -> connected components -> left join
    corpus -> per-cluster ranking window. Scale: the window partitions by
    cluster_id where almost every cluster is a singleton — one shuffle of
    (doc_id, cluster_id, n_chars), never the text."""
    from habits_etl_spark.plans.ext_text import ext_near_dedup_minhash

    d = t(spark, sf_dir, "documents")
    pairs = ext_near_dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    comps = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("cid")
    )
    all_docs = (
        d.select("doc_id", "n_chars")
        .join(comps, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce(F.col("cid"), F.col("doc_id")))
    )
    w = Window.partitionBy("cluster_id").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        all_docs.withColumn("rk", F.row_number().over(w))
        .select("doc_id", "cluster_id", (F.col("rk") == 1).alias("keep"))
        .orderBy("doc_id")
    )


@query(
    "ext_embedding_dup_clusters",
    f"""
    WITH RECURSIVE {_EXACT_PAIRS_CTE},
    pairs AS ({_EXACT_PAIRS_FINAL}),
    {_cc_sql("vec_a", "vec_b")}
    SELECT u AS vec_id, cluster_id FROM comp ORDER BY vec_id
    """,
)
def ext_embedding_dup_clusters(spark, sf_dir):
    """Connected components over the embedding-cosine near-dup graph — the
    vector-space twin of ext_dup_clusters (cosine pairs from the hybrid
    exact/LSH op feed the same O(log n) label propagation)."""
    prepped = _prepped_embeddings(spark, sf_dir)
    a, b = _pair_arms(prepped)
    pairs = _cosine_pairs_from(a.join(b, F.col("vec_a") < F.col("vec_b"))).select(
        "vec_a", "vec_b"
    )
    comps = connected_components(pairs, "vec_a", "vec_b")
    return comps.select(
        F.col("vertex").alias("vec_id"), F.col("component").alias("cluster_id")
    ).orderBy("vec_id")


_TFIDF_TOP_K = 3


@query(
    "ext_tfidf_topk",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOK_DUCK}) AS tok FROM documents
    ),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT t.doc_id, t.tok,
             round(t.tf * ln(CAST(n_docs AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf t JOIN df ON t.tok = df.tok CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, tok, tfidf,
             row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rk
      FROM scored
    )
    SELECT doc_id, tok, tfidf, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_TFIDF_TOP_K}
    """,
)
def ext_tfidf_topk(spark, sf_dir):
    """Per-document top-{_TFIDF_TOP_K} TF-IDF terms (text analysis /
    document profiling): tf = raw in-doc count, idf = ln(N/df), ranked on
    the ROUNDED score with a token tie-break so both engines cut the
    same top-k (plans/common.py rule 4).

    Scale: tf is a (doc, tok) hash agg with map-side partials; df is a
    token-keyed agg of the same explode; the tf<-df join shuffles on tok
    (df is vocabulary-sized — AQE broadcasts it when small); N is a
    broadcast scalar; the final window shuffles (doc, tok, score) only."""
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("tok").agg(F.count_distinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "tok")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _TFIDF_TOP_K)
        .select("doc_id", "tok", "tfidf", "rk")
    )
