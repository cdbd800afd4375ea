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
from habits_etl_spark.plans.ext_text import (
    _LANG_PROFILES,
    _MINHASH_CTES,
    _MINHASH_FINAL,
    _QUALITY_INPUTS_DUCK,
    _QUALITY_SQL,
    _TOK_DUCK,
    _TOK_SPARK,
    _lang_score_duck,
    _lang_score_spark,
    pii_scrub_expr,
    pii_scrub_sql,
)
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
    from habits_etl_spark.plans.ext_text import minhash_pairs_shared

    d = t(spark, sf_dir, "documents")
    pairs = minhash_pairs_shared(spark, sf_dir)
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
    vector-space twin of ext_dup_clusters (exact cosine pairs feed the
    same O(log n) label propagation). Pairs come from the r12 block-
    matmul path (_exact_pairs_blocked) — same values, ~20x less pair-dot
    cost than the old HOF expression join; its _EXACT_PAIRS_MAX-bounded
    broadcast contract applies here too (past the bound, cluster over
    ext_cosine_pairs_lsh instead)."""
    from habits_etl_spark.plans.ext_vectors import _exact_pairs_blocked

    prepped = _prepped_embeddings(spark, sf_dir)
    # parquet-metadata count of the underlying table: the gate inside
    # _exact_pairs_blocked needs n but must not pay a full job for it
    n = t(spark, sf_dir, "embeddings").count()
    pairs = _exact_pairs_blocked(spark, prepped, n=n).select("vec_a", "vec_b")
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


# --- Incremental-ingest dedup -------------------------------------------
# A deterministic batch split stands in for "yesterday's corpus" vs
# "today's crawl": doc_id % 10 >= 8 is the incoming 20%.
_INCOMING = "doc_id % 10 >= 8"


@query(
    "ext_incremental_dedup",
    f"""
    WITH {_MINHASH_CTES},
    pairs AS ({_MINHASH_FINAL}),
    incoming AS (SELECT doc_id, md5(text) AS h FROM documents WHERE {_INCOMING}),
    existing AS (SELECT doc_id, md5(text) AS h FROM documents WHERE NOT ({_INCOMING})),
    exact_hit AS (
      SELECT DISTINCT i.doc_id FROM incoming i JOIN existing e ON i.h = e.h
    ),
    near_hit AS (
      SELECT DISTINCT CASE WHEN p.doc_a % 10 >= 8 THEN p.doc_a ELSE p.doc_b END AS doc_id
      FROM pairs p
      WHERE (p.doc_a % 10 >= 8) <> (p.doc_b % 10 >= 8)
    )
    SELECT i.doc_id,
           CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup'
                WHEN nr.doc_id IS NOT NULL THEN 'near_dup'
                ELSE 'new' END AS status
    FROM incoming i
    LEFT JOIN exact_hit ex ON ex.doc_id = i.doc_id
    LEFT JOIN near_hit nr ON nr.doc_id = i.doc_id
    ORDER BY i.doc_id
    """,
)
def ext_incremental_dedup(spark, sf_dir):
    """Incremental-ingest dedup: classify each INCOMING document against
    the EXISTING corpus as exact_dup (content hash already present),
    near_dup (MinHash-verified cross-batch pair), or new — the decision an
    append-only crawl pipeline makes per batch. Intra-batch duplicates are
    the batch-level exact/near dedup ops' job; this op is the
    cross-batch gate.

    Scale: the exact check is a hash equi-join on md5(text) — the
    incoming side is batch-sized, so AQE broadcasts it against the corpus
    hash index. The near check reuses the banded MinHash pair pipeline
    (corpus touched by map stages only) and filters pairs to the
    incoming x existing frontier; at 100 TB the existing side's
    signatures/bands would be a precomputed, partitioned table rather
    than recomputed (noted in README), but the join topology is
    identical."""
    from habits_etl_spark.plans.ext_text import minhash_pairs_shared

    d = t(spark, sf_dir, "documents")
    is_incoming = (F.col("doc_id") % 10) >= 8
    incoming = d.filter(is_incoming).select("doc_id", F.md5("text").alias("h"))
    existing = d.filter(~is_incoming).select(
        F.col("doc_id").alias("e_id"), F.md5("text").alias("eh")
    )
    exact_hit = (
        incoming.join(existing, F.col("h") == F.col("eh"), "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_exact", F.lit(True))
    )
    pairs = minhash_pairs_shared(spark, sf_dir)
    cross = pairs.filter(
        ((F.col("doc_a") % 10) >= 8) != ((F.col("doc_b") % 10) >= 8)
    )
    near_hit = (
        cross.select(
            F.when((F.col("doc_a") % 10) >= 8, F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("doc_id")
        )
        .distinct()
        .withColumn("is_near", F.lit(True))
    )
    return (
        incoming.select("doc_id")
        .join(exact_hit, "doc_id", "left")
        .join(near_hit, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("is_exact"), F.lit("exact_dup"))
            .when(F.col("is_near"), F.lit("near_dup"))
            .otherwise(F.lit("new"))
            .alias("status"),
        )
        .orderBy("doc_id")
    )


# --- Quality-filter funnel ----------------------------------------------
_FUNNEL_MIN_CHARS = 100
_FUNNEL_MIN_TOKENS = 25
_FUNNEL_MIN_UNIQ = 0.35
_FUNNEL_MIN_STOP = 0.005


@query(
    "ext_quality_funnel",
    f"""
    WITH m AS (
      SELECT doc_id, n_chars,
             len({_TOK_DUCK}) AS n_tokens,
             CAST(len(list_distinct({_TOK_DUCK})) AS DOUBLE)
               / greatest(len({_TOK_DUCK}), 1) AS uniq_ratio,
             CAST({_lang_score_duck(_LANG_PROFILES['en'])} AS DOUBLE)
               / greatest(len({_TOK_DUCK}), 1) AS stop_ratio
      FROM documents
    )
    SELECT stage, CAST(count(*) AS BIGINT) AS n_docs
    FROM (
      SELECT CASE WHEN n_chars < {_FUNNEL_MIN_CHARS} THEN '1_reject_length'
                  WHEN n_tokens < {_FUNNEL_MIN_TOKENS} THEN '2_reject_tokens'
                  WHEN uniq_ratio < {_FUNNEL_MIN_UNIQ} THEN '3_reject_diversity'
                  WHEN stop_ratio < {_FUNNEL_MIN_STOP} THEN '4_reject_stopwords'
                  ELSE '5_pass' END AS stage
      FROM m
    )
    GROUP BY stage ORDER BY stage
    """,
)
def ext_quality_funnel(spark, sf_dir):
    """Quality-filter funnel observability: every document is attributed
    to the FIRST stage that rejects it (length -> token count -> lexical
    diversity -> stopword floor) or to the pass bucket — the per-stage
    rejection report a pretraining-data pipeline publishes with every
    batch so filter drift is visible.

    Scale: pure map stage (all ratios derived from one tokenization) into
    a 5-group hash agg with map-side partials — same cost class as a
    count(*). The stage predicates mirror ext_quality_score's components,
    so the funnel explains exactly what the score penalizes."""
    d = t(spark, sf_dir, "documents")
    toks = _TOK_SPARK(F.col("text"))
    n_tokens = F.size(toks)
    g = F.greatest(n_tokens, F.lit(1))
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / g
    stop_ratio = _lang_score_spark(toks, _LANG_PROFILES["en"]).cast("double") / g
    stage = (
        F.when(F.col("n_chars") < _FUNNEL_MIN_CHARS, F.lit("1_reject_length"))
        .when(n_tokens < _FUNNEL_MIN_TOKENS, F.lit("2_reject_tokens"))
        .when(uniq_ratio < _FUNNEL_MIN_UNIQ, F.lit("3_reject_diversity"))
        .when(stop_ratio < _FUNNEL_MIN_STOP, F.lit("4_reject_stopwords"))
        .otherwise(F.lit("5_pass"))
    )
    return (
        d.select(stage.alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("stage")
    )


@query(
    "ext_lang_quality_buckets",
    f"""
    WITH m AS (
      SELECT doc_id, lang, {_QUALITY_INPUTS_DUCK}
      FROM documents
    ),
    q AS (SELECT doc_id, lang, {_QUALITY_SQL} AS quality FROM m)
    SELECT doc_id, lang, quality,
           CASE ntile(3) OVER (PARTITION BY lang ORDER BY quality DESC, doc_id)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
    FROM q ORDER BY doc_id
    """,
)
def ext_lang_quality_buckets(spark, sf_dir):
    """CCNet-style per-language quality routing: within each language,
    rank documents by quality score and split into head / middle / tail
    terciles — the bucket layout CCNet uses to let downstream consumers
    trade volume against quality per language instead of with one global
    threshold (which would starve low-resource languages).

    Determinism: the score is rounded to 4 digits BEFORE ranking and ties
    break on doc_id, so both engines cut identical tercile boundaries.

    Scale: one map stage for the score; language is a FEW-LARGE-GROUPS
    key (a per-lang ntile window would pin each language's full doc
    sort on one task), so the terciles come from grouped exact
    selection (operators/distrank.py grouped_ntile_by_selection): the 2
    boundary (quality, doc_id) keys per language are selected in two
    k-bounded passes over the CACHED |docs|-row score table, and the
    bucket label is a pure map-side comparison — no window, no
    per-language sort, exact at any language skew. DESC quality is
    expressed by negating the (non-null) score, per distrank's
    ASC-keys rule."""
    from habits_etl_spark.operators.distrank import grouped_ntile_by_selection
    from habits_etl_spark.plans.common import managed_cache
    from habits_etl_spark.plans.ext_text import _quality_col

    d = t(spark, sf_dir, "documents")
    q = managed_cache(
        d.select("doc_id", "lang", _quality_col().alias("quality")),
        "ext_lang_quality_buckets/scores",
    )
    tiled = grouped_ntile_by_selection(
        q, ["lang"], [(-F.col("quality")).alias("nq"), F.col("doc_id")], 3, "__tile"
    )
    bucket = (
        F.when(F.col("__tile") == 1, F.lit("head"))
        .when(F.col("__tile") == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return tiled.select(
        "doc_id", "lang", "quality", bucket.alias("bucket")
    ).orderBy("doc_id")


# --- combined admission gate -------------------------------------------------

# PII scrub: shared single-source passes from ext_text (pii_scrub_expr /
# pii_scrub_sql) — a pattern fix there propagates to the admission gate.
_SCRUB_DUCK = pii_scrub_sql("text")
_scrub_spark = pii_scrub_expr


@query(
    "ext_admission_decision",
    f"""
    WITH RECURSIVE {_MINHASH_CTES},
    pairs AS ({_MINHASH_FINAL}),
    {_cc_sql("doc_a", "doc_b")},
    scrub AS (
      SELECT doc_id, lang, n_chars AS n_chars_orig, {_SCRUB_DUCK} AS text
      FROM documents
    ),
    m AS (
      SELECT doc_id, lang, n_chars_orig,
             length(text) AS n_chars_s,
             CAST(len({_TOK_DUCK}) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct({_TOK_DUCK})) AS BIGINT) AS n_unique,
             {_lang_score_duck(_LANG_PROFILES['en'])} AS n_stop
      FROM scrub
    ),
    q AS (
      SELECT doc_id, lang, n_chars_orig, {_QUALITY_SQL} AS quality,
             CASE WHEN n_chars_s < {_FUNNEL_MIN_CHARS} THEN 'quality_length'
                  WHEN n_tokens < {_FUNNEL_MIN_TOKENS} THEN 'quality_tokens'
                  WHEN CAST(n_unique AS DOUBLE) / greatest(n_tokens, 1)
                       < {_FUNNEL_MIN_UNIQ} THEN 'quality_diversity'
                  WHEN CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1)
                       < {_FUNNEL_MIN_STOP} THEN 'quality_stopwords'
                  END AS stage_q
      FROM m
    ),
    clusters_all AS (
      SELECT q.doc_id, coalesce(c.cluster_id, q.doc_id) AS cluster_id
      FROM q LEFT JOIN comp c ON q.doc_id = c.u
    ),
    surv AS (SELECT * FROM q WHERE stage_q IS NULL),
    buck AS (
      SELECT doc_id,
             CASE ntile(3) OVER (PARTITION BY lang ORDER BY quality DESC, doc_id)
                  WHEN 3 THEN 'lang_tail' END AS stage_b
      FROM surv
    ),
    bsurv AS (
      SELECT s.doc_id, s.n_chars_orig
      FROM surv s JOIN buck b ON s.doc_id = b.doc_id
      WHERE b.stage_b IS NULL
    ),
    ranked AS (
      SELECT bs.doc_id,
             row_number() OVER (PARTITION BY ca.cluster_id
                                ORDER BY bs.n_chars_orig DESC, bs.doc_id) AS rk
      FROM bsurv bs JOIN clusters_all ca ON bs.doc_id = ca.doc_id
    )
    SELECT q.doc_id,
           coalesce(q.stage_q, b.stage_b,
                    CASE WHEN r.rk > 1 THEN 'duplicate' END) IS NULL AS admitted,
           coalesce(q.stage_q, b.stage_b,
                    CASE WHEN r.rk > 1 THEN 'duplicate' END) AS rejecting_stage,
           ca.cluster_id
    FROM q
    LEFT JOIN buck b ON q.doc_id = b.doc_id
    LEFT JOIN ranked r ON q.doc_id = r.doc_id
    JOIN clusters_all ca ON q.doc_id = ca.doc_id
    ORDER BY q.doc_id
    """,
)
def ext_admission_decision(spark, sf_dir):
    """Doc-level combined admission gate — the artifact a 100 TB curation
    run actually ships: one row per document with (admitted,
    rejecting_stage, cluster_id), composing pii_scrub -> quality filters
    -> per-language tail cut -> dedup keep-longest IN PIPELINE ORDER:

    1. PII scrub transforms the text (quality is judged on what would be
       TRAINED ON, scrubbed — masking can change token/length stats, so
       stage order is semantic, not cosmetic);
    2. quality gates (length/tokens/diversity/stopwords on the scrubbed
       text) attribute the FIRST rejecting stage, as in
       ext_quality_funnel;
    3. CCNet-style per-language terciles are cut over quality SURVIVORS
       only (rejected docs must not shift tercile boundaries); 'tail' is
       dropped;
    4. MinHash duplicate clusters (original text) keep the longest
       SURVIVING member per cluster — a rejected doc never knocks out a
       surviving duplicate.

    Null flow-through: rejecting_stage is NULL iff admitted; every doc
    carries its cluster_id (own id when unclustered) so downstream can
    audit any decision.

    Scale: scrub+quality are map stages into a CACHED |docs|-row gate
    table (read by the tercile passes, the cluster join and the final
    join — the regex scrub runs once); the per-language tail cut is
    grouped exact selection (operators/distrank.py
    grouped_ntile_by_selection — no window, no per-language sort, 2
    pinned boundary keys per language); cluster ranking shuffles
    collision-scale rows. The corpus text moves once (the MinHash
    signature pass)."""
    from habits_etl_spark.operators.distrank import grouped_ntile_by_selection
    from habits_etl_spark.plans.common import managed_cache
    from habits_etl_spark.plans.ext_text import minhash_pairs_shared

    _C, _T = _FUNNEL_MIN_CHARS, _FUNNEL_MIN_TOKENS
    _U, _S = _FUNNEL_MIN_UNIQ, _FUNNEL_MIN_STOP

    d = t(spark, sf_dir, "documents")
    toks = _TOK_SPARK(F.col("text2"))
    n_tokens = F.size(toks).cast("bigint")
    n_unique = F.size(F.array_distinct(toks)).cast("bigint")
    n_stop = _lang_score_spark(toks, _LANG_PROFILES["en"])
    g = F.greatest(n_tokens, F.lit(1).cast("bigint"))
    # +1e-9 tie-nudge before round — see ext_text._QUALITY_SQL comment
    quality = F.round(
        F.lit(0.5) * F.least(n_tokens.cast("double") / 100.0, F.lit(1.0))
        + F.lit(0.3) * (n_unique.cast("double") / g)
        + F.lit(0.2) * F.least(F.lit(10.0) * n_stop.cast("double") / g, F.lit(1.0))
        + F.lit(1e-9),
        4,
    )
    stage_q = (
        F.when(F.length("text2") < _C, F.lit("quality_length"))
        .when(n_tokens < _T, F.lit("quality_tokens"))
        .when(n_unique.cast("double") / g < _U, F.lit("quality_diversity"))
        .when(n_stop.cast("double") / g < _S, F.lit("quality_stopwords"))
    )
    q = managed_cache(
        d.select(
            "doc_id",
            "lang",
            F.col("n_chars").alias("n_chars_orig"),
            _scrub_spark(F.col("text")).alias("text2"),
        ).select(
            "doc_id", "lang", "n_chars_orig",
            quality.alias("quality"), stage_q.alias("stage_q"),
        ),
        "ext_admission_decision/gates",
    )

    pairs = minhash_pairs_shared(spark, sf_dir)
    comps = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("cid")
    )
    clusters_all = (
        q.select("doc_id")
        .join(comps, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce(F.col("cid"), F.col("doc_id")))
        .select("doc_id", "cluster_id")
    )

    surv = q.filter(F.col("stage_q").isNull())
    # Tercile boundaries are cut over SURVIVORS, but the tile itself is
    # a pinned-literal map expression — stamp it straight onto the
    # cached gate table (apply_to=q) instead of producing a buck table
    # that must be joined back twice (r10: two joins fewer in the
    # assembly). For rejected rows the stamped tile is meaningless and
    # never read: rejecting coalesces stage_q first.
    tiled = grouped_ntile_by_selection(
        surv,
        ["lang"],
        [(-F.col("quality")).alias("nq"), F.col("doc_id")],
        3,
        "__tile",
        apply_to=q,
    ).withColumn(
        "stage_b",
        F.when(
            F.col("stage_q").isNull() & (F.col("__tile") == 3), F.lit("lang_tail")
        ),
    )
    bsurv = tiled.filter(
        F.col("stage_q").isNull() & F.col("stage_b").isNull()
    ).select("doc_id", "n_chars_orig")
    wc = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars_orig").desc(), "doc_id"
    )
    ranked = (
        bsurv.join(clusters_all, "doc_id")
        .withColumn("rk", F.row_number().over(wc))
        .select("doc_id", "rk")
    )

    rejecting = F.coalesce(
        F.col("stage_q"),
        F.col("stage_b"),
        F.when(F.col("rk") > 1, F.lit("duplicate")),
    )
    return (
        tiled.join(ranked, "doc_id", "left")
        .join(clusters_all, "doc_id")
        .select(
            "doc_id",
            rejecting.isNull().alias("admitted"),
            rejecting.alias("rejecting_stage"),
            "cluster_id",
        )
        .orderBy("doc_id")
    )


# --- MinHash LSH index delta maintenance ---------------------------------
# The vector index got its no-refit maintenance story in r12
# (ext_ivf_delta_maintenance); this is the dedup-index twin (r13, VERDICT
# r12 #8). A deployed MinHash dedup index IS its band table — the hash
# functions are stateless, so arrivals never force a refit the way a
# drifting quantizer does, but BUCKET OCCUPANCY drifts: the verify cost of
# the index is sum-over-buckets of C(size, 2), and a delta batch that
# lands skewed (crawl revisits one template) can grow it far past the
# delta's fair share. The report below is what a deployment gates
# re-banding (band_bits retune, the SCALING.md banding-law knob) on.
_DELTA_SPLIT = "doc_id % 10 >= 8"  # same 20% arrival split as incremental_dedup


@query(
    "ext_minhash_delta_maintenance",
    f"""
    WITH {_MINHASH_CTES},
    bucket AS (
      SELECT band, v,
             sum(CASE WHEN {_DELTA_SPLIT} THEN 0 ELSE 1 END) AS nb,
             sum(CASE WHEN {_DELTA_SPLIT} THEN 1 ELSE 0 END) AS nd
      FROM bands GROUP BY band, v
    )
    SELECT band,
           CAST(sum(nb) AS BIGINT) AS base_rows,
           CAST(sum(nd) AS BIGINT) AS delta_rows,
           CAST(sum(CASE WHEN nb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS base_buckets,
           CAST(sum(CASE WHEN nb = 0 AND nd > 0 THEN 1 ELSE 0 END) AS BIGINT) AS new_buckets,
           CAST(max(nb) AS BIGINT) AS max_bucket_base,
           CAST(max(nb + nd) AS BIGINT) AS max_bucket_merged,
           CAST(sum((nb * (nb - 1)) // 2) AS BIGINT) AS cand_base,
           CAST(sum(((nb + nd) * (nb + nd - 1)) // 2) AS BIGINT) AS cand_merged,
           (CAST(sum(((nb + nd) * (nb + nd - 1)) // 2) AS BIGINT)
              > 2 * CAST(sum((nb * (nb - 1)) // 2) AS BIGINT)) AS reband
    FROM bucket GROUP BY band ORDER BY band
    """,
)
def ext_minhash_delta_maintenance(spark, sf_dir):
    """Incremental MinHash-LSH index maintenance: the standing corpus
    (docs outside the md5-stateless 20% delta split) owns the band
    table; the delta batch routes into the SAME buckets via the same
    pinned permutations — no refit, no index rebuild, assignment is a
    map stage. Output is the per-band health report: base/delta band
    rows, bucket counts (and buckets the delta opened), max bucket
    occupancy before/after the merge, and the index's verify budget
    sum-over-buckets-of-C(size,2) before/after — with the re-band flag
    raised when the merged verify budget exceeds 2x the standing one
    (the delta's fair share at 20% growth is ~1.56x under uniform
    landing, so 2x means skewed arrivals are quadratically inflating a
    bucket and band_bits should grow, per the SCALING.md banding law).

    Scale: arrivals only ever touch the map-side signature stage plus
    one groupBy over (band, v) — the standing side's band rows are a
    precomputed index table at 100 TB; nothing here rescans the corpus
    text beyond the delta batch. Oracle: the shared _MINHASH_CTES band
    chain (hash-green in five ids since r3) aggregated per bucket then
    per band, pure integer arithmetic throughout — the report is
    hash-gated end to end. Reference parity: [E] extension (BASELINE
    north-star dedup family); no reference twin."""
    from habits_etl_spark.plans.ext_text import _band_rows_from, _minhash_base

    base = _minhash_base(
        spark,
        sf_dir,
        x_sql="cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint)",
        cache_key="minhash.base",
    )
    bands = _band_rows_from(base)
    is_delta = (F.col("doc_id") % 10) >= 8
    bucket = bands.groupBy("band", "v").agg(
        F.sum(F.when(is_delta, 0).otherwise(1)).alias("nb"),
        F.sum(F.when(is_delta, 1).otherwise(0)).alias("nd"),
    )
    cand_base = F.expr("sum((nb * (nb - 1)) div 2)").cast("long")
    cand_merged = F.expr("sum(((nb + nd) * (nb + nd - 1)) div 2)").cast("long")
    return (
        bucket.groupBy("band")
        .agg(
            F.sum("nb").cast("long").alias("base_rows"),
            F.sum("nd").cast("long").alias("delta_rows"),
            F.sum(F.when(F.col("nb") > 0, 1).otherwise(0)).cast("long").alias("base_buckets"),
            F.sum(F.when((F.col("nb") == 0) & (F.col("nd") > 0), 1).otherwise(0))
            .cast("long")
            .alias("new_buckets"),
            F.max("nb").cast("long").alias("max_bucket_base"),
            F.max(F.col("nb") + F.col("nd")).cast("long").alias("max_bucket_merged"),
            cand_base.alias("cand_base"),
            cand_merged.alias("cand_merged"),
            (cand_merged > F.lit(2) * cand_base).alias("reband"),
        )
        .orderBy("band")
    )


# --- Train/val/test split leakage ----------------------------------------
_SPLIT_DUCK = (
    "CASE WHEN doc_id % 10 < 8 THEN 'train' "
    "WHEN doc_id % 10 = 8 THEN 'val' ELSE 'test' END"
)


@query(
    "ext_split_leakage",
    f"""
    WITH {_MINHASH_CTES},
    pairs AS ({_MINHASH_FINAL}),
    sp AS (SELECT doc_id, {_SPLIT_DUCK} AS split FROM documents)
    SELECT p.doc_a, p.doc_b, sa.split AS split_a, sb.split AS split_b,
           p.jaccard
    FROM pairs p
    JOIN sp sa ON sa.doc_id = p.doc_a
    JOIN sp sb ON sb.doc_id = p.doc_b
    WHERE sa.split <> sb.split
    ORDER BY p.doc_a, p.doc_b
    """,
)
def ext_split_leakage(spark, sf_dir):
    """Train/val/test split-leakage audit (r13): assign every document a
    deterministic 8/1/1 split on doc_id and report each MinHash-verified
    near-duplicate pair whose members land in DIFFERENT splits — the
    eval-contamination class a benchmark-honest training pipeline must
    drain before training (a test doc with a train-side near-dup is a
    leaked label; the pair list is the actionable drop set, the
    composition twin of ext_contamination_ngram's 13-gram benchmark
    check). Exact duplicates are the jaccard=1.0 rows of the same
    relation — identical signatures always collide, so one pipeline
    serves both severities.

    Scale: the pair relation is the banded MinHash chain (collision-
    sized, never all-pairs); split assignment is a pure projection of
    the pair list joined twice against a two-column broadcast. At 100 TB
    the pair list is the standing dedup-index table, so this audit is a
    filter over an artifact that already exists. Oracle: the shared
    _MINHASH_CTES chain + split CASE per side. Reference parity: [E]
    extension (BASELINE north-star dedup family); no reference twin."""
    from habits_etl_spark.plans.ext_text import ext_near_dedup_minhash

    pairs = ext_near_dedup_minhash(spark, sf_dir)
    split = F.when(F.col("doc_id") % 10 < 8, "train").otherwise(
        F.when(F.col("doc_id") % 10 == 8, "val").otherwise("test")
    )
    sp = t(spark, sf_dir, "documents").select(
        "doc_id", split.alias("split")
    )
    sa = sp.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = sp.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "split_a", "split_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


# --- Cluster-safe split: the FIX for what ext_split_leakage detects --------
_CSPLIT_SALT = "csplit:"
_CSPLIT_BUCKET_DUCK = (
    f"CAST(('0x' || substr(md5('{_CSPLIT_SALT}' || CAST(rep AS VARCHAR)), 1, 8))"
    " AS BIGINT) % 10"
)


@query(
    "ext_cluster_safe_split",
    f"""
    WITH RECURSIVE {_MINHASH_CTES},
    pairs AS ({_MINHASH_FINAL}),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    walk AS (
      SELECT u, u AS label FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.v AS u, w.label FROM walk w JOIN edges e ON e.u = w.u
    ),
    comp AS (SELECT u AS doc_id, min(label) AS rep FROM walk GROUP BY u),
    asg AS (
      SELECT doc_id, rep,
             CASE WHEN {_CSPLIT_BUCKET_DUCK} < 8 THEN 'train'
                  WHEN {_CSPLIT_BUCKET_DUCK} = 8 THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT d.doc_id, coalesce(c.rep, d.doc_id) AS rep
        FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
      )
    ),
    g AS (
      SELECT split, CAST(count(*) AS BIGINT) AS docs,
             CAST(count(DISTINCT rep) AS BIGINT) AS clusters
      FROM asg GROUP BY 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS total_docs FROM asg),
    leak AS (
      SELECT CAST(count(*) AS BIGINT) AS leaked_pairs
      FROM pairs p
      JOIN asg a ON a.doc_id = p.doc_a
      JOIN asg b ON b.doc_id = p.doc_b
      WHERE a.split <> b.split
    )
    SELECT split, docs, clusters,
           round(CAST(docs AS DOUBLE) / total_docs, 6) AS doc_share,
           leaked_pairs
    FROM g CROSS JOIN tot CROSS JOIN leak
    ORDER BY split
    """,
)
def ext_cluster_safe_split(spark, sf_dir):
    """Leakage-safe train/val/test split — the FIX for the contamination
    ext_split_leakage detects: split assignment hashes the near-dup
    CLUSTER representative (connected component of the MinHash pair
    graph; singletons represent themselves), so every near-duplicate
    family lands in ONE split and cross-split leakage is zero by
    construction. Output is the audit a pipeline reviews before
    training: per split its doc count, cluster count, corpus share, and
    the residual cross-split near-dup pair count — recomputed the same
    way the leakage audit counts it, so the 0 is measured, not assumed.
    With detect (ext_split_leakage) and fix (this id), the split has the
    same detect -> repair arc the dedup and vector indexes got.

    Scale: the pair relation is the standing banded-MinHash index table
    (collision-sized, never all-pairs); components via
    operators/clusters.py (driver union-find at collision scale, the
    O(log n) alternating label-propagation loop beyond it); the
    assignment is one salted md5 map over (doc_id, rep) — stable under
    corpus growth like ext_hash_split, because a cluster's rep only
    changes if a new doc BRIDGES clusters, exactly the case where the
    family must be re-split together anyway. Oracle: the shared
    _MINHASH_CTES chain + the recursive-CTE closure (the
    ext_dup_clusters pattern) + the same salted-hash CASE. Reference
    parity: [E] extension (BASELINE north-star dedup family); no
    reference twin."""
    from habits_etl_spark.plans.common import managed_cache
    from habits_etl_spark.plans.ext_text import minhash_pairs_shared

    pairs = minhash_pairs_shared(spark, sf_dir)
    comps = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("comp")
    )
    docs = t(spark, sf_dir, "documents").select("doc_id")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(_CSPLIT_SALT), F.col("rep").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 10
    )
    asg = (
        docs.join(F.broadcast(comps), "doc_id", "left")
        .select("doc_id", F.coalesce("comp", "doc_id").alias("rep"))
        .select(
            "doc_id",
            "rep",
            F.when(bucket < 8, "train")
            .when(bucket == 8, "val")
            .otherwise("test")
            .alias("split"),
        )
    )
    asg = managed_cache(asg, f"cluster_safe_split/asg:{sf_dir}")
    g = asg.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs"),
        F.countDistinct("rep").cast("bigint").alias("clusters"),
    )
    tot = asg.agg(F.count(F.lit(1)).cast("bigint").alias("total_docs"))
    # Broadcast the COLLISION-SIZED side (the pair list, and then the
    # pair list enriched with one split), never the corpus-sized split
    # assignment — at 100 TB asg is one row per document while pairs is
    # the standing dedup-index table.
    sa = asg.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    sb = asg.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    half = sa.join(F.broadcast(pairs.select("doc_a", "doc_b")), "doc_a")
    leak = (
        sb.join(F.broadcast(half), "doc_b")
        .filter(F.col("sa") != F.col("sb"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("leaked_pairs"))
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(leak))
        .select(
            "split",
            "docs",
            "clusters",
            F.round(F.col("docs").cast("double") / F.col("total_docs"), 6).alias(
                "doc_share"
            ),
            "leaked_pairs",
        )
        .orderBy("split")
    )


# --- LSH re-banding simulation --------------------------------------------
# The decision-support half of the maintenance arc: the delta report above
# says WHEN to re-band; this op says what each candidate layout would COST
# (verify budget on the actual corpus) and BUY (the s-curve collision
# probability at the verify threshold). Layouts partition the same 16
# signature minima into b bands x r rows, so no re-hashing is needed to
# evaluate them — exactly how a deployment explores (b, r) before a
# rebuild.
_REBAND_LAYOUTS = ((8, 2), (5, 3), (4, 4))  # (n_bands, rows_per_band)


def _scurve(b: int, r: int, j: float) -> float:
    """P(collide in >= 1 band) for true Jaccard j under b bands x r rows —
    computed in Python and inlined as the SAME literal in both engines."""
    return round(1.0 - (1.0 - j**r) ** b, 6)


def _reband_sql() -> str:
    from habits_etl_spark.plans.ext_text import _JACCARD_THRESHOLD, _MINHASH_CTES

    parts = []
    for b, r in _REBAND_LAYOUTS:
        band_sel = " UNION ALL ".join(
            "SELECT doc_id, {i} AS band, concat_ws(':', {cols}) AS v FROM sig".format(
                i=i, cols=", ".join(f"m{r * i + k}" for k in range(r))
            )
            for i in range(b)
        )
        parts.append(
            f"""SELECT {r} AS r_rows, {b} AS n_bands,
               CAST(sum(c) AS BIGINT) AS band_rows,
               CAST(count(*) AS BIGINT) AS buckets,
               CAST(max(c) AS BIGINT) AS max_bucket,
               CAST(sum((c * (c - 1)) // 2) AS BIGINT) AS cand_pairs,
               {_scurve(b, r, _JACCARD_THRESHOLD)} AS scurve_at_t
        FROM (SELECT band, v, count(*) AS c FROM ({band_sel}) GROUP BY band, v)"""
        )
    body = "\n    UNION ALL\n    ".join(parts)
    return f"""
    WITH {_MINHASH_CTES}
    SELECT * FROM (
    {body}
    ) ORDER BY r_rows
    """


@query("ext_minhash_reband_sim", _reband_sql())
def ext_minhash_reband_sim(spark, sf_dir):
    """MinHash LSH re-banding simulation (r13): evaluate every candidate
    (b bands x r rows) partition of the EXISTING 16 signature minima on
    the actual corpus — per layout: band rows, occupied buckets, max
    bucket occupancy, the verify budget sum-over-buckets-of-C(size,2)
    (the number the delta-maintenance re-band flag watches), and the
    closed-form s-curve collision probability at the verify threshold
    (what the layout BUYS in recall). Wider rows-per-band cut noise
    collisions ~j^r per band while the verify threshold keeps emitted
    pairs exact — this table is the measured evidence a deployment
    re-bands on, not a rule of thumb.

    Scale: three groupBys over the skinny (doc_id, band, v) relations
    derived from ONE cached signature pass — no re-hashing, no joins;
    at 100 TB the sig table is the standing index artifact and each
    layout evaluation is a single aggregation over it. Oracle: the
    shared signature CTEs with the same per-layout band construction;
    the s-curve is a Python literal inlined identically in both
    engines. Reference parity: [E] extension (BASELINE north-star
    dedup family); no reference twin."""
    from habits_etl_spark.plans.ext_text import (
        _N_HASHES,
        _minhash_base,
        _perm_col,
    )

    base = _minhash_base(
        spark,
        sf_dir,
        x_sql="cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint)",
        cache_key="minhash.base",
    )
    sig = base.select("doc_id", *[_perm_col(h) for h in range(_N_HASHES)])
    from habits_etl_spark.plans.ext_text import _JACCARD_THRESHOLD

    reports = []
    for b, r in _REBAND_LAYOUTS:
        bands = sig.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("band"),
                            F.concat_ws(
                                ":", *[F.col(f"m{r * i + k}") for k in range(r)]
                            ).alias("v"),
                        )
                        for i in range(b)
                    ]
                )
            ).alias("bv"),
        ).select("doc_id", "bv.band", "bv.v")
        bucket = bands.groupBy("band", "v").agg(F.count(F.lit(1)).alias("c"))
        reports.append(
            bucket.agg(
                F.lit(r).alias("r_rows"),
                F.lit(b).alias("n_bands"),
                F.sum("c").cast("long").alias("band_rows"),
                F.count(F.lit(1)).cast("long").alias("buckets"),
                F.max("c").cast("long").alias("max_bucket"),
                F.expr("sum((c * (c - 1)) div 2)").cast("long").alias("cand_pairs"),
                F.lit(_scurve(b, r, _JACCARD_THRESHOLD)).alias("scurve_at_t"),
            ).select(
                "r_rows", "n_bands", "band_rows", "buckets", "max_bucket",
                "cand_pairs", "scurve_at_t",
            )
        )
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out.orderBy("r_rows")


# --- re-banded dedup (the decision, executed) -------------------------------
# ext_minhash_reband_sim above produces the decision table; this id PROVES
# the retune path end-to-end: the same dedup chain running under the
# deepest simulated layout. 4 bands x 4 rows partitions the SAME 16
# signature minima (no re-hashing, exactly what a deployed index does on a
# re-band), s-curve threshold (1/4)^(1/4) ~= 0.71 vs the default 8x2's
# 0.35 — the layout the delta-maintenance report's re-band flag points to
# when bucket occupancy (and so the verify budget) outgrows the fair
# share: r=4 cuts random band collisions to ~j^4.
_REBAND_B, _REBAND_R = 4, 4


def _rebanded_sql() -> str:
    from habits_etl_spark.plans.ext_text import _MINHASH_FINAL, _minhash_ctes

    return f"""
    WITH {_minhash_ctes(_REBAND_B, _REBAND_R)}
    {_MINHASH_FINAL}
    """


@query("ext_near_dedup_minhash_rebanded", _rebanded_sql())
def ext_near_dedup_minhash_rebanded(spark, sf_dir):
    """MinHash near-dedup under the RE-BANDED 4x4 LSH layout (r14,
    VERDICT r13 #5): identical shingling, signatures, and exact-verify
    threshold as ext_near_dedup_minhash — only the (b x r) partition of
    the 16 minima changes, which is precisely what a production re-band
    does. Emitted pairs remain exact-verified (precision 1.0); recall
    follows the deeper layout's s-curve (higher collision threshold,
    ~j^4 noise candidates — the trade the re-band buys when the verify
    budget outgrows its fair share under corpus growth). Together with
    ext_minhash_delta_maintenance (when to re-band), ext_minhash_reband_sim
    (which layout), and this id (the retuned chain itself), the dedup
    index has an executable maintain -> decide -> retune lifecycle.

    Scale: same as the default chain — map-only signature stage over the
    shared cached base, band self-join on (band, v), broadcast candidate
    verify; the 4x4 layout HALVES band rows (4 per doc vs 8) and cuts
    random collisions ~j^4, so it is strictly cheaper per doc at equal
    corpus size. Oracle: the shared CTE chain under the same layout
    literals. Reference parity: [E] extension (BASELINE north-star
    'MinHash+LSH'); no reference twin."""
    from habits_etl_spark.plans.ext_text import _near_dedup_pipeline

    return _near_dedup_pipeline(
        spark,
        sf_dir,
        x_sql="cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint)",
        cache_key="minhash.base",
        n_bands=_REBAND_B,
        band_rows=_REBAND_R,
    )


def _reband_audit_sql() -> str:
    from habits_etl_spark.plans.ext_text import (
        _JACCARD_THRESHOLD,
        _minhash_ctes,
    )

    # "kept" = the pair still collides in >= 1 band of the re-banded
    # layout — an OR over the 4 four-minima conjunctions on the SAME sig
    # relation the default chain already computed (no second chain, no
    # CTE-name collision).
    kept = " OR ".join(
        "("
        + " AND ".join(
            f"sa.m{_REBAND_R * b + j} = sb.m{_REBAND_R * b + j}"
            for j in range(_REBAND_R)
        )
        + ")"
        for b in range(_REBAND_B)
    )
    return f"""
    WITH {_minhash_ctes()},
    pairs AS (
      SELECT doc_a, doc_b,
             round(CAST(n_common AS DOUBLE) / (na + nb - n_common), 4) AS jaccard
      FROM inter
      WHERE CAST(n_common AS DOUBLE) / (na + nb - n_common) >= {_JACCARD_THRESHOLD}
    )
    SELECT p.doc_a, p.doc_b, p.jaccard, ({kept}) AS kept
    FROM pairs p
    JOIN sig sa ON sa.doc_id = p.doc_a
    JOIN sig sb ON sb.doc_id = p.doc_b
    ORDER BY p.doc_a, p.doc_b
    """


@query("ext_reband_recall_audit", _reband_audit_sql())
def ext_reband_recall_audit(spark, sf_dir):
    """Measured recall audit of the re-band decision (r14): for every
    TRUE near-dup pair the registered 8x2 layout verifies, report
    whether the re-banded {_REBAND_B}x{_REBAND_R} layout would still
    surface it (``kept`` = the pair collides in >= 1 of the re-banded
    bands — a pure predicate over the SAME 16 signature minima). The
    s-curve in ext_minhash_reband_sim is the closed-form recall
    ESTIMATE; this id is the ground truth on the actual corpus — the
    per-pair loss list a deployment reviews before committing a
    re-band, and the measured check that the retune (lower verify
    budget) costs only the recall the curve predicted.

    Scale: the pair relation is the standing dedup index (collision-
    sized); the audit joins it twice against the signature table
    (corpus-sized, one row per doc) and evaluates a constant-width
    boolean — no new candidate generation, no re-hashing. Oracle: the
    shared default-layout chain plus the same band-equality predicate
    over its sig CTE. Reference parity: [E] extension (BASELINE
    north-star dedup family); no reference twin."""
    from habits_etl_spark.plans.ext_text import (
        _N_HASHES,
        _minhash_base,
        _perm_col,
        ext_near_dedup_minhash,
    )

    pairs = ext_near_dedup_minhash(spark, sf_dir)
    base = _minhash_base(
        spark,
        sf_dir,
        x_sql="cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint)",
        cache_key="minhash.base",
    )
    sig = base.select("doc_id", *[_perm_col(h) for h in range(_N_HASHES)])
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"m{h}").alias(f"a{h}") for h in range(_N_HASHES)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"m{h}").alias(f"b{h}") for h in range(_N_HASHES)],
    )
    kept = None
    for b in range(_REBAND_B):
        band_eq = None
        for j in range(_REBAND_R):
            h = _REBAND_R * b + j
            eq = F.col(f"a{h}") == F.col(f"b{h}")
            band_eq = eq if band_eq is None else (band_eq & eq)
        kept = band_eq if kept is None else (kept | band_eq)
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", "jaccard", kept.alias("kept"))
        .orderBy("doc_a", "doc_b")
    )
