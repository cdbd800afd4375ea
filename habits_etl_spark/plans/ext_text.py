"""Text-analysis / dedup extension operators over ``documents``
(SURVEY §2.12 [E], mandated by BASELINE.json: LLM-data-pipeline ops).

All of these are pure relational compositions — token explode + joins +
aggregations — so they scale as ordinary shuffles. MinHash uses md5-based
hash permutations, which are engine-portable (same signatures in DuckDB),
unlike engine-specific hash() functions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from habits_etl_spark.plans.common import davg, query, sql_davg, t

# Whitespace tokenization shared by every operator here.
_TOK_SPARK = lambda c: F.split(F.trim(c), r"\s+")  # noqa: E731
_TOK_DUCK = "regexp_split_to_array(trim(text), '\\s+')"

# Tiny stopword profiles for the language-ID heuristic.
_LANG_PROFILES = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "fr": ("le", "la", "les", "et", "est", "un"),
    "es": ("el", "la", "los", "y", "es", "un"),
}

_N_BANDS = 8  # MinHash LSH bands (1 row per band)
_JACCARD_THRESHOLD = 0.5


@query(
    "ext_exact_dedup",
    """
    WITH dup AS (
      SELECT * FROM documents
      UNION ALL
      SELECT * FROM documents WHERE doc_id % 4 = 0
    )
    SELECT sha256(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS keep_doc_id
    FROM dup GROUP BY 1
    """,
)
def ext_exact_dedup(spark, sf_dir):
    """Exact dedup by content hash (generalizes reference row_hash,
    etl/transform.py:16-18): group on sha256(text), keep the first doc id.
    Input is salted with 25% duplicates to make the collapse observable.

    Scale: hash-groupBy on a uniform 256-bit key — partial agg collapses
    duplicates map-side before the shuffle."""
    d = t(spark, sf_dir, "documents")
    dup = d.unionAll(d.filter(F.col("doc_id") % 4 == 0))
    return dup.groupBy(F.sha2(F.col("text"), 256).alias("text_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keep_doc_id"),
    )


@query(
    "ext_text_stats",
    f"""
    SELECT doc_id, lang,
           length(text) AS n_chars_calc,
           CAST(len({_TOK_DUCK}) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct({_TOK_DUCK})) AS BIGINT) AS n_unique_tokens,
           round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / greatest(len({_TOK_DUCK}), 1), 4) AS avg_token_len
    FROM documents
    """,
)
def ext_text_stats(spark, sf_dir):
    """Per-document token statistics (SURVEY §2.12 ext_text_stats):
    char count, token count, unique-token count, mean token length.
    Pure map stage — no shuffle."""
    d = t(spark, sf_dir, "documents")
    toks = _TOK_SPARK(F.col("text"))
    return d.select(
        "doc_id",
        "lang",
        F.length("text").cast("bigint").alias("n_chars_calc"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique_tokens"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.greatest(F.size(toks), F.lit(1)),
            4,
        ).alias("avg_token_len"),
    )


@query(
    "ext_lang_profile",
    f"""
    SELECT lang, count(*) AS n_docs,
           {sql_davg('CAST(n_chars AS DOUBLE)')} AS avg_chars,
           CAST(sum(len({_TOK_DUCK})) AS BIGINT) AS total_tokens
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def ext_lang_profile(spark, sf_dir):
    """Corpus breakdown by language tag (SURVEY §2.12 ext_text_stats
    group-by shape)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            davg(F.col("n_chars").cast("double")).alias("avg_chars"),
            F.sum(F.size(_TOK_SPARK(F.col("text"))).cast("bigint")).alias("total_tokens"),
        )
        .orderBy("lang")
    )


def _lang_score_spark(toks, words):
    return F.size(F.filter(toks, lambda x: x.isin(*words)))


def _lang_score_duck(words):
    wl = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({_TOK_DUCK}, x -> list_contains([{wl}], x)))"


@query(
    "ext_lang_id",
    f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_lang_score_duck(_LANG_PROFILES['en'])} AS s_en,
             {_lang_score_duck(_LANG_PROFILES['de'])} AS s_de,
             {_lang_score_duck(_LANG_PROFILES['fr'])} AS s_fr,
             {_lang_score_duck(_LANG_PROFILES['es'])} AS s_es
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
                WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
                WHEN s_fr >= s_es THEN 'fr'
                ELSE 'es' END AS lang_guess
    FROM scored
    """,
)
def ext_lang_id(spark, sf_dir):
    """Stopword-profile language ID heuristic (SURVEY §2.12 / BASELINE
    north-star 'text analysis'): count stopword hits per language profile,
    argmax with a fixed precedence order. Map-only, no shuffle."""
    d = t(spark, sf_dir, "documents")
    toks = _TOK_SPARK(F.col("text"))
    s = {k: _lang_score_spark(toks, v) for k, v in _LANG_PROFILES.items()}
    guess = (
        F.when(F.greatest(s["en"], s["de"], s["fr"], s["es"]) == 0, F.lit("und"))
        .when(s["en"] >= F.greatest(s["de"], s["fr"], s["es"]), F.lit("en"))
        .when(s["de"] >= F.greatest(s["fr"], s["es"]), F.lit("de"))
        .when(s["fr"] >= s["es"], F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return d.select("doc_id", "lang", guess.alias("lang_guess"))


@query(
    "ext_quality_score",
    f"""
    WITH m AS (
      SELECT doc_id,
             CAST(len({_TOK_DUCK}) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct({_TOK_DUCK})) AS BIGINT) AS n_unique,
             {_lang_score_duck(_LANG_PROFILES['en'])} AS n_stop,
             length(text) AS n_chars
      FROM documents
    )
    SELECT doc_id, n_tokens,
           round(CAST(n_unique AS DOUBLE) / greatest(n_tokens, 1), 4) AS uniq_ratio,
           round(CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1), 4) AS stop_ratio,
           round(CAST(n_chars AS DOUBLE) / greatest(n_tokens, 1), 4) AS chars_per_token,
           round(0.5 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
                 + 0.3 * (CAST(n_unique AS DOUBLE) / greatest(n_tokens, 1))
                 + 0.2 * least(10.0 * CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1), 1.0),
                 4) AS quality
    FROM m
    """,
)
def ext_quality_score(spark, sf_dir):
    """Document quality scoring (BASELINE north-star 'quality scoring'):
    length / lexical-diversity / stopword-ratio components combined into a
    bounded score — the standard pretraining-data heuristic family."""
    d = t(spark, sf_dir, "documents")
    toks = _TOK_SPARK(F.col("text"))
    n_tokens = F.size(toks).cast("bigint")
    n_unique = F.size(F.array_distinct(toks)).cast("bigint")
    n_stop = _lang_score_spark(toks, _LANG_PROFILES["en"])
    n_chars = F.length("text")
    g = F.greatest(n_tokens, F.lit(1).cast("bigint"))
    quality = F.round(
        F.lit(0.5) * F.least(n_tokens.cast("double") / 100.0, F.lit(1.0))
        + F.lit(0.3) * (n_unique.cast("double") / g)
        + F.lit(0.2) * F.least(F.lit(10.0) * n_stop.cast("double") / g, F.lit(1.0)),
        4,
    )
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(n_unique.cast("double") / g, 4).alias("uniq_ratio"),
        F.round(n_stop.cast("double") / g, 4).alias("stop_ratio"),
        F.round(n_chars.cast("double") / g, 4).alias("chars_per_token"),
        quality.alias("quality"),
    )


@query(
    "ext_token_count",
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS n_bpe_ish,
           CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS BIGINT) AS n_words
    FROM documents
    """,
)
def ext_token_count(spark, sf_dir):
    """Tokenizer-approximating counts (BASELINE north-star 'token
    counting'): a BPE-ish segmentation regex (letter runs / digit runs /
    single punctuation) and plain word counts."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), 0)).cast("bigint").alias("n_bpe_ish"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-zA-Z0-9]+"), 0)).cast("bigint").alias("n_words"),
    )


@query(
    "ext_fingerprint",
    f"""
    SELECT doc_id,
           list_aggregate(list_transform(list_distinct({_TOK_DUCK}), x -> md5(x)), 'min') AS fingerprint
    FROM documents
    """,
)
def ext_fingerprint(spark, sf_dir):
    """Document fingerprint (BASELINE north-star 'document
    fingerprinting'): the minimum md5 over the distinct token set — a
    1-permutation MinHash, stable under token reordering (engine-portable,
    unlike builtin hash())."""
    d = t(spark, sf_dir, "documents")
    toks = F.array_distinct(_TOK_SPARK(F.col("text")))
    return d.select(
        "doc_id",
        F.array_min(F.transform(toks, lambda x: F.md5(x))).alias("fingerprint"),
    )


def _minhash_sql_aggs():
    return ",\n             ".join(
        f"min(md5('{b}:' || tok)) AS m{b}" for b in range(_N_BANDS)
    )


@query(
    "ext_near_dedup_minhash",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct({_TOK_DUCK})) AS tok FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY 1),
    sig AS (
      SELECT doc_id,
             {_minhash_sql_aggs()}
      FROM toks GROUP BY doc_id
    ),
    bands AS (
      {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, m{b} AS v FROM sig" for b in range(_N_BANDS))}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_common
      FROM cand c
      JOIN toks ta ON ta.doc_id = c.doc_a
      JOIN toks tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           round(CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common), 4) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) >= {_JACCARD_THRESHOLD}
    """,
)
def ext_near_dedup_minhash(spark, sf_dir):
    """MinHash + LSH near-duplicate detection (BASELINE north-star
    'MinHash+LSH'; SURVEY §2.12 ext_near_dedup), fully relational and
    engine-portable:

    1. distinct-token explode (shingle stage);
    2. {_N_BANDS} md5 'permutations' -> per-doc signature (one groupBy);
    3. LSH banding: docs sharing any band value become candidate pairs
       (self-equi-join on (band, value) — the quadratic pair space is never
       materialized, only hash-bucket collisions);
    4. exact Jaccard verification on candidates via a token equi-join.

    Scale: candidates ~ collisions only; the verify join ships only
    candidate docs' token sets. This is the textbook 100 TB near-dedup
    layout (cf. the MinHashLSH design in Spark MLlib — reimplemented here
    relationally so the oracle can verify it)."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(_TOK_SPARK(F.col("text")))).alias("tok")
    )
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sig = toks.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{b}:"), F.col("tok")))).alias(f"m{b}")
            for b in range(_N_BANDS)
        ]
    )
    bands = sig.unpivot(
        ["doc_id"], [f"m{b}" for b in range(_N_BANDS)], "band_name", "v"
    ).select("doc_id", "v", F.substring("band_name", 2, 2).cast("int").alias("band"))
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ta = toks.alias("ta")
    tb = toks.alias("tb")
    inter = (
        cand.join(ta, F.col("ta.doc_id") == F.col("doc_a"))
        .join(tb, (F.col("tb.doc_id") == F.col("doc_b")) & (F.col("tb.tok") == F.col("ta.tok")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_common")
    )
    return (
        inter.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(jac >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )
