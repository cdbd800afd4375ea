"""Pretraining-corpus curation operators, wave 3: sequence packing,
benchmark decontamination, and intra-document repetition screening.

These are the remaining first-class ops a 100 TB training-data pipeline
runs between "documents admitted" (ext_admission_decision) and "tokens on
GPUs": lay documents out into fixed context windows, prove the corpus
does not contain the eval set, and drop degenerate repetitive text.
Reference parity: the reference has no curation surface; these extend it
per the BASELINE north-star list, like plans/ext_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from habits_etl_spark.plans.common import query, t
from habits_etl_spark.plans.ext_text import _TOK_DUCK, _TOK_SPARK

# --- sequence packing -------------------------------------------------------

_PACK_WINDOW = 256  # tokens per training sequence


@query(
    "ext_seq_packing",
    f"""
    WITH toks AS (
      SELECT doc_id, source, len({_TOK_DUCK}) AS n_tokens FROM documents
    ),
    offs AS (
      SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS start_offset
      FROM toks
    )
    SELECT doc_id, source, n_tokens, start_offset,
           CAST(start_offset // {_PACK_WINDOW} AS BIGINT) AS first_seq,
           CAST((start_offset + greatest(n_tokens, 1) - 1) // {_PACK_WINDOW} AS BIGINT) AS last_seq
    FROM offs ORDER BY doc_id
    """,
)
def ext_seq_packing(spark, sf_dir):
    """Concatenate-and-chunk sequence packing (the GPT-style pretraining
    layout): within each shard (``source``), documents are concatenated
    in doc_id order and cut into {_PACK_WINDOW}-token context windows.
    Output per document: its token count, start offset in the shard's
    token stream, and the first/last sequence ids it lands in — the
    manifest a tokenizer/loader consumes to materialize training
    sequences (and to attribute any sequence back to its documents).

    Scale: one window cumsum PARTITIONED BY SHARD — never a global
    ordering. Shards are the unit a real pipeline packs independently
    (files/sources), so the shuffle is by source and each partition does
    a local sort; 1000 executors pack 1000 shards concurrently. Token
    counts here are whitespace counts (ext_token_count's convention);
    swapping in BPE counts changes the map stage only."""
    return seq_packing_over(t(spark, sf_dir, "documents"))


def seq_packing_over(d, n_tokens_col=None):
    """Packing manifest over any documents-like DataFrame (doc_id, source,
    text). Factored out so a composed pipeline can pack exactly the
    ADMITTED corpus — offsets computed over a superset would leave gaps
    for rejected docs' tokens and mis-place every sequence boundary
    (examples/curation_pipeline.py).

    ``n_tokens_col``: optional Column of per-doc token counts to pack by
    (e.g. BPE counts from functions/bpe.with_bpe_token_count — the
    token-accurate convention a real pretraining loader needs). Default
    stays the whitespace convention, which is what the DuckDB oracle
    mirrors."""
    n_tokens = (
        n_tokens_col.cast("bigint")
        if n_tokens_col is not None
        else F.size(_TOK_SPARK(F.col("text"))).cast("bigint")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = d.select("doc_id", "source", n_tokens.alias("n_tokens")).withColumn(
        "start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    )
    # integer floor-div (`div`), NOT double `/` + cast: a shard offset
    # beyond 2^53 would lose precision in the double and mis-place
    # sequence boundaries by one (oracle uses exact `//` likewise)
    return offs.select(
        "doc_id",
        "source",
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset div {_PACK_WINDOW}").alias("first_seq"),
        F.expr(
            f"(start_offset + greatest(n_tokens, 1L) - 1) div {_PACK_WINDOW}"
        ).alias("last_seq"),
    ).orderBy("doc_id")


# --- benchmark decontamination ---------------------------------------------

_CONTAM_N = 13  # the published GPT-3 decontamination n-gram size


def _gram_sql(n: int) -> str:
    return (
        f"list_transform(generate_series(1, len(w) - {n - 1}), "
        f"i -> array_to_string(w[i:i+{n - 1}], ' '))"
    )


@query(
    "ext_contamination_ngram",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOK_DUCK} AS w FROM documents
    ),
    g AS (
      SELECT doc_id, unnest({_gram_sql(_CONTAM_N)}) AS gram
      FROM toks WHERE len(w) >= {_CONTAM_N}
    ),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
    SELECT g.doc_id, CAST(count(DISTINCT g.gram) AS BIGINT) AS shared_ngrams
    FROM g JOIN bench USING (gram)
    WHERE g.doc_id % 50 != 0
    GROUP BY 1 ORDER BY 1
    """,
)
def ext_contamination_ngram(spark, sf_dir):
    """Benchmark decontamination (GPT-3 appendix C layout): a training
    document is contaminated if it shares any {_CONTAM_N}-gram with the
    held-out eval set. The eval set here is the deterministic stand-in
    ``doc_id % 50 == 0`` (in production: the actual benchmark corpus).
    Emits the contaminated docs with their shared-distinct-gram count —
    the removal list plus the evidence.

    Scale: the eval side is tiny by construction (benchmarks are MBs,
    corpora are TBs) — its distinct gram set builds once and BROADCASTS;
    the corpus side is a pure map (gram explode) + broadcast semi-join +
    per-doc count, no corpus shuffle. Gram strings are exploded here for
    oracle parity; at 100 TB hash each gram to int64 first (xxhash64) so
    the broadcast and the probe carry 8 bytes per gram."""
    d = t(spark, sf_dir, "documents")
    w = F.col("w")
    grams = F.expr(
        f"transform(sequence(1, size(w) - {_CONTAM_N - 1}), "
        + "i -> concat_ws(' ', "
        + ", ".join(f"element_at(w, i + {k})" for k in range(_CONTAM_N))
        + "))"
    )
    g = (
        d.select("doc_id", _TOK_SPARK(F.col("text")).alias("w"))
        .filter(F.size(w) >= _CONTAM_N)
        .select("doc_id", F.explode(grams).alias("gram"))
    )
    bench = g.filter(F.col("doc_id") % 50 == 0).select("gram").distinct()
    return (
        g.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("shared_ngrams"))
        .orderBy("doc_id")
    )


# --- repetition screening ---------------------------------------------------

# Gopher's published top-2-gram threshold is 0.20 for web text; this
# fixture's synthetic docs are far less repetitive, so the query ships a
# tighter screen to keep the flag non-vacuous (33/500 docs at sf0.01).
_REP_TOP2_MAX = 0.08


@query(
    "ext_repetition_stats",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOK_DUCK} AS w FROM documents
    ),
    g2 AS (
      SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
             i -> w[i] || ' ' || w[i+1])) AS gram
      FROM toks WHERE len(w) >= 2
    ),
    c AS (SELECT doc_id, gram, count(*) AS n FROM g2 GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_bigrams,
           round(CAST(max(n) AS DOUBLE) / sum(n), 4) AS top_bigram_frac,
           CAST(max(n) AS DOUBLE) / sum(n) > {_REP_TOP2_MAX} AS flagged
    FROM c GROUP BY 1 ORDER BY 1
    """,
)
def ext_repetition_stats(spark, sf_dir):
    """Intra-document repetition screen (Gopher rules, Rae et al. 2021
    table A1: drop docs whose most frequent n-gram exceeds a share of the
    text): per doc, the share of the top bigram among all bigrams, and a
    flag at {_REP_TOP2_MAX} (Gopher publishes 0.20 for web text; see
    constant note). Degenerate generator/boilerplate text fails this
    screen long before a perplexity filter sees it.

    Scale: gram explode -> two hash-aggregates keyed by (doc_id, gram)
    then doc_id — both with map-side partial aggregation, the same cost
    class as word count. No joins, no windows."""
    d = t(spark, sf_dir, "documents")
    w = F.col("w")
    bigrams = F.expr(
        "transform(sequence(1, size(w) - 1), "
        "i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1)))"
    )
    c = (
        d.select("doc_id", _TOK_SPARK(F.col("text")).alias("w"))
        .filter(F.size(w) >= 2)
        .select("doc_id", F.explode(bigrams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top_frac = F.max("n").cast("double") / F.sum("n")
    return (
        c.groupBy("doc_id")
        .agg(
            F.sum("n").cast("bigint").alias("n_bigrams"),
            F.round(top_frac, 4).alias("top_bigram_frac"),
            (top_frac > _REP_TOP2_MAX).alias("flagged"),
        )
        .orderBy("doc_id")
    )


# --- BPE token counting (rows-only) -----------------------------------------


@query("ext_token_count_bpe")  # rows-only: BPE apply is not SQL-expressible
def ext_token_count_bpe(spark, sf_dir):
    """Subword token counts from a REAL learned BPE merge table
    (functions/bpe.py; Sennrich et al. 2016) next to the whitespace
    convention — the token-accurate basis for packing/mixing budgets.

    Rows-only by design (the rank-greedy merge loop has no DuckDB twin);
    training determinism, executor-vs-driver application parity, and
    cumsum-exact packing on these counts are asserted in tests/test_bpe.py.

    Scale: training is one distributed pair-count aggregate per merge
    round over the bounded word-frequency table; application is an
    Arrow-batched map stage (broadcast ranks, per-task word cache) — no
    shuffle beyond the output ORDER BY, which a pipeline consumer drops."""
    from habits_etl_spark.functions.bpe import train_bpe_merges, with_bpe_token_count

    d = t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    merges = train_bpe_merges(spark, d, n_merges=64)
    return (
        with_bpe_token_count(d, merges)
        .select(
            "doc_id",
            F.size(_TOK_SPARK(F.col("text"))).cast("bigint").alias("n_tokens_ws"),
            "n_tokens_bpe",
        )
        .orderBy("doc_id")
    )
