"""Soundness of the PPJoin+ candidate kills in ext_ngram_jaccard_blocked
(r13): the prefix lemma, the length prune, the first-common-gram position
bound, and the shared-prefix-gram COUNT bound must never drop a true pair.

The count bound is the least standard of the four, so it is pinned two
ways: (1) the plan end-to-end against a pure-Python brute force on a
randomized adversarial corpus (short docs, 2-letter alphabet — heavy
5-gram collisions, knife-edge sizes), (2) the combinatorial lemma itself
on random set pairs, directly in Python.

Lemma (docstring of ext_ngram_jaccard_blocked's cand step): with the c
common grams ordered by the global (df, gram) key, the i-th has at least
c-i+1 elements of either doc at or after it, so it sits inside BOTH
prefixes whenever i <= c - ceil(t*max(n_a, n_b)) + 1; J >= t gives
c >= alpha = ceil(t/(1+t)*(n_a+n_b)), hence at least
alpha - ceil(t*max) + 1 common grams lie in both prefixes.
"""

from __future__ import annotations

import math
import random

from habits_etl_spark.plans.ext_text import (
    _CGRAM_N,
    _CGRAM_THRESHOLD,
    ext_ngram_jaccard_blocked,
)


def _shingles(text: str) -> set[str]:
    return {text[i : i + _CGRAM_N] for i in range(len(text) - _CGRAM_N + 1)}


def _brute_force(docs: list[tuple[int, str, str]]) -> dict[tuple[int, int], float]:
    out = {}
    for i, (ida, srca, ta) in enumerate(docs):
        sa = _shingles(ta)
        if not sa:
            continue
        for idb, srcb, tb in docs[i + 1 :]:
            if srcb != srca:
                continue
            sb = _shingles(tb)
            if not sb:
                continue
            inter = len(sa & sb)
            jac = inter / (len(sa) + len(sb) - inter)
            if jac >= _CGRAM_THRESHOLD:
                lo, hi = min(ida, idb), max(ida, idb)
                out[(lo, hi)] = round(jac, 4)
    return out


def test_ppjoin_plan_matches_brute_force_on_adversarial_corpus(spark, tmp_path):
    rng = random.Random(13)
    docs = []
    for doc_id in range(80):
        src = f"s{rng.randrange(3)}"
        if docs and rng.random() < 0.4:
            # near-duplicate of an earlier doc: perturb a few characters
            # so Jaccard lands on both sides of the 0.5 threshold
            base = rng.choice(docs)[2]
            chars = list(base)
            for _ in range(rng.randrange(0, max(2, len(chars) // 3))):
                chars[rng.randrange(len(chars))] = rng.choice("ab")
            text = "".join(chars)
        else:
            text = "".join(rng.choice("ab") for _ in range(rng.randrange(5, 30)))
        docs.append((doc_id, src, text))

    expected = _brute_force(docs)
    assert expected, "fixture must contain true pairs to be a real test"

    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(i, t, "xx", s, len(t)) for i, s, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(p)
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ext_ngram_jaccard_blocked(spark, str(tmp_path)).collect()
    }
    assert got == expected


def test_prefix_count_lemma_on_random_set_pairs():
    t_num, t_den = 1, 2
    t = t_num / t_den
    rng = random.Random(99)
    universe = list(range(200))
    checked = 0
    for _ in range(3000):
        na, nb = rng.randrange(2, 40), rng.randrange(2, 40)
        a = set(rng.sample(universe, na))
        # bias toward high overlap so J >= t cases actually occur
        b = set(rng.sample(sorted(a), min(na, rng.randrange(1, na + 1))))
        while len(b) < nb:
            b.add(rng.choice(universe))
        inter = len(a & b)
        jac = inter / (len(a) + len(b) - inter)
        if jac < t:
            continue
        checked += 1
        # any fixed global order works; use the natural one
        sa = sorted(a)
        sb = sorted(b)
        pa_len = len(a) - math.ceil(t * len(a)) + 1
        pb_len = len(b) - math.ceil(t * len(b)) + 1
        both = set(sa[:pa_len]) & set(sb[:pb_len])
        alpha = math.ceil(t / (1 + t) * (len(a) + len(b)))
        k_star = alpha - math.ceil(t * max(len(a), len(b))) + 1
        assert len(both) >= max(1, k_star), (
            f"count lemma violated: |both-prefix common|={len(both)} < "
            f"k*={k_star} (na={len(a)} nb={len(b)} jac={jac:.3f})"
        )
        # first-common-gram position bound
        common = sorted(a & b)
        g1 = common[0]
        pa = sa.index(g1) + 1
        pb = sb.index(g1) + 1
        assert 1 + min(len(a) - pa, len(b) - pb) >= alpha
    assert checked > 100, "not enough J >= t samples to trust the sweep"
