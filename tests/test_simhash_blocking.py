"""SimHash-band blocking quality: the blocked op must find the SAME pairs
as an unblocked exact all-pairs scan on the fixture (recall 1.0 — the
pigeonhole guarantee covers Hamming <= bands-1, and the fixture's true
edited-copy near-dups sit well inside it)."""

from __future__ import annotations

from pyspark.sql import functions as F

from habits_etl_spark.plans.common import QUERIES, t
from habits_etl_spark.plans.ext_text import _CGRAM_N, _CGRAM_THRESHOLD


def _exact_all_pairs(spark, sf_dir):
    """Ground truth: unblocked exact char-gram Jaccard over every pair."""
    d = t(spark, sf_dir, "documents").filter(F.length("text") >= _CGRAM_N)
    grams_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length("text") - (_CGRAM_N - 1)),
            lambda i: F.substring(F.col("text"), i, _CGRAM_N),
        )
    )
    arrs = d.select("doc_id", grams_arr.alias("arr")).withColumn("n", F.size("arr"))
    a = arrs.select(
        F.col("doc_id").alias("doc_a"), F.col("arr").alias("arr_a"), F.col("n").alias("na")
    )
    b = arrs.select(
        F.col("doc_id").alias("doc_b"), F.col("arr").alias("arr_b"), F.col("n").alias("nb")
    )
    inter = a.join(b, F.col("doc_a") < F.col("doc_b")).withColumn(
        "n_common", F.size(F.array_intersect("arr_a", "arr_b"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return inter.filter(jac >= _CGRAM_THRESHOLD).select(
        "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
    )


def test_band_blocking_matches_exact_scan(spark, sf_dir):
    blocked = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in QUERIES["ext_ngram_jaccard_simhash_blocked"](spark, sf_dir).collect()
    }
    exact = {(r.doc_a, r.doc_b, r.jaccard) for r in _exact_all_pairs(spark, sf_dir).collect()}
    assert exact, "fixture must contain near-duplicate pairs"
    # Blocking can only REMOVE pairs (candidates are verified exactly);
    # pigeonhole + fixture Hamming distances mean it removes none.
    assert blocked == exact
