"""Wave 31: Bloom join pruning, relational CMS, interval overlap join.

The two oracle-gated queries (join_bloom_prune, join_interval_overlap)
get their exactness from the registry gate; these tests pin the
OPERATOR guarantees the oracles can't see:

* Bloom: no false negatives (pruned output is a superset of true
  matches), and the pruning actually prunes (false-positive rate well
  under 1 with the documented sizing).
* CMS: est >= exact for every key (the one-sided error guarantee),
  overcount within the eps*N bound, and partial-merge == direct build
  (mergeability), cell for cell.
* Overlap join: binned plan == naive nested-loop result exactly, each
  pair exactly once, across bin widths (the no-dedup anchor argument).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from habits_etl_spark.operators.bloom import bloom_build, bloom_prune
from habits_etl_spark.operators.cms import cms_build, cms_estimate, cms_merge
from habits_etl_spark.operators.range_join import interval_overlap_join


def test_bloom_no_false_negatives_and_prunes(spark):
    keys = spark.range(0, 500).select((F.col("id") * 7).alias("k"))
    bloom = bloom_build(keys, "k", num_bits=1 << 14, num_hashes=5)
    probe = spark.range(0, 3500).select(F.col("id").alias("k"))
    kept = {r.k for r in bloom_prune(probe, "k", bloom, 1 << 14, 5).collect()}
    inserted = {i * 7 for i in range(500)}
    # no false negatives: every inserted key survives pruning
    assert inserted <= kept
    # and the filter genuinely prunes: 3000 non-members, fp rate < 5%
    false_pos = kept - inserted
    assert len(false_pos) < 150, f"fp rate too high: {len(false_pos)}/3000"


def test_bloom_skips_null_keys(spark):
    keys = spark.createDataFrame([(1,), (None,)], "k bigint")
    bloom = bloom_build(keys, "k", num_bits=1 << 10, num_hashes=3)
    probe = spark.createDataFrame([(1,), (None,), (999999,)], "k bigint")
    kept = [r.k for r in bloom_prune(probe, "k", bloom, 1 << 10, 3).collect()]
    assert 1 in kept and None not in kept


def test_cms_overestimates_within_bound(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_total = e.where(F.col("user_id").isNotNull()).count()
    depth, width = 4, 512
    sketch = cms_merge(cms_build(e, "user_id", depth, width))
    exact = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    est = cms_estimate(sketch, exact, "user_id", depth, width).collect()
    assert est, "no users"
    eps_n = (2.718281828 / width) * n_total
    for r in est:
        assert r.est_n >= r.exact_n, f"undercount for {r.user_id}"
        assert r.est_n - r.exact_n <= max(eps_n, 1), (
            f"overcount {r.est_n - r.exact_n} beyond eps*N={eps_n:.1f}"
        )


def test_cms_partial_merge_equals_direct_build(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    direct = cms_merge(cms_build(e, "user_id"))  # single global build
    partial = cms_merge(cms_build(e, "user_id", group_cols=["event_type"]))
    # cell-for-cell equality: mergeability is exact, not approximate
    diff = direct.join(partial, ["__seed", "__pos"], "full").where(
        (F.coalesce(direct["__count"], F.lit(0)) != F.coalesce(partial["__count"], F.lit(0)))
    )
    assert diff.count() == 0


@pytest.mark.parametrize("bin_days", [1, 7, 45])
def test_interval_overlap_matches_naive(spark, bin_days):
    rows_a = [(i, f"2024-01-{1 + (i * 3) % 25:02d}", 1 + i % 9) for i in range(30)]
    rows_b = [(i, f"2024-01-{1 + (i * 5) % 22:02d}", 1 + i % 6) for i in range(20)]
    mk = ("to_timestamp(d) as s", "timestampadd(DAY, n, to_timestamp(d)) as e")
    a = spark.createDataFrame(rows_a, "a_id int, d string, n int").selectExpr("a_id", *mk)
    b = spark.createDataFrame(rows_b, "b_id int, d string, n int").selectExpr("b_id", *mk)
    a = a.select("a_id", F.col("s").alias("a_s"), F.col("e").alias("a_e"))
    b = b.select("b_id", F.col("s").alias("b_s"), F.col("e").alias("b_e"))
    got = sorted(
        (r.a_id, r.b_id)
        for r in interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", bin_days).collect()
    )
    naive = sorted(
        (r.a_id, r.b_id)
        for r in a.crossJoin(b)
        .where((F.col("a_s") < F.col("b_e")) & (F.col("b_s") < F.col("a_e")))
        .collect()
    )
    assert got == naive  # exact pair set, each pair exactly once


def test_bloom_ab_variants_agree(spark, sf_dir):
    """The bench's bloom_ab section compares wall time and shuffle input
    of two plans that MUST be result-identical — pin that here so the
    A/B can never silently drift into comparing different answers."""
    from habits_etl_spark.plans.sketchjoin import bloom_ab_plain, bloom_ab_pruned

    plain = bloom_ab_plain(spark, sf_dir).collect()
    pruned = bloom_ab_pruned(spark, sf_dir).collect()
    assert plain == pruned
