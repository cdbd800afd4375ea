"""Execution-level shuffle-metrics reader (habits_etl_spark/metrics.py):
the instrument behind the bench's bloom_ab byte story."""

from __future__ import annotations

from pyspark.sql import functions as F

from habits_etl_spark.metrics import _metric_total, run_with_shuffle_metrics


def test_metric_total_parses_plain_and_human_forms():
    assert _metric_total("776") == 776
    assert _metric_total("8,704") == 8704
    assert (
        _metric_total(
            "total (min, med, max (stageId: taskId))\n"
            "20.4 KiB (2.5 KiB, 2.5 KiB, 2.6 KiB (stage 0.0: task 7))"
        )
        == 20.4 * 1024
    )
    assert _metric_total("size total (min, med, max)\n3.0 MiB (1.0 MiB, ...)") == 3 * 1024**2
    assert _metric_total("84.0 B") == 84.0


def test_shuffle_metrics_of_a_groupby(spark):
    df = (
        spark.range(0, 100_000, 1, 8)
        .select((F.col("id") % 97).alias("k"), F.col("id").alias("v"))
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
    )
    m = run_with_shuffle_metrics(spark, df)
    assert m["elapsed_sec"] > 0
    # one exchange on k: 8 map tasks x 97 keys of partials
    assert m["shuffle_records_written"] is not None
    assert 97 <= m["shuffle_records_written"] <= 8 * 97
    assert m["shuffle_bytes_written"] > 0


def test_bloom_prune_reduces_shuffle_bytes_and_records(spark):
    """The A/B's cluster-scale claim, now asserted in measured bytes:
    the Bloom-pruned variant of the pinned merge join must move fewer
    shuffle records AND fewer shuffle bytes than the plain one, even
    though Catalyst already infers the deterministic mod predicate onto
    the fact side of the plain plan (see bloom_ab_plain docstring).

    Pinned to sf0.01, not the sf0.001 unit fixture: the Bloom build's
    own bounded shuffle (~num_bits/64 words) is a fixed cost that can
    exceed the byte savings when the fact table is only 6k rows — the
    operator's contract is amortization at fact scale, so assert where
    the fact side dominates."""
    from habits_etl_spark.plans.sketchjoin import bloom_ab_plain, bloom_ab_pruned

    sf_dir = "/root/testdata/sf0.01"
    plain = run_with_shuffle_metrics(spark, bloom_ab_plain(spark, sf_dir))
    pruned = run_with_shuffle_metrics(spark, bloom_ab_pruned(spark, sf_dir))
    assert plain["shuffle_records_written"] is not None
    assert pruned["shuffle_records_written"] is not None
    assert pruned["shuffle_records_written"] < plain["shuffle_records_written"]
    assert pruned["shuffle_bytes_written"] < plain["shuffle_bytes_written"]
