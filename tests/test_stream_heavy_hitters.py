"""Streaming heavy hitters: space-saving guarantees (overestimate-only
within err, hot items guaranteed tracked), bounded state, cross-batch
accumulation."""

from __future__ import annotations

import collections
import os

import pytest
from pyspark.sql import types as T

from habits_etl_spark.streaming.heavy_hitters import (
    _DEFAULT_CAPACITY,
    heavy_hitters_stream,
)

SCHEMA = T.StructType([T.StructField("item", T.StringType())])


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "source": str(tmp_path / "in"),
        "ckpt": str(tmp_path / "ckpt"),
        "out": str(tmp_path / "out"),
    }
    os.makedirs(d["source"])
    return d


def _drain(spark, dirs):
    def fb(df, epoch_id):
        df.write.mode("append").parquet(dirs["out"])

    q = (
        heavy_hitters_stream(spark.readStream.schema(SCHEMA).parquet(dirs["source"]))
        .writeStream.foreachBatch(fb)
        .outputMode("update")
        .option("checkpointLocation", dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _skewed_items(n_noise: int):
    # one very hot item, a warm item, and a long noise tail
    items = ["hot"] * 300 + ["warm"] * 60
    items += [f"noise{i % n_noise}" for i in range(240)]
    return items


def test_space_saving_bounds_and_hot_item(spark, dirs):
    items = _skewed_items(n_noise=120)
    truth = collections.Counter(items)
    spark.createDataFrame([(i,) for i in items], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(dirs["source"])
    _drain(spark, dirs)

    # last summary per (shard, item): the sketch's current belief
    rows = spark.read.parquet(dirs["out"]).collect()
    est = {r.item: (r.est_count, r.max_err) for r in rows}

    assert "hot" in est and "warm" in est  # freq >> N/capacity => tracked
    for item, (c, e) in est.items():
        true = truth[item]
        assert c >= true or item not in truth  # overestimate-only
        assert c - e <= true  # est - err lower-bounds the truth
    assert est["hot"][0] >= 300
    # per-shard state is bounded by the sketch capacity
    per_shard = collections.Counter(r.shard for r in rows)
    assert max(per_shard.values()) <= _DEFAULT_CAPACITY


def test_counts_accumulate_across_micro_batches(spark, dirs):
    spark.createDataFrame([("hot",)] * 50, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(dirs["source"])
    _drain(spark, dirs)
    spark.createDataFrame([("hot",)] * 70, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(dirs["source"])
    _drain(spark, dirs)  # restarts from the checkpoint: state carries over

    rows = [r for r in spark.read.parquet(dirs["out"]).collect() if r.item == "hot"]
    assert max(r.est_count for r in rows) == 120


def test_stream_heavy_hitters_e2e_exact_regime(spark):
    """The registered oracle-gated e2e query: with capacity above the
    distinct item count the sketch never evicts, so the latest summaries
    must be the exact per-item frequencies with zero error."""
    import os

    from habits_etl_spark.plans.common import t as load
    from habits_etl_spark.plans.streaming_e2e import stream_heavy_hitters_e2e

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    got = {
        r.item: (r.est_count, r.max_err)
        for r in stream_heavy_hitters_e2e(spark, sf_dir).collect()
    }
    want = {
        str(r.user_id): (r["count"], 0)
        for r in load(spark, sf_dir, "events").groupBy("user_id").count().collect()
    }
    assert got == want
