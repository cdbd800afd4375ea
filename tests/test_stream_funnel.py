"""Streaming funnel: per-user stage state advances across micro-batches
(and query restarts), respects strict order and the per-step window, and
agrees with the batch operator on in-order input."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from habits_etl_spark.streaming.funnel import funnel_stream

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def ev(minutes, user, event_type):
    return (_T0 + dt.timedelta(minutes=minutes), user, event_type)


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "source": str(tmp_path / "in"),
        "ckpt": str(tmp_path / "ckpt"),
        "out": str(tmp_path / "out"),
    }
    os.makedirs(d["source"])
    return d


def drain(spark, dirs):
    def fb(df, epoch_id):
        df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(dirs["out"])

    q = (
        funnel_stream(spark.readStream.schema(SCHEMA).parquet(dirs["source"]))
        .writeStream.foreachBatch(fb)
        .outputMode("update")
        .option("checkpointLocation", dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(dirs["out"])
    latest = out.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("user_id").orderBy(F.col("epoch").desc())),
    ).filter(F.col("rn") == 1)
    return {r.user_id: (r.stage, r.converted) for r in latest.collect()}


def test_funnel_state_across_batches(spark, dirs):
    # batch 1: u1 signs up; u2 signup+click in order; u3 clicks with no
    # signup (must stay at 0); u4 signup then click AFTER the 12h window
    spark.createDataFrame(
        [
            ev(0, 1, "signup"),
            ev(0, 2, "signup"),
            ev(5, 2, "click"),
            ev(1, 3, "click"),
            ev(0, 4, "signup"),
            ev(13 * 60, 4, "click"),
        ],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(dirs["source"])
    s = drain(spark, dirs)
    assert s[1] == (1, False)
    assert s[2] == (2, False)
    assert s[3] == (0, False)
    assert s[4] == (1, False)  # out-of-window click does not advance

    # batch 2 (restart from checkpoint): u1 clicks within window of its
    # stored signup instant; u2 purchases -> fully converted; u3 signs up
    # (starts counting from its own signup)
    spark.createDataFrame(
        [ev(30, 1, "click"), ev(10, 2, "purchase"), ev(40, 3, "signup")],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(dirs["source"])
    s = drain(spark, dirs)
    assert s[1] == (2, False)
    assert s[2] == (3, True)
    assert s[3] == (1, False)


def test_funnel_matches_batch_on_in_order_input(spark, dirs, sf_dir):
    """On a single in-order batch of the real fixture, streaming state must
    land every user at the same stage as the batch operator."""
    from habits_etl_spark.plans.analytics import funnel_stages
    from habits_etl_spark.plans.common import t as load

    e = load(spark, sf_dir, "events")
    e.select("ts", "user_id", "event_type").orderBy("ts").coalesce(1).write.mode(
        "append"
    ).parquet(dirs["source"])
    s = drain(spark, dirs)
    frames = funnel_stages(e)
    batch_stage = {}
    for k, f in enumerate(frames, start=1):
        for r in f.collect():
            batch_stage[r.user_id] = max(batch_stage.get(r.user_id, 0), k)
    for user, (stage, _) in s.items():
        assert batch_stage.get(user, 0) == stage, user


def test_stream_funnel_e2e_query_matches_batch(spark, sf_dir):
    """The registered oracle-gated e2e query: three time-contiguous drops
    over one shared checkpoint must land every user at the exact batch
    funnel stage (fold composition over a time-ordered split)."""
    from habits_etl_spark.plans.analytics import funnel_stages
    from habits_etl_spark.plans.common import t as load
    from habits_etl_spark.plans.streaming_e2e import stream_funnel_e2e

    got = {
        r.user_id: (r.stage, r.converted)
        for r in stream_funnel_e2e(spark, sf_dir).collect()
    }
    batch_stage: dict = {}
    for k, f in enumerate(funnel_stages(load(spark, sf_dir, "events")), start=1):
        for r in f.collect():
            batch_stage[r.user_id] = max(batch_stage.get(r.user_id, 0), k)
    n_users = load(spark, sf_dir, "events").select("user_id").distinct().count()
    assert len(got) == n_users  # every user emits a final state, stage-0 included
    for user, (stage, converted) in got.items():
        assert batch_stage.get(user, 0) == stage, user
        assert converted == (stage >= 3), user
