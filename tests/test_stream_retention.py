"""Streaming retention: cohort anchoring and offset bits evolve across
micro-batches; agreement with the batch operator on in-order input."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from habits_etl_spark.streaming.retention import retention_stream

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
    ]
)


def ev(day, user):
    return (dt.datetime(2024, 1, day, 12), user)


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
        retention_stream(spark.readStream.schema(SCHEMA).parquet(dirs["source"]))
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
    return {
        r.user_id: (str(r.cohort_day), r.d1_active, r.d7_active)
        for r in latest.collect()
    }


def test_retention_state_across_batches(spark, dirs):
    # batch 1: u1 active day 1; u2 active days 1 and 2 (D1)
    spark.createDataFrame(
        [ev(1, 1), ev(1, 2), ev(2, 2)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(dirs["source"])
    s = drain(spark, dirs)
    assert s[1] == ("2024-01-01", False, False)
    assert s[2] == ("2024-01-01", True, False)

    # batch 2 (restart from checkpoint): u1 returns on day 8 (D7);
    # u2 on day 3 (no new flag)
    spark.createDataFrame([ev(8, 1), ev(3, 2)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(dirs["source"])
    s = drain(spark, dirs)
    assert s[1] == ("2024-01-01", False, True)
    assert s[2] == ("2024-01-01", True, False)


def test_offset_at_bitmask_capacity_survives_restart(spark, dirs):
    """Activity at exactly MAX_OFFSET must set the top usable bit WITHOUT
    overflowing the signed int64 state column (bit 63 would checkpoint as
    NULL and poison every subsequent batch), and beyond it must be a
    clean no-op."""
    from habits_etl_spark.streaming.retention import MAX_OFFSET

    assert MAX_OFFSET <= 62  # bit 63 of a signed BIGINT is the sign bit
    spark.createDataFrame([ev(1, 1)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(dirs["source"])
    drain(spark, dirs)
    # day 1 + MAX_OFFSET and one past capacity, in a later batch
    base = dt.datetime(2024, 1, 1, 12)
    spark.createDataFrame(
        [
            (base + dt.timedelta(days=MAX_OFFSET), 1),
            (base + dt.timedelta(days=MAX_OFFSET + 1), 1),
        ],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(dirs["source"])
    s = drain(spark, dirs)
    assert s[1][0] == "2024-01-01"
    # and the state is still usable in yet another batch (no poisoned
    # checkpoint): a day-2 event flips D1
    spark.createDataFrame([ev(2, 1)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(dirs["source"])
    s = drain(spark, dirs)
    assert s[1] == ("2024-01-01", True, False)


def test_retention_matches_batch_on_in_order_input(spark, dirs, sf_dir):
    """Streaming per-user (cohort, D1, D7) must equal the batch operator's
    cohort table when the whole fixture arrives as one in-order batch."""
    from habits_etl_spark.plans.analytics import win_retention_cohort
    from habits_etl_spark.plans.common import t as load

    e = load(spark, sf_dir, "events")
    e.select("ts", "user_id").orderBy("ts").coalesce(1).write.mode("append").parquet(
        dirs["source"]
    )
    s = drain(spark, dirs)
    # roll the streaming per-user flags up to cohort grain and compare
    agg = {}
    for user, (cohort, d1, d7) in s.items():
        n, a1, a7 = agg.get(cohort, (0, 0, 0))
        agg[cohort] = (n + 1, a1 + bool(d1), a7 + bool(d7))
    batch = {
        r.cohort_day: (r.n_users, r.d1_retained, r.d7_retained)
        for r in win_retention_cohort(spark, sf_dir).collect()
    }
    assert agg == batch
