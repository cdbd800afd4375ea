"""applyInPandasWithState streak tracking: state evolves across
micro-batches (and across query restarts, via the checkpoint) without
reprocessing history."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from habits_etl_spark.streaming.stateful import streaks_stream

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_email", T.StringType()),
        T.StructField("habit", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def ev(day, user="a@x.com", habit="workout", value=1.0):
    return (dt.datetime(2024, 1, day, 9), user, habit, float(value))


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
    """One availableNow run (restart-from-checkpoint each time), updates
    appended to parquet stamped with the micro-batch epoch."""

    def fb(df, epoch_id):
        df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(dirs["out"])

    q = (
        streaks_stream(spark.readStream.schema(SCHEMA).parquet(dirs["source"]))
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
        F.row_number().over(
            Window.partitionBy("user_email", "habit").orderBy(F.col("epoch").desc())
        ),
    ).filter(F.col("rn") == 1)
    return {
        (r.user_email, r.habit): (r.current_streak, r.longest_streak)
        for r in latest.collect()
    }


def test_streak_state_across_batches(spark, dirs):
    # batch 1: days 1,2,3 consecutive + a not-done day for another user
    spark.createDataFrame(
        [ev(1), ev(2), ev(3), ev(2, user="b@x.com", value=0.0)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(dirs["source"])
    s = drain(spark, dirs)
    assert s[("a@x.com", "workout")] == (3, 3)
    assert s[("b@x.com", "workout")] == (0, 0)  # value<1 days don't create runs

    # batch 2 (query RESTARTED from checkpoint): day 4 extends the run
    spark.createDataFrame([ev(4)], SCHEMA).coalesce(1).write.mode("append").parquet(
        dirs["source"]
    )
    s = drain(spark, dirs)
    assert s[("a@x.com", "workout")] == (4, 4)

    # batch 3: day 6 = gap -> current resets, longest preserved
    spark.createDataFrame([ev(6)], SCHEMA).coalesce(1).write.mode("append").parquet(
        dirs["source"]
    )
    s = drain(spark, dirs)
    assert s[("a@x.com", "workout")] == (1, 4)
