"""Stream-stream interval join semantics: facts inside the horizon join,
facts outside it or without context are dropped (inner), and the
pipeline runs as a real two-stream streaming query."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from habits_etl_spark.streaming.join import interval_enrichment_join

FACT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
    ]
)
CTX_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("assigned_at", T.TimestampType()),
        T.StructField("variant", T.StringType()),
    ]
)


def _write(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture()
def dirs(tmp_path):
    return {
        "facts": str(tmp_path / "facts"),
        "ctx": str(tmp_path / "ctx"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def test_interval_join_attributes_within_horizon(spark, dirs):
    _write(
        dirs["ctx"],
        "a1.json",
        [{"user_id": 1, "assigned_at": "2024-01-10T10:00:00", "variant": "B"}],
    )
    _write(
        dirs["facts"],
        "e1.json",
        [
            # 30 min after assignment: inside 1h horizon -> joins
            {"user_id": 1, "ts": "2024-01-10T10:30:00", "event_type": "click"},
            # 90 min after: outside horizon -> dropped
            {"user_id": 1, "ts": "2024-01-10T11:30:00", "event_type": "click"},
            # no assignment for this user -> dropped (inner)
            {"user_id": 2, "ts": "2024-01-10T10:15:00", "event_type": "view"},
        ],
    )
    facts = spark.readStream.schema(FACT_SCHEMA).json(dirs["facts"])
    ctx = spark.readStream.schema(CTX_SCHEMA).json(dirs["ctx"])
    joined = interval_enrichment_join(
        facts,
        ctx,
        key="user_id",
        fact_ts="ts",
        context_ts="assigned_at",
        fact_delay="10 minutes",
        context_delay="2 hours",
        horizon="1 hour",
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", dirs["out"])
        .option("checkpointLocation", dirs["ckpt"])
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [
        (r.user_id, str(r.ts), r.event_type, r.variant)
        for r in spark.read.parquet(dirs["out"]).collect()
    ]
    assert rows == [(1, "2024-01-10 10:30:00", "click", "B")]


def test_stream_interval_join_e2e_matches_batch_join(spark):
    """The registered oracle-gated e2e query: interleaved two-sided drops
    over one shared checkpoint must emit exactly the batch interval-join
    pair set (each pair once, cross-drop pairs out of restored state)."""
    import os

    from pyspark.sql import functions as F

    from habits_etl_spark.plans.common import t as load
    from habits_etl_spark.plans.streaming_e2e import (
        _IJ_HORIZON_H,
        stream_interval_join_e2e,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    got = stream_interval_join_e2e(spark, sf_dir).select("ctx_id", "fact_id")
    ev = load(spark, sf_dir, "events")
    f, c = ev.alias("f"), ev.alias("c")
    want = f.join(
        c,
        (F.col("f.user_id") == F.col("c.user_id"))
        & (F.col("c.event_type") == "signup")
        & (F.col("f.event_type") == "purchase")
        & (F.col("f.ts") >= F.col("c.ts"))
        & (F.col("f.ts") < F.col("c.ts") + F.expr(f"INTERVAL {_IJ_HORIZON_H} HOURS")),
    ).select(F.col("c.event_id").alias("ctx_id"), F.col("f.event_id").alias("fact_id"))
    assert got.count() == want.count()
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
