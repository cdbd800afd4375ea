"""Streaming -> snapshot-manifest sink (sinks/manifest.py streaming
bridge): exactly-once micro-batch appends across runs and across replayed
batches (the foreachBatch at-least-once contract upgraded via the
batch-id stamped atomically into the manifest commit)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from habits_etl_spark.sinks import manifest as M

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ]
)


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "source": str(tmp_path / "incoming"),
        "table": str(tmp_path / "snap_table"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(d["source"])
    return d


def _write_batch(dirs, name, rows):
    with open(os.path.join(dirs["source"], name), "w") as f:
        for k, v in rows:
            f.write(json.dumps({"k": k, "v": v}) + "\n")


def _run_once(spark, dirs):
    stream = spark.readStream.schema(SCHEMA).json(dirs["source"])
    q = M.manifest_stream_sink(stream, dirs["table"], dirs["ckpt"])
    q.awaitTermination(120)


def _keys(spark, dirs):
    return sorted(r.k for r in M.read_snapshot(spark, dirs["table"]).collect())


def test_stream_appends_exactly_once_across_runs(spark, dirs):
    _write_batch(dirs, "b1.json", [(1, 1.0), (2, 2.0)])
    _run_once(spark, dirs)
    assert _keys(spark, dirs) == [1, 2]

    # second availableNow run over the same checkpoint: only NEW files land
    _write_batch(dirs, "b2.json", [(3, 3.0)])
    _run_once(spark, dirs)
    assert _keys(spark, dirs) == [1, 2, 3]

    # a third run with no new input commits nothing (no doubled rows,
    # no new manifest version)
    v_before = M.current_manifest(dirs["table"])["version"]
    _run_once(spark, dirs)
    assert _keys(spark, dirs) == [1, 2, 3]
    assert M.current_manifest(dirs["table"])["version"] == v_before


def test_replayed_batch_is_noop(spark, dirs):
    """Crash-replay simulation: foreachBatch re-delivers a batch id whose
    data already committed (crash AFTER the manifest commit, BEFORE the
    streaming offset log recorded it). The sink must refuse the replay."""
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], SCHEMA)
    assert M.append_snapshot_batch(spark, df, dirs["table"], batch_id=0) is not None
    # replay of batch 0 (and any earlier id): no-op, same snapshot
    assert M.append_snapshot_batch(spark, df, dirs["table"], batch_id=0) is None
    assert _keys(spark, dirs) == [1, 2]
    # the next real batch proceeds
    df2 = spark.createDataFrame([(3, 3.0)], SCHEMA)
    assert M.append_snapshot_batch(spark, df2, dirs["table"], batch_id=1) is not None
    assert _keys(spark, dirs) == [1, 2, 3]
    m = M.current_manifest(dirs["table"])
    assert m["last_batch_id"] == 1


def test_snapshot_reader_isolated_from_stream(spark, dirs):
    """A reader pinned to a pre-stream snapshot is untouched by streaming
    commits landing underneath it."""
    base = spark.range(10).select(F.col("id").alias("k"), F.lit(0.0).alias("v"))
    M.overwrite_snapshot(spark, base, dirs["table"])
    pinned = M.read_snapshot(spark, dirs["table"])

    _write_batch(dirs, "b1.json", [(100, 1.0), (101, 1.0)])
    _run_once(spark, dirs)

    assert sorted(r.k for r in pinned.collect()) == list(range(10))
    assert _keys(spark, dirs) == list(range(10)) + [100, 101]


def test_vacuum_between_stream_batches_keeps_exactly_once(spark, dirs):
    """Vacuuming old versions between micro-batch runs must not disturb
    the batch-id dedup (last_batch_id rides the CURRENT manifest, which
    vacuum always retains)."""
    _write_batch(dirs, "b1.json", [(1, 1.0)])
    _run_once(spark, dirs)
    _write_batch(dirs, "b2.json", [(2, 2.0)])
    _run_once(spark, dirs)
    M.vacuum(dirs["table"], retain_versions=1)
    # restart over the same checkpoint: nothing new -> no commit, no dupes
    _run_once(spark, dirs)
    assert _keys(spark, dirs) == [1, 2]
    _write_batch(dirs, "b3.json", [(3, 3.0)])
    _run_once(spark, dirs)
    assert _keys(spark, dirs) == [1, 2, 3]
