"""Streaming DQ circuit-breaker: green batches publish to the manifest
table, red batches quarantine, the audit log records both, replays are
idempotent."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from habits_etl_spark.sinks.manifest import read_snapshot
from habits_etl_spark.streaming.dq_gate import dq_gated_publish, dq_log

_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _write_batch(spark, src_dir, name, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src_dir, name)
    )


def _run(spark, src_dir, table, ckpt):
    stream = spark.readStream.schema(_SCHEMA).parquet(src_dir + "/*")
    q = dq_gated_publish(spark, stream, table, ckpt)
    q.awaitTermination(120)
    assert not q.isActive


def test_gate_publishes_green_quarantines_red(spark, tmp_path):
    import datetime

    ts = lambda s: datetime.datetime.fromisoformat(s)  # noqa: E731
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    good = [
        (1, ts("2024-01-02 10:00:00"), 1, "click", 1.0),
        (2, ts("2024-01-02 11:00:00"), 2, "purchase", 9.5),
    ]
    _write_batch(spark, src, "b0", good)
    _run(spark, src, table, ckpt)

    snap = read_snapshot(spark, table)
    assert {r.event_id for r in snap.collect()} == {1, 2}
    log = dq_log(spark, table)
    assert log.filter(~F.col("rule_passed")).count() == 0

    # second batch: duplicate key + out-of-domain type -> must NOT publish
    bad = [
        (3, ts("2024-01-03 10:00:00"), 1, "bogus", 1.0),
        (3, ts("2024-01-03 11:00:00"), 2, "click", 2.0),
    ]
    _write_batch(spark, src, "b1", bad)
    _run(spark, src, table, ckpt)

    snap2 = read_snapshot(spark, table)
    assert {r.event_id for r in snap2.collect()} == {1, 2}, "red batch leaked"
    log2 = dq_log(spark, table).collect()
    assert {r.published for r in log2} == {True, False}
    failed = {r.rule_id for r in log2 if not r.rule_passed}
    assert failed == {"events_key_unique", "events_type_in_domain"}

    # quarantine holds the red rows for triage
    qdir = os.path.join(table, "_dq_quarantine")
    assert os.path.isdir(qdir)
    quarantined = spark.read.parquet(os.path.join(qdir, "*"))
    assert quarantined.count() == 2


def test_gate_replay_is_idempotent(spark, tmp_path):
    import datetime

    ts = lambda s: datetime.datetime.fromisoformat(s)  # noqa: E731
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")

    _write_batch(spark, src, "b0", [(1, ts("2024-01-02 10:00:00"), 1, "click", 1.0)])
    # two runs with DIFFERENT checkpoints: the second replays batch 0 with
    # the same batch id — the log-based guard must skip the re-publish
    _run(spark, src, table, str(tmp_path / "ckpt1"))
    _run(spark, src, table, str(tmp_path / "ckpt2"))

    assert read_snapshot(spark, table).count() == 1
    assert dq_log(spark, table).count() == 4  # one verdict set, 4 rules


def test_stream_dq_gate_e2e_partitions_and_audits(spark):
    """The registered oracle-gated e2e query: a fully-poisoned drop is
    quarantined, clean drops publish, nothing is lost, and the audit log
    carries every rule's verdict for every gated batch."""
    import os

    from habits_etl_spark.plans.streaming_e2e import (
        _N_DROPS_ILV,
        _workdir_root,
        stream_dq_gate_e2e,
    )
    from habits_etl_spark.streaming.dq_gate import dq_log

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    got = stream_dq_gate_e2e(spark, sf_dir)
    from habits_etl_spark.plans.common import t as load

    total = load(spark, sf_dir, "events").count()
    assert got.count() == total  # nothing lost
    pub = got.filter("published").count()
    quar = got.filter("NOT published").count()
    assert quar == load(spark, sf_dir, "events").filter(
        f"event_id % {_N_DROPS_ILV} = 1"
    ).count()
    assert pub + quar == total
    assert got.filter("NOT published AND value IS NOT NULL").count() == 0

    # the audit log: >= _N_DROPS_ILV gated batches x 4 rules, one
    # `published` flag per batch consistent with the value-complete verdict
    table = os.path.join(
        _workdir_root(),
        "habits_etl_stream_e2e",
        spark.sparkContext.applicationId,
        "dqgate",
    )
    import glob

    [tagdir] = glob.glob(os.path.join(table, "*"))
    log = dq_log(spark, os.path.join(tagdir, "serving")).collect()
    assert len(log) >= 4 * _N_DROPS_ILV and len(log) % 4 == 0
    by_batch: dict = {}
    for r in log:
        by_batch.setdefault(r.batch_id, []).append(r)
    for bid, rows in by_batch.items():
        assert {r.rule_id for r in rows} == {
            "events_value_complete",
            "events_type_in_domain",
            "events_ts_in_range",
            "events_key_unique",
        }
        ok = all(r.rule_passed for r in rows)
        assert all(r.published == ok for r in rows)
