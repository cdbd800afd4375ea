"""sink_compaction_plan invariants: the planner conserves rows, never
produces more outputs than inputs, bounds each planned output by
target + one straddling file, and actually compacts the fixture's
fragmented hours (non-vacuity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from habits_etl_spark.plans.manifest_e2e import (
    _COMPACT_TARGET_ROWS,
    sink_compaction_plan,
)


def test_compaction_plan_invariants(spark, sf_dir):
    rows = sink_compaction_plan(spark, sf_dir).collect()
    assert rows
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = ev.count()
    assert sum(r.rows for r in rows) == n_events  # row conservation
    max_file = (
        ev.groupBy(F.to_date("ts"), F.hour("ts")).count()
        .agg(F.max("count")).first()[0]
    )
    compacted = 0
    for r in rows:
        assert 1 <= r.output_files <= r.input_files
        assert r.small_inputs <= r.input_files
        # a planned output holds at most target-1 accumulated rows plus
        # the one file that straddles the boundary
        assert r.max_output_rows <= _COMPACT_TARGET_ROWS - 1 + max_file
        compacted += r.input_files - r.output_files
    assert compacted > 0  # the fixture's hourly files do get merged


def test_retention_vacuum_assertions(spark, sf_dir):
    """The e2e vacuum op's probed assertions hold: exactly one manifest
    survives retain=1, v1 is gone from time travel, and the current
    snapshot read is unchanged by the vacuum."""
    from habits_etl_spark.plans.manifest_e2e import sink_retention_vacuum

    rows = sink_retention_vacuum(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.versions_after == 1
        assert r.v1_time_travel_gone is True
        assert r.current_unchanged is True
