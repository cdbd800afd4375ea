"""Doc-test for examples/habits.yml: the shipped example config must drive
a full ingest over a reference-shaped wide CSV (config parity with the
reference's etl/config/habits.yml)."""

from __future__ import annotations

import os

from habits_etl_spark.config import PipelineConfig
from habits_etl_spark.pipeline import read_events_table, run_ingest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CSV = """Report Date,Email Address,Sleep (Number of hours),Nutrition,Mood,Meditation (Number of Minutes),Workout,Water (How many litres?),Skin Care,How authentically did you live this day?,Notes
08/20/2025,a@x.com,7.5,8,9,20,Yes,2.5,No,7,slept well
08/21/2025,a@x.com,6,7,6,0,No,2,Yes,8,
"""


def test_example_yaml_drives_ingest(spark, tmp_path):
    cfg = PipelineConfig.from_yaml(os.path.join(REPO, "examples", "habits.yml"))
    assert cfg.timezone == "America/Chicago"
    assert cfg.habits["Workout"].type == "bool"
    assert len(cfg.habits) == 8

    src = tmp_path / "export.csv"
    src.write_text(CSV)
    wh = str(tmp_path / "wh")
    run_ingest(spark, str(src), cfg, wh)

    events = read_events_table(spark, wh)
    rows = {(r.user_email, r.habit, str(r.event_date)): r.value for r in events.collect()}
    # 8 habits x 2 days, minus the blank-cell drops (none here: all cells set)
    assert rows[("a@x.com", "sleep_hours", "2025-08-20")] == 7.5
    assert rows[("a@x.com", "workout", "2025-08-20")] == 1.0
    assert rows[("a@x.com", "workout", "2025-08-21")] == 0.0
    assert rows[("a@x.com", "meditation_minutes", "2025-08-21")] == 0.0
    notes = {
        (r.user_email, str(r.event_date)): r.notes
        for r in events.select("user_email", "event_date", "notes").distinct().collect()
    }
    # notes concat prefixes the source column name (reference behavior)
    assert notes[("a@x.com", "2025-08-20")] == "Notes: slept well"
