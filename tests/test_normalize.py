"""Unit tests for the wide->long normalization (port + extension of the
reference's tests/test_transform.py, covering its documented gaps:
invalid numbers, invert flag, notes concat, blank-cell skip)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from habits_etl_spark.config import PipelineConfig
from habits_etl_spark.operators.unpivot import normalize_wide_rows

CFG = PipelineConfig.from_dict(
    {
        "date_column": "Report Date",
        "email_column": "Email Address",
        "timezone": "America/Chicago",
        "habits": {
            "Workout": {"id": "workout", "type": "bool"},
            "Junk Food": {"id": "no_junk_food", "type": "bool", "invert": True},
            "Meditation (Number of Minutes)": {"id": "meditation_minutes", "type": "number"},
            "Mood": {"id": "mood_score", "type": "number"},
        },
        "notes_columns": ["Notes", "Extra"],
    }
)

SCHEMA = (
    "`Report Date` string, `Email Address` string, Workout string, "
    "`Junk Food` string, `Meditation (Number of Minutes)` string, "
    "Mood string, Notes string, Extra string"
)


def run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = normalize_wide_rows(df, CFG)
    return {(r.habit): r for r in out.collect()}, out


def full_row(**over):
    base = dict(
        **{
            "Report Date": "08/20/2025",
            "Email Address": "Test@Example.com",
            "Workout": "Yes",
            "Junk Food": "no",
            "Meditation (Number of Minutes)": "25",
            "Mood": "8",
            "Notes": "did intervals",
            "Extra": None,
        }
    )
    base.update(over)
    return Row(**base)


def test_unpivot_row_user_and_date_only(spark):
    # reference tests/test_transform.py:15-29
    events, out = run(spark, [full_row()])
    assert set(events) == {"workout", "no_junk_food", "meditation_minutes", "mood_score"}
    assert {e.user_email for e in events.values()} == {"test@example.com"}
    assert all(e.ts is not None for e in events.values())
    assert [f.name for f in out.schema.fields] == [
        "ts", "user_email", "habit", "value", "notes", "source",
    ]


def test_bool_truthy_and_invert(spark):
    events, _ = run(spark, [full_row(Workout="on", **{"Junk Food": "YES "})])
    assert events["workout"].value == 1.0
    assert events["no_junk_food"].value == 0.0  # invert: truthy junk food -> 0
    events, _ = run(spark, [full_row(Workout="nope", **{"Junk Food": "0"})])
    assert events["workout"].value == 0.0
    assert events["no_junk_food"].value == 1.0


def test_invalid_number_drops_event_not_row(spark):
    events, _ = run(spark, [full_row(Mood="great")])
    assert "mood_score" not in events
    assert "meditation_minutes" in events  # rest of the row survives


def test_blank_cells_skip(spark):
    events, _ = run(spark, [full_row(Workout="   ", Mood="")])
    assert "workout" not in events and "mood_score" not in events
    assert events["meditation_minutes"].value == 25.0


def test_missing_required_fields_drop_row(spark):
    events, _ = run(spark, [full_row(**{"Email Address": None})])
    assert events == {}
    events, _ = run(spark, [full_row(**{"Report Date": ""})])
    assert events == {}


def test_notes_concat_and_null(spark):
    events, _ = run(spark, [full_row(Extra="hi")])
    assert events["workout"].notes == "Notes: did intervals | Extra: hi"
    events, _ = run(spark, [full_row(Notes=None, Extra=None)])
    assert events["workout"].notes is None


def test_unparseable_date_drops_row(spark):
    # intentional strengthening vs reference (which raises)
    events, _ = run(spark, [full_row(**{"Report Date": "  "})])
    assert events == {}
