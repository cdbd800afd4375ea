"""Relational operators: unpivot/normalize, streaks, dedup, similarity."""

from habits_etl_spark.operators.unpivot import normalize_wide_rows  # noqa: F401
