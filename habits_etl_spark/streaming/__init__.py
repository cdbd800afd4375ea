"""Structured Streaming maintenance of the daily rollup."""

from habits_etl_spark.streaming.rollup import (  # noqa: F401
    batch_daily_rollup,
    refresh_rollup_days,
    start_continuous_rollup,
)
