"""Idempotent sinks: content-hash landing + keyed upsert."""

from habits_etl_spark.sinks.upsert import upsert_keyed  # noqa: F401
from habits_etl_spark.sinks.landing import land_raw, write_events  # noqa: F401
