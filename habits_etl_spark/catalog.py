"""Idempotent schema bootstrap — the engine analog of the reference's
``ensure_schema`` (etl/etl_habits.py:19-22 replaying sql/001_schema.sql on
every run).

Parquet has no server-side catalog, so "DDL" here is (a) registering the
warehouse tables as views/tables in the session catalog and (b) asserting
the on-disk schema matches the declared one — both safe to re-run, like
the reference's CREATE TABLE IF NOT EXISTS."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_email", T.StringType(), False),
        T.StructField("habit", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("notes", T.StringType(), True),
        T.StructField("source", T.StringType(), False),
        T.StructField("event_date", T.DateType(), False),
    ]
)

LANDING_SCHEMA = T.StructType(
    [
        T.StructField("row_hash", T.StringType(), False),
        T.StructField("ingested_at", T.TimestampType(), False),
        T.StructField("payload", T.StringType(), False),
    ]
)


class SchemaMismatch(RuntimeError):
    pass


def ensure_schema(spark: SparkSession, warehouse: str) -> None:
    """Register warehouse tables as session views; verify on-disk schemas.

    Safe to re-run (reference 'safe to re-run', sql/001_schema.sql:1)."""
    for name, schema in (("habit_events", EVENTS_SCHEMA), ("habits_raw", LANDING_SCHEMA)):
        path = os.path.join(warehouse, name)
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        declared = {f.name: f.dataType.simpleString() for f in schema.fields}
        actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        type_conflicts = {
            k: (v, actual[k])
            for k, v in declared.items()
            if k in actual and actual[k] != v
        }
        absent = [
            f.name
            for f in schema.fields
            if f.name not in actual and not f.nullable
        ]
        if type_conflicts:
            raise SchemaMismatch(
                f"{name}: on-disk types conflict with declared (declared, actual): "
                f"{type_conflicts}"
            )
        if absent:
            raise SchemaMismatch(
                f"{name}: declared non-nullable column(s) {absent} absent on disk"
            )
        df.createOrReplaceTempView(name)
