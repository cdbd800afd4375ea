"""Snapshot-manifest sink as a REGISTERED, oracle-backed query.

Drives the full transactional write path (sinks/manifest.py — the
engine's Delta-MERGE analog, VERDICT r3 missing-item #3) through the
driver's hash gate: overwrite an initial snapshot, append a batch,
MERGE an upsert batch, then read the final snapshot back THROUGH the
manifest pointer and aggregate it. The DuckDB oracle recomputes the same
final state relationally from the source table — if any commit tore,
doubled, or dropped a file, the per-type row counts and exact value sums
cannot match.

Batches are carved from ``events`` by deterministic predicates:

- base:    user_id % 3 == 0            (overwrite)
- append:  user_id % 3 == 1            (file-level append, no rewrite)
- upsert:  user_id % 6 == 0, value*2, notes NULL
           (updates half the base keys in place: value overwritten,
            notes kept via COALESCE — reference ON CONFLICT semantics)
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from habits_etl_spark.plans.common import query, sql_dsum, t
from habits_etl_spark.sinks import manifest as M


@query(
    "sink_manifest_snapshot",
    f"""
    WITH base AS (
      SELECT user_id, event_type, ts, value, props AS notes
      FROM events WHERE user_id % 3 = 0
    ),
    appended AS (
      SELECT user_id, event_type, ts, value, props AS notes
      FROM events WHERE user_id % 3 = 1
    ),
    incoming AS (
      SELECT user_id, event_type, ts, value * 2 AS value,
             CAST(NULL AS VARCHAR) AS notes
      FROM events WHERE user_id % 6 = 0
    ),
    existing AS (
      SELECT * FROM base UNION ALL SELECT * FROM appended
    ),
    merged AS (
      SELECT coalesce(e.user_id, i.user_id) AS user_id,
             coalesce(e.event_type, i.event_type) AS event_type,
             CASE WHEN i.user_id IS NOT NULL THEN i.value ELSE e.value END AS value,
             coalesce(i.notes, e.notes) AS notes
      FROM existing e
      FULL OUTER JOIN incoming i
        ON e.user_id = i.user_id AND e.event_type = i.event_type AND e.ts = i.ts
    )
    SELECT event_type,
           count(*) AS n_rows,
           count(notes) AS n_notes,
           {sql_dsum('value')} AS sum_value
    FROM merged GROUP BY 1 ORDER BY 1
    """,
)
def sink_manifest_snapshot(spark, sf_dir):
    """overwrite -> append -> upsert through manifest commits, then
    aggregate the final snapshot read via the pointer.

    Scale: each commit writes only its batch's files (append never
    rewrites); the read plans from the manifest file list — no directory
    listing. The aggregate is the standard single hash-agg."""
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "value", F.col("props").alias("notes")
    )
    table = os.path.join(
        tempfile.mkdtemp(prefix="manifest_e2e_"), "events_snapshot"
    )
    try:
        M.overwrite_snapshot(spark, e.filter(F.col("user_id") % 3 == 0), table)
        M.append_snapshot(spark, e.filter(F.col("user_id") % 3 == 1), table)
        incoming = e.filter(F.col("user_id") % 6 == 0).select(
            "user_id",
            "event_type",
            "ts",
            (F.col("value") * 2).alias("value"),
            F.lit(None).cast("string").alias("notes"),
        )
        M.upsert_snapshot(
            spark,
            incoming,
            table,
            keys=["user_id", "event_type", "ts"],
            set_cols=["value"],
            coalesce_cols=["notes"],
        )
        snap = M.read_snapshot(spark, table)
        out = (
            snap.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count("notes").alias("n_notes"),
                F.round(
                    F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
                ).alias("sum_value"),
            )
            .orderBy("event_type")
        )
        # materialize before the temp table is deleted (the returned DF
        # must survive the cleanup below; the result is |event_types| rows)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(os.path.dirname(table), ignore_errors=True)
