"""Streaming end-to-end, oracle-gated: drive the foreachBatch continuous
rollup (streaming/rollup.py — the Structured Streaming twin of the
reference's Timescale continuous aggregate + 15-minute refresh policy,
sql/001_schema.sql:31-46 and the K8s CronJob cadence, README.md:169-207)
through REAL micro-batch file drops, then read the materialized rollup
table back and gate it against the batch SQL the view declares.

This is the data-level check the 11 streaming modules' pytest
batch-equivalence tests cannot give: the final parquet state after
  - three cron-style runs (availableNow trigger, ONE shared checkpoint,
    so runs 2 and 3 are genuine restarts that must skip already-processed
    files),
  - late data (drops are event_id-interleaved, so every run after the
    first delivers rows into day buckets the rollup already
    materialized — the refresh must re-fold them, Timescale's
    invalidation-window recompute),
must equal the one-shot batch aggregate over all events. Oracle = that
batch SQL, same shape as agg_daily_rollup.

Scale: the staged pipeline is the production shape — file-source
streaming reads scale with new-file count per trigger; the fact table is
appended partitioned by event_date and each refresh both READS (partition
filter on event_date → PartitionFilters in the scan, asserted in
tests/test_streaming.py) and WRITES (dynamic partition overwrite) only
the day buckets named by the incoming batch, so refresh cost is
O(late-data spread), not O(history). Driver state per micro-batch is the distinct-day list —
bounded by the batch's calendar span, never by row count. The staging
directory is scoped per (session, sf_dir) and wiped at the next
invocation, mirroring the managed_cache one-at-a-time convention.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from habits_etl_spark.plans.common import query, sql_davg, sql_dsum, t

# streaming.rollup imports plans.common for its decimal-exact aggregates, so
# importing it at module scope from inside the plans package would be
# circular; the query body imports it lazily instead.

_N_DROPS = 3


def _scoped_workdir(spark, sf_dir: str) -> str:
    """Fresh per-(session, sf_dir) staging root; the previous invocation's
    tree is removed so repeated runs (bench reps, driver retries) never
    accumulate state or replay a stale checkpoint."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    base = os.path.join(
        tempfile.gettempdir(),
        "habits_etl_stream_e2e",
        spark.sparkContext.applicationId,
        tag,
    )
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    return base


@query(
    "stream_rollup_e2e",
    f"""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           user_id, event_type,
           count(*) FILTER (WHERE value >= 1) AS count_done,
           {sql_davg('value')} AS avg_value,
           {sql_dsum("CASE WHEN event_type = 'purchase' THEN value END")} AS sum_purchase
    FROM events GROUP BY 1, 2, 3
    """,
)
def stream_rollup_e2e(spark, sf_dir):
    """Continuously-maintained daily rollup, end to end: stage the events
    table as {_N_DROPS} interleaved micro-batch file drops into a watched
    source directory, run the maintenance stream once per drop
    (availableNow = the reference's cron run) against one shared
    checkpoint, and return the final materialized rollup read back from
    parquet. Every run after the first is both a RESTART (checkpoint
    must dedup the already-seen files) and a LATE-DATA delivery (the
    event_id % {_N_DROPS} interleave puts rows of every day in every
    drop, so materialized buckets must be re-folded, not appended).

    The oracle is the batch rollup SQL over the whole table — the
    streaming pipeline is correct iff the incremental materialization
    converges to it exactly (counts, decimal-exact avg/sum)."""
    from habits_etl_spark.streaming.rollup import start_continuous_rollup

    base = _scoped_workdir(spark, sf_dir)
    src = os.path.join(base, "incoming")
    fact = os.path.join(base, "events_fact")
    rollup = os.path.join(base, "rollup")
    ckpt = os.path.join(base, "checkpoint")
    os.makedirs(src, exist_ok=True)

    staged = t(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        F.col("user_id").alias("user_email"),
        F.col("event_type").alias("habit"),
        "value",
    )
    source_schema = staged.drop("event_id").schema

    for i in range(_N_DROPS):
        # new part files appended into the watched dir = one cron drop
        (
            staged.filter(F.pmod(F.col("event_id"), F.lit(_N_DROPS)) == i)
            .drop("event_id")
            .coalesce(2)
            .write.mode("append")
            .parquet(src)
        )
        q = start_continuous_rollup(
            spark,
            source_dir=src,
            source_schema=source_schema,
            events_path=fact,
            rollup_path=rollup,
            checkpoint_path=ckpt,
            # testdata lives in 2024; keep it inside the refresh horizon
            backfill_horizon_days=36500,
            trigger={"availableNow": True},
            meditation_habit="purchase",
        )
        q.awaitTermination()

    return spark.read.parquet(rollup).select(
        F.date_format(F.col("day").cast("date"), "yyyy-MM-dd").alias("day"),
        F.col("user_email").alias("user_id"),
        F.col("habit").alias("event_type"),
        "count_done",
        "avg_value",
        F.col("sum_meditation").alias("sum_purchase"),
    )
