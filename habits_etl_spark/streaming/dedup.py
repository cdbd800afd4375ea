"""Streaming deduplication — exactly-once event admission for an
at-least-once ingest feed.

The reference gets idempotent ingest from Postgres
``ON CONFLICT (row_hash) DO NOTHING`` (reference etl/etl_habits.py:38,
sql/001_schema.sql:20-24): replaying a sheet re-inserts nothing. The
streaming analog is ``dropDuplicatesWithinWatermark``: the state store
remembers each key until the event-time watermark passes it, so a
duplicate arriving in ANY later micro-batch inside the lateness horizon
is dropped, while state is bounded by the horizon instead of growing
with history.

Contract:
- duplicates within the watermark horizon: dropped, exactly-once output;
- duplicates older than the watermark: out of contract (state already
  evicted) — size the horizon to the replay window of the upstream
  feed. For full-history replay protection, pair with the batch
  content-hash landing (sinks/landing.py), which this stage feeds.

Scale: state is hash-partitioned by key across executors (RocksDB-
backed in production configs); per-key state is one timestamp. The only
shuffle is the state-store exchange on the dedup keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    event_ts: str,
    watermark: str,
) -> DataFrame:
    """Apply watermarked exactly-once dedup to a streaming DataFrame."""
    return stream.withWatermark(event_ts, watermark).dropDuplicatesWithinWatermark(keys)


def start_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    source_schema: StructType,
    out_path: str,
    checkpoint_path: str,
    keys: list[str],
    event_ts: str = "ts",
    watermark: str = "1 day",
    trigger: dict | None = None,
):
    """File-source ingest -> watermarked dedup -> append parquet sink.

    Restarting with the same checkpoint resumes the state store, so keys
    seen in earlier runs (within the watermark) are still deduplicated —
    the property the tests assert across two availableNow runs."""
    stream = spark.readStream.schema(source_schema).json(source_dir)
    deduped = dedup_stream(stream, keys, event_ts, watermark)
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    return writer.trigger(**(trigger or {"availableNow": True})).start()
