"""Source/sink format breadth: JSONL and ORC round-trips, driver-visible.

The reference ingests exactly one tabular format (the wide sheet,
etl/etl_habits.py:44) and serves from Postgres; a Spark-first engine is
expected to speak the lake formats interchangeably. These two queries
prove the non-parquet paths end-to-end — distributed write, schema'd
read-back, then an aggregate whose oracle runs on the ORIGINAL parquet:
the round-trip passes the hash gate only if the format conversion was
lossless (strings incl. unicode, bigints, micros-precision timestamps,
doubles).

Scale: both writers/readers are ordinary distributed jobs (one file per
partition, no driver funnel); only the |groups|-row final aggregate is
collected so the temp directory can be cleaned up deterministically
(same lifecycle pattern as plans/manifest_e2e.py).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from habits_etl_spark.plans.common import query, sql_dsum, t


def _finish(spark, out, tmp):
    """Materialize the small result before removing the temp files it
    still references, then hand back an in-memory DataFrame."""
    try:
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "src_jsonl_roundtrip",
    """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(sum(length(text)) AS BIGINT) AS sum_text_len
    FROM documents GROUP BY 1 ORDER BY 1
    """,
)
def src_jsonl_roundtrip(spark, sf_dir):
    """documents -> JSON Lines on disk -> schema'd read-back -> per-lang
    aggregate. JSONL is the lingua franca of text-corpus interchange
    (every public pretraining dump ships as *.jsonl.gz); the read uses
    an EXPLICIT schema — never inference, which at 100 TB would add a
    full pre-scan and can mistype sparse columns."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    tmp = tempfile.mkdtemp(prefix="jsonl_e2e_")
    path = os.path.join(tmp, "documents_jsonl")
    t(spark, sf_dir, "documents").write.mode("overwrite").json(path)
    back = spark.read.schema(schema).json(path)
    out = (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.sum(F.length("text")).cast("bigint").alias("sum_text_len"),
        )
        .orderBy("lang")
    )
    return _finish(spark, out, tmp)


@query(
    "src_orc_roundtrip",
    f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           {sql_dsum("value")} AS sum_value,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS min_ts_s,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS max_ts_s
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def src_orc_roundtrip(spark, sf_dir):
    """events -> ORC on disk -> read-back -> per-type aggregate with
    exact decimal value sums and micros-precision timestamp extrema.
    ORC is Spark's second built-in columnar format (Hive lineage); the
    timestamp extrema make the hash gate sensitive to any precision
    loss in the conversion."""
    tmp = tempfile.mkdtemp(prefix="orc_e2e_")
    path = os.path.join(tmp, "events_orc")
    t(spark, sf_dir, "events").write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    out = (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
            ).alias("sum_value"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("min_ts_s"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("max_ts_s"),
        )
        .orderBy("event_type")
    )
    return _finish(spark, out, tmp)
