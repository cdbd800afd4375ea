"""Compaction: oversized partitions shrink to the byte-justified file
count, content is byte-for-byte preserved, right-sized partitions are
left untouched."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from habits_etl_spark.sinks.compact import compact_table, partition_file_stats


def _write_fragmented(spark, path, day, n_files, rows_per_file):
    for i in range(n_files):
        (
            spark.range(rows_per_file)
            .select(
                (F.col("id") + i * rows_per_file).alias("v"),
                F.lit(day).alias("day"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(path)
        )


def test_compact_rewrites_fragmented_partitions_only(spark, tmp_path):
    base = str(tmp_path / "events")
    # day=a: 12 tiny files -> should compact to 1; day=b: 1 file -> untouched
    for i in range(12):
        spark.createDataFrame([(i, "a")], "v long, day string").write.partitionBy(
            "day"
        ).mode("append").parquet(base)
    spark.createDataFrame([(99, "b")], "v long, day string").write.partitionBy(
        "day"
    ).mode("append").parquet(base)

    before = partition_file_stats(base)
    assert before["day=a"][0] == 12 and before["day=b"][0] == 1
    before_rows = sorted(r.v for r in spark.read.parquet(base).collect())
    b_mtime = os.path.getmtime(os.path.join(base, "day=b"))

    rewritten = compact_table(spark, base, target_bytes=1 << 30)

    assert rewritten == {"day=a": 1}
    after = partition_file_stats(base)
    assert after["day=a"][0] == 1 and after["day=b"][0] == 1
    assert os.path.getmtime(os.path.join(base, "day=b")) == b_mtime
    assert sorted(r.v for r in spark.read.parquet(base).collect()) == before_rows
