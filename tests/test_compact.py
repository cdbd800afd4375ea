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


def test_workdirs_invisible_to_readers_and_stats(spark, tmp_path):
    """A reader racing the swap must never see the displaced copy: work
    dirs start with '_' so Spark discovery and partition_file_stats skip
    them (ADVICE r2: the old '<part>.old_<hex>' name read as a partition)."""
    base = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "v long, day string").write.partitionBy(
        "day"
    ).parquet(base)
    os.rename(os.path.join(base, "day=a"), os.path.join(base, "_old_cafe__day~ea"))
    spark.createDataFrame([(2, "a")], "v long, day string").write.partitionBy(
        "day"
    ).mode("append").parquet(base)

    assert list(partition_file_stats(base)) == ["day=a"]
    assert [r.v for r in spark.read.parquet(base).collect()] == [2]


def test_sweep_restores_partition_after_mid_swap_crash(spark, tmp_path):
    """Crash between the two renames (partition missing, old copy in
    _old_*, rewrite in _compact_*): the next compact_table restores the
    old copy and clears both work dirs — no data loss, no leftovers."""
    base = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a"), (2, "a")], "v long, day string"
    ).write.partitionBy("day").parquet(base)
    # simulate the crash window
    os.rename(os.path.join(base, "day=a"), os.path.join(base, "_old_dead__day~ea"))
    spark.createDataFrame([(1, "a"), (2, "a")], "v long, day string").drop(
        "day"
    ).write.parquet(os.path.join(base, "_compact_beef"))

    compact_table(spark, base, target_bytes=1 << 30)

    assert sorted(r.v for r in spark.read.parquet(base).collect()) == [1, 2]
    leftovers = [e for e in os.listdir(base) if e.startswith(("_old_", "_compact_"))]
    assert leftovers == []
