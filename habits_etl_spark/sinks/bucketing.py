"""Bucketed tables for shuffle-free co-located joins (SURVEY §2.1
storage layout / pyspark guide 'Partitioning & shuffle').

At 100 TB the lineitem<->orders class of join dominates; bucketing both
sides on the join key at write time means every subsequent join reads
co-located buckets and skips the exchange entirely — the Spark equivalent
of the reference's clustered index access path. Requires saveAsTable (the
bucket metadata lives in the session catalog)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    sort_within: bool = True,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_within:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Spark plans a SortMergeJoin with NO Exchange on either
    side (asserted in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
