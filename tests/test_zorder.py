"""Z-order layout: files must cover small rectangles of BOTH columns,
where a single-key sort gives the second column full-range spread (no
skipping possible)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from habits_etl_spark.sinks.zorder import zorder_by


def _mean_span(path, col, full_span):
    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        t = pq.read_table(f, columns=[col])
        vals = t.column(col).to_pylist()
        if vals:
            spans.append((max(vals) - min(vals)) / full_span)
    assert len(spans) >= 4, "need several files to compare layouts"
    return sum(spans) / len(spans)


def test_zorder_bounds_both_columns(spark, tmp_path):
    # 128x128 grid: x and y independent and uniform
    side = 128
    grid = (
        spark.range(side * side)
        .select(
            (F.col("id") % side).alias("x"),
            (F.col("id") / side).cast("bigint").alias("y"),
        )
    )
    by_x = str(tmp_path / "by_x")
    by_z = str(tmp_path / "by_z")
    grid.repartitionByRange(8, "x").sortWithinPartitions("x").write.parquet(by_x)
    zorder_by(grid, "x", "y", bits=7).write.parquet(by_z)

    # content identical
    a = spark.read.parquet(by_x)
    b = spark.read.parquet(by_z)
    assert a.count() == b.count() == side * side
    assert a.exceptAll(b).count() == 0

    # x-sorted: each file spans ~all of y; z-ordered: both spans shrink
    full = float(side - 1)
    assert _mean_span(by_x, "y", full) > 0.9
    y_span_z = _mean_span(by_z, "y", full)
    x_span_z = _mean_span(by_z, "x", full)
    assert y_span_z < 0.6, y_span_z
    assert x_span_z < 0.6, x_span_z
