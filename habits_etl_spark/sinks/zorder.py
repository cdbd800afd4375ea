"""Z-order (Morton) layout for multi-column data skipping.

Sorting a table by one key gives perfect row-group pruning on that key
and none on any other. Interleaving the bits of two keys into a Morton
code and sorting by THAT gives both columns locality: each parquet
row-group covers a small rectangle of the (a, b) space, so min/max
row-group stats prune scans filtered on EITHER column — Delta's
OPTIMIZE ZORDER BY, expressed with plain Spark expressions.

Scale shape: one map-side min/max aggregation (4 scalars, broadcast
back), a pure-map Morton expression, then repartitionByRange + local
sort — Spark's sampled range partitioner does the only shuffle. No
global window, no single-reducer sort. Bucketing is uniform over
[min, max]; heavily skewed columns should pre-map through quantile
boundaries (a broadcast lookup) before interleaving — the Morton stage
is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave_bits(a: Column, b: Column, bits: int) -> Column:
    """Morton code of two ``bits``-wide non-negative ints (a even bit
    positions, b odd)."""
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        out = (
            out
            + (abit * F.lit(1 << (2 * i))).cast("bigint")
            + (bbit * F.lit(1 << (2 * i + 1))).cast("bigint")
        )
    return out


def _bucket(col: str, lo: str, hi: str, n: int) -> Column:
    """Uniform bucket 0..n-1 of ``col`` within broadcast [lo, hi]."""
    span = F.col(hi).cast("double") - F.col(lo).cast("double")
    frac = (F.col(col).cast("double") - F.col(lo).cast("double")) / F.when(
        span > 0, span
    ).otherwise(F.lit(1.0))
    return F.least(F.floor(frac * n).cast("bigint"), F.lit(n - 1))


def zorder_by(df: DataFrame, col_a: str, col_b: str, bits: int = 10) -> DataFrame:
    """Return ``df`` ordered by the Morton code of the two columns'
    bucket indices. Write the result with ``.write.parquet`` (or per
    partition) so row-group min/max stats cover tight ranges of both
    columns."""
    n = 1 << bits
    bounds = df.agg(
        F.min(col_a).alias("__alo"),
        F.max(col_a).alias("__ahi"),
        F.min(col_b).alias("__blo"),
        F.max(col_b).alias("__bhi"),
    )
    z = _interleave_bits(
        _bucket(col_a, "__alo", "__ahi", n), _bucket(col_b, "__blo", "__bhi", n), bits
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("__z", z)
        .drop("__alo", "__ahi", "__blo", "__bhi")
        .repartitionByRange(df.sparkSession.sparkContext.defaultParallelism, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
