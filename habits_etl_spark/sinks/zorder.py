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
global window, no single-reducer sort. ``zorder_by`` buckets uniformly
over [min, max]; ``zorder_by_quantile`` pre-maps each column through
approx-quantile boundaries (broadcast arrays) before interleaving, which
keeps file-level stats tight under heavy key skew — the Morton stage is
shared.
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


def _morton_layout(df: DataFrame, z: Column, drop: list[str]) -> DataFrame:
    """Shared tail: attach the Morton code, range-partition on it (the
    only shuffle — Spark's sampled range partitioner), local sort, strip
    work columns."""
    return (
        df.withColumn("__z", z)
        .drop(*drop)
        .repartitionByRange(df.sparkSession.sparkContext.defaultParallelism, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def zorder_by(df: DataFrame, col_a: str, col_b: str, bits: int = 10) -> DataFrame:
    """Return ``df`` ordered by the Morton code of the two columns'
    bucket indices. Write the result with ``.write.parquet`` (or per
    partition) so row-group min/max stats cover tight ranges of both
    columns.

    Buckets are UNIFORM over [min, max]: correct for evenly spread keys,
    degenerate under heavy skew (a hot range collapses into one bucket,
    so files there cannot discriminate it — use ``zorder_by_quantile``)."""
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
    return _morton_layout(
        df.crossJoin(F.broadcast(bounds)), z, ["__alo", "__ahi", "__blo", "__bhi"]
    )


def _q_bucket(col: str, boundaries: str) -> Column:
    """Bucket index = number of quantile boundaries <= value: an O(n)
    fold over a broadcast array — map-side, no per-row lookup join. With
    n = 2^bits <= 1024 boundaries this is cheap relative to the scan."""
    return F.size(
        F.filter(F.col(boundaries), lambda x: x <= F.col(col))
    ).cast("bigint")


def zorder_by_quantile(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 8,
    accuracy: int = 10_000,
) -> DataFrame:
    """Skew-robust Z-order: each column is pre-mapped through its own
    ``2^bits - 1`` approx-quantile boundaries before Morton interleave,
    so every bucket holds ~equal ROW MASS instead of equal value range.

    Under heavy skew (zipf keys, hot tenants, power-law doc lengths)
    uniform bucketing collapses the hot range into one bucket — files
    covering it span the whole hot region and a point query there scans
    nearly every file. Quantile mapping spends bucket resolution where
    the rows are: hot values get buckets to themselves (ties share one
    bucket — indistinguishable values cannot be split), and file min/max
    stats over the hot range stay tight. Cost: one extra pass computing
    two ``percentile_approx`` sketches (mergeable, map-side partials —
    the same aggregate shape as any other agg) broadcast back as two
    arrays; the Morton stage is unchanged."""
    n = 1 << bits
    probs = [i / n for i in range(1, n)]
    bounds = df.agg(
        F.percentile_approx(col_a, probs, F.lit(accuracy)).alias("__qa"),
        F.percentile_approx(col_b, probs, F.lit(accuracy)).alias("__qb"),
    )
    z = _interleave_bits(_q_bucket(col_a, "__qa"), _q_bucket(col_b, "__qb"), bits)
    return _morton_layout(df.crossJoin(F.broadcast(bounds)), z, ["__qa", "__qb"])
