"""Binned point-in-interval range join.

A pure range predicate (``point BETWEEN start AND end``) with no equi key
gives Spark a BroadcastNestedLoopJoin — O(|points| x |intervals|) and a
single-threaded build at that. The scalable formulation quantizes time
into fixed-width bins: every interval is exploded to the bins it covers,
every point maps to exactly one bin, and the join becomes an EQUI join on
bin with the exact range predicate as a residual filter. Work is then
O(|points| + sum(interval_len / bin_width)) with a normal shuffled hash
join that partitions, AQE-balances, and skew-splits like any other —
the same rewrite Databricks' range-join optimization and KDB's window
joins perform.

Bin width is the only knob: too wide and residual-filter selectivity
drops (more false candidates per bin); too narrow and long intervals
explode into many rows. Set it near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SECONDS_PER_DAY = 86400


def _day_bin(ts: Column, bin_days: int) -> Column:
    """Timestamp -> integer bin id of a fixed ``bin_days``-wide grid."""
    return (F.unix_timestamp(ts) / (SECONDS_PER_DAY * bin_days)).cast("bigint")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_days: int = 7,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_ts <= point_ts < end_ts`` (half-open), without a nested-loop
    plan. Column sets are preserved from both inputs; callers project
    after the join.

    The interval side is exploded via ``sequence(bin(start), bin(end))``
    — intervals spanning k bins emit k rows. Points are mapped to one bin
    each. The equi join on ``__bin`` makes every candidate pair share a
    bin, and the residual range predicate keeps exactly the true
    containments. Duplicate matches are impossible: a (point, interval)
    pair meets only in the point's single bin."""
    binned_points = points.withColumn("__bin", _day_bin(F.col(point_ts), bin_days))
    binned_intervals = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                _day_bin(F.col(start_ts), bin_days), _day_bin(F.col(end_ts), bin_days)
            )
        ),
    )
    # Residual references are qualified through each side's DataFrame:
    # unqualified F.col() would be ambiguous (or silently bind to the
    # wrong side) whenever the two inputs share a column name.
    pt = binned_points[point_ts]
    residual = (pt >= binned_intervals[start_ts]) & (pt < binned_intervals[end_ts])
    return binned_points.join(binned_intervals, "__bin").filter(residual).drop("__bin")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bin_days: int = 7,
) -> DataFrame:
    """Join every ``a`` interval to every ``b`` interval it OVERLAPS
    (half-open: ``a_start < b_end AND b_start < a_end``) without a
    nested-loop plan — the interval x interval generalization of
    :func:`point_in_interval_join`.

    Both sides explode to the bins they cover and meet in an equi join
    on ``__bin``. An overlapping pair shares every bin the overlap
    region touches, which would duplicate it — so the residual keeps a
    pair ONLY in the bin containing the overlap's start
    (``greatest(a_start, b_start)``). Each true pair survives in exactly
    one bin and no dedup shuffle is needed; the pair never meets in a
    non-shared bin, and in the overlap-start bin both exploded rows are
    guaranteed present (each side's interval covers its own start/end
    bins, and the overlap start lies inside both intervals).

    Scale: work is O(sum(len_a/bin) + sum(len_b/bin)) exploded rows into
    one AQE-balanced hash join — candidate pairs are only those sharing
    a time bin, so cost tracks TEMPORAL density (pairs actually near
    each other), not |a| x |b|."""
    a_b = a.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                _day_bin(F.col(a_start), bin_days), _day_bin(F.col(a_end), bin_days)
            )
        ),
    )
    b_b = b.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                _day_bin(F.col(b_start), bin_days), _day_bin(F.col(b_end), bin_days)
            )
        ),
    )
    overlaps = (a_b[a_start] < b_b[b_end]) & (b_b[b_start] < a_b[a_end])
    anchor = F.col("__bin") == _day_bin(
        F.greatest(a_b[a_start], b_b[b_start]), bin_days
    )
    return a_b.join(b_b, "__bin").filter(overlaps & anchor).drop("__bin")
