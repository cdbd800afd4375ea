"""Mergeable count-min sketch as plain DataFrame algebra.

Spark ships ``count_min_sketch`` as an aggregate, but the sketch comes
back as an opaque binary with no SQL-side query function, so using it
means driver-side deserialization. This operator keeps the whole sketch
RELATIONAL instead: a sketch is just the table

    (__seed, __pos) -> __count      with  __pos = pmod(xxhash64(key, seed), width)

i.e. depth*width counters stored sparsely. That representation buys the
three properties that make CMS useful at 100 TB, each as ordinary
DataFrame ops:

* build is one groupBy over (seed, pos) — bounded output (at most
  depth*width rows) regardless of key cardinality;
* partial sketches MERGE by re-aggregation (sum of counts per cell) —
  the same shape as Spark's own partial aggregates, so per-source /
  per-day sketches roll up without touching raw data again;
* point estimates are a small join: candidate keys x depth seeds ->
  cell lookup -> min over seeds; absent cells mean a true zero count.

Standard CMS guarantees hold (estimate >= true count always; estimate
<= true + eps*N with probability 1-delta for width=ceil(e/eps),
depth=ceil(ln(1/delta))) because this IS textbook CMS — only the
storage is a DataFrame instead of a dense array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seed_col(depth: int):
    return F.explode(F.array(*[F.lit(s) for s in range(1, depth + 1)])).alias(
        "__seed"
    )


def cms_build(
    df: DataFrame, key: str, depth: int = 4, width: int = 512, group_cols=()
) -> DataFrame:
    """Sketch table ``(*group_cols, __seed, __pos, __count)`` counting
    occurrences of ``df[key]``. With ``group_cols``, one partial sketch
    per group (mergeable via :func:`cms_merge`)."""
    gc = list(group_cols)
    pos = F.pmod(F.xxhash64(F.col(key), F.col("__seed")), F.lit(width))
    return (
        df.select(*gc, F.col(key))
        .where(F.col(key).isNotNull())
        .select(*gc, F.col(key), _seed_col(depth))
        .select(*gc, "__seed", pos.alias("__pos"))
        .groupBy(*gc, "__seed", "__pos")
        .agg(F.count(F.lit(1)).alias("__count"))
    )


def cms_merge(sketch: DataFrame) -> DataFrame:
    """Merge partial sketches (any group columns) into one global sketch:
    cell-wise sum — CMS's defining mergeability."""
    return sketch.groupBy("__seed", "__pos").agg(
        F.sum("__count").alias("__count")
    )


def cms_estimate(
    sketch: DataFrame, candidates: DataFrame, key: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Append ``est_n`` (the CMS point estimate, bigint) to ``candidates``
    by probing ``sketch`` (a merged sketch from the SAME depth/width).
    min over seeds of the candidate's cell; a missing cell is count 0
    (the key was never inserted)."""
    pos = F.pmod(F.xxhash64(F.col(key), F.col("__seed")), F.lit(width))
    probes = candidates.select(key).distinct().select(
        F.col(key), _seed_col(depth)
    ).select(F.col(key), "__seed", pos.alias("__pos"))
    looked = probes.join(F.broadcast(sketch), ["__seed", "__pos"], "left").groupBy(key).agg(
        F.min(F.coalesce(F.col("__count"), F.lit(0))).cast("bigint").alias("est_n")
    )
    return candidates.join(looked, key, "left")
