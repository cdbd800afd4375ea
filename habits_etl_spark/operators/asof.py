"""As-of join (point-in-time lookup) as a composition of built-in ops.

Spark has no native ASOF JOIN. The scalable formulation is the
union-and-carry-forward pattern: tag both sides, union, sort within key by
time, and carry the latest right-side payload forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window. This is
one shuffle on (key) + a window sort — same cost as a sort-merge join, no
range explosion, and it handles 100 TB because state per key is a single
struct.

Tie rule: a right row at exactly the left row's timestamp IS visible
(>= semantics, matching DuckDB/pandas ``merge_asof`` defaults).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    right_ts <= left_ts within the same key. Right side should be unique
    per (keys, right_ts); pass ``tie_col`` to break intra-instant ties
    deterministically (highest wins)."""
    if tie_col:
        w_dedup = Window.partitionBy(*keys, right_ts).orderBy(F.col(tie_col).desc())
        right = (
            right.withColumn("__rn", F.row_number().over(w_dedup))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.lit(0).alias("__is_r"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}"
                                 for c in [right_ts, *payload_cols]) + ">"
        ).alias("__r"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__is_r"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{left.schema[c].dataType.simpleString()}"
                                 for c in left.columns) + ">"
        ).alias("__l"),
        F.struct(F.col(right_ts), *[F.col(c) for c in payload_cols]).alias("__r"),
    )

    unioned = l_tagged.unionByName(r_tagged)
    # Right rows sort before left rows at the same instant => >= visibility.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    out = carried.filter(F.col("__is_r") == 0).select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(f"asof_{c}") for c in [right_ts, *payload_cols]],
    )
    return out
