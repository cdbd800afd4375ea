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
    deterministically (highest wins). ``tie_col`` must be NON-NULL on
    the right side: under the folded ordering below a NULL tie sorts
    LAST within its instant (asc_nulls_last), so the running last()
    would make a NULL-tie row WIN — the reverse of the pre-r14
    row_number(desc) form, where NULLs lost (ADVICE r14). The sole
    in-repo caller (join_asof) ties on non-null event_id.

    Tie handling (r14 optimization, guide §2.4): the old form pre-deduped
    the right side with a row_number window on (keys, right_ts) — a whole
    extra Exchange + sort before the carry-forward window's own Exchange
    on (keys). The dedup FOLDS into the carry-forward ordering instead:
    right rows at the same instant sort by ``tie_col`` ASCENDING, so the
    running ``last(__r, ignorenulls)`` naturally lands on the highest
    tie — identical winner, one shuffle + one window sort total. (Left
    rows carry a NULL tie and still sort after all right rows at the same
    instant via __is_r DESC; their relative order is irrelevant because
    each left row's frame already contains every right row at-or-before
    it and left rows contribute only NULL payloads.)"""
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.lit(0).alias("__is_r"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}"
                                 for c in [right_ts, *payload_cols]) + ">"
        ).alias("__r"),
        F.lit(None).cast(
            right.schema[tie_col].dataType.simpleString() if tie_col else "int"
        ).alias("__tie"),
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
        (F.col(tie_col) if tie_col else F.lit(None).cast("int")).alias("__tie"),
    )

    unioned = l_tagged.unionByName(r_tagged)
    # Right rows sort before left rows at the same instant => >= visibility;
    # among same-instant right rows the highest tie_col sorts LAST, so the
    # running last() picks it (asc_nulls_last keeps a no-tie_col call
    # byte-identical to the old ordering).
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("__t").asc(),
            F.col("__is_r").desc(),
            F.col("__tie").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    out = carried.filter(F.col("__is_r") == 0).select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(f"asof_{c}") for c in [right_ts, *payload_cols]],
    )
    return out
