"""One-pass approximate equal-frequency binning: the 100 TB shortcut
for the exact distributed ntile (operators/distrank.py).

``percentile_approx`` (Greenwald–Khanna sketch: bounded memory, one
pass, mergeable partials) yields the n-1 cut points; bucket assignment
is then a pure map — ``1 + Σ (value > edge)`` compiles to a codegen
comparison chain with NO shuffle beyond the sketch's partial-aggregate
merge. Relative to the exact two-pass ntile this trades:

* boundary-tie exactness — the exact ntile SPLITS a run of equal
  values across adjacent tiles to equalize counts; the sketch assigns
  every instance of a value to one bucket, so heavily-tied integer
  keys can shift boundary rows by a whole bucket;
* sketch error — rank error is bounded by n_rows / accuracy.

tests/test_rank_twins.py pins this equivalence: each exact consumer's
approx twin must agree with the exact result within the stated
tolerances at sf0.1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["approx_ntile_edges", "with_approx_ntile"]


def approx_ntile_edges(
    df: DataFrame, value: Column | str, n: int, accuracy: int = 10_000
) -> list[float]:
    """The n-1 approximate quantile cut points of ``value`` (a bounded
    driver collect: n-1 doubles)."""
    cexpr = F.col(value) if isinstance(value, str) else value
    probs = [i / n for i in range(1, n)]
    row = df.select(
        F.percentile_approx(
            cexpr.cast("double"), F.lit(probs), F.lit(accuracy)
        ).alias("edges")
    ).first()
    return list(row["edges"]) if row and row["edges"] is not None else []


def with_approx_ntile(
    df: DataFrame,
    value: Column | str,
    n: int,
    out: str = "tile",
    accuracy: int = 10_000,
) -> DataFrame:
    """df + column ``out`` (bigint) ≈ NTILE(n) over ``value`` ASC:
    bucket = 1 + #{edges strictly below the value} — a map-side
    comparison chain over the broadcast cut points."""
    cexpr = (F.col(value) if isinstance(value, str) else value).cast("double")
    edges = approx_ntile_edges(df, value, n, accuracy)
    tile = F.lit(1).cast("bigint")
    for e in edges:
        tile = tile + (cexpr > F.lit(float(e))).cast("bigint")
    return df.withColumn(out, tile)
