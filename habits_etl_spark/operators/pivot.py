"""Long -> wide pivot: the inverse of the unpivot normalization.

The reference's INPUT sheet is pivot output — one row per (date, user),
one column per habit (reference etl/transform.py:71-113 unpivots it; the
README's Grafana "one panel per habit" views re-pivot the tidy events).
``pivot_long_rows`` reconstructs that wide shape from the long event
stream with a single hash-aggregate.

Scale notes:
- The value list is REQUIRED. Spark's ``pivot(col)`` without values runs
  an extra distinct-collect job over the full input to discover them —
  at 100 TB that is a complete shuffle+collect before the real job, and
  an unbounded one (a high-cardinality name column silently becomes a
  million-column schema). With an explicit list the pivot compiles to
  ``count_if``-style conditional aggregates inside one exchange, exactly
  like the hand-written CASE WHEN form.
- Width is still schema width: a guard refuses lists beyond
  ``max_width`` columns (wide schemas break downstream consumers long
  before they break Spark).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame

DEFAULT_MAX_WIDTH = 1000


def pivot_long_rows(
    df: DataFrame,
    keys: Sequence[str],
    name_col: str,
    values: Sequence[str],
    agg: Column,
    max_width: int = DEFAULT_MAX_WIDTH,
) -> DataFrame:
    """One output row per distinct ``keys``; one column per entry of
    ``values`` holding ``agg`` over the matching ``name_col`` rows
    (NULL where a (key, value) combination has no rows — same as the
    conditional-aggregation SQL form).

    ``values`` must be the explicit, bounded list of pivot columns; see
    the module docstring for why discovery-by-distinct is refused.
    """
    if not values:
        raise ValueError(
            "pivot_long_rows requires an explicit pivot value list: "
            "implicit discovery runs an unbounded distinct scan first"
        )
    if len(values) > max_width:
        raise ValueError(
            f"pivot width {len(values)} exceeds max_width={max_width}; "
            "a schema this wide should be a map column, not pivot output"
        )
    return df.groupBy(*keys).pivot(name_col, list(values)).agg(agg)
