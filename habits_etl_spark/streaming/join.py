"""Stream-stream interval join (event enrichment).

Joining two live streams needs both sides buffered in state until no
matching row can still arrive. An unconstrained stream-stream join would
hold state forever; bounding BOTH sides with watermarks AND the join
condition with a time interval lets Spark evict state as the watermarks
pass — the canonical enrichment shape (Spark SS docs' "ad monetization"
pattern: impressions x clicks within an attribution horizon).

State size is O(rows inside the horizon per key), independent of stream
length — the property that survives an unbounded feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_enrichment_join(
    facts: DataFrame,
    context: DataFrame,
    key: str,
    fact_ts: str,
    context_ts: str,
    fact_delay: str,
    context_delay: str,
    horizon: str,
) -> DataFrame:
    """Attach each context row to the fact rows that occur within
    ``[context_ts, context_ts + horizon)`` for the same ``key``.

    Both inputs may be streaming DataFrames. ``*_delay`` are the
    watermark lateness allowances; ``horizon`` is the attribution window
    (an INTERVAL literal body, e.g. ``"1 hour"``). The half-open upper
    bound keeps a fact at exactly ``context_ts + horizon`` out — the same
    convention as the batch range join (operators/range_join.py)."""
    f = facts.withWatermark(fact_ts, fact_delay)
    c = context.withWatermark(context_ts, context_delay)
    # All condition references qualified through their side (f[...] /
    # c[...]): unqualified F.col() breaks as soon as the two streams share
    # a column name beyond ``key``.
    cond = (
        (f[key] == c[key])
        & (f[fact_ts] >= c[context_ts])
        & (f[fact_ts] < c[context_ts] + F.expr(f"INTERVAL {horizon}"))
    )
    return f.join(c, cond, "inner").drop(c[key])
