"""Custom stateful streaming operator: live cohort-retention tracking via
``applyInPandasWithState``.

The batch form is plans/analytics.py win_retention_cohort (D1/D7 cohort
retention). This is the **incremental** form: state per user is its cohort
day plus a bitmask of which day-offsets it has been active on — O(1) per
key — so "what is cohort X's D1/D7 retention right now" stays fresh as
events arrive, without rescanning history.

Semantics (match the batch operator for in-order data): a user's cohort
day is the day of the EARLIEST event seen so far; being active on
cohort_day + k sets bit k (offsets beyond ``MAX_OFFSET`` are ignored —
the dashboard only reads fixed offsets). A late event earlier than the
recorded cohort day re-anchors the cohort and right-shifts the
already-seen offsets — in ANY batch, so late cohort starts are handled
exactly; what is lost relative to the batch operator is only activity
beyond MAX_OFFSET and pre-shift offsets pushed past it.

Scale: state is (date, bigint) per user, hash-partitioned by user_id and
checkpointed incrementally; RocksDB-state-store compatible. The per-user
updates stream into any downstream per-cohort aggregation (the emitted
rows are update-mode deltas keyed by user).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Bitmask capacity: 62, NOT 63 — bit 63 of a SIGNED int64 state column
# overflows; Spark silently checkpoints the overflow as NULL and the next
# micro-batch crashes on state.get, permanently (the poisoned checkpoint
# fails every restart). D1/D7/D30 dashboards read well below this.
MAX_OFFSET = 62

STATE_SCHEMA = "cohort_day DATE, seen BIGINT"
OUTPUT_SCHEMA = (
    "user_id LONG, cohort_day DATE, d1_active BOOLEAN, d7_active BOOLEAN"
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    cohort_day, seen = state.get if state.exists else (None, 0)
    days = set()
    for pdf in pdfs:
        for _, r in pdf.iterrows():
            days.add(r["ts"].date())
    for day in sorted(days):
        if cohort_day is None or day < cohort_day:
            # re-anchor: shift already-seen offsets right by the gap
            if cohort_day is not None:
                gap = (cohort_day - day).days
                seen = (seen << gap) & ((1 << (MAX_OFFSET + 1)) - 1)
            cohort_day = day
        off = (day - cohort_day).days
        if off <= MAX_OFFSET:
            seen |= 1 << off
    state.update((cohort_day, seen))
    (user_id,) = key
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "cohort_day": [cohort_day],
            "d1_active": [bool(seen >> 1 & 1)],
            "d7_active": [bool(seen >> 7 & 1)],
        }
    )


def retention_stream(events_stream):
    """events_stream: streaming DF with (ts, user_id). Returns the
    streaming DF of per-user (cohort_day, D1/D7 activity) updates."""
    return (
        events_stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
