"""Custom stateful streaming operator: live per-(user, habit) streak
tracking via ``applyInPandasWithState``.

The reference's README motivates the whole system with "real analytics
(indexes, SQL, continuous aggregates, and streaks)" (reference
README.md:5). The batch form is gaps-and-islands (plans/windows.py
win_streaks); this is the **incremental** form: state = (last_day,
current_run, best_run) per key, updated as events arrive — O(1) state per
key, no reprocessing of history. That state shape is exactly what makes
streaks impractical to keep fresh with windowed aggregates and is the
canonical use for arbitrary stateful processing.

Scale: state store is partitioned by the group key across executors;
per-key state is three scalars, so 10^9 users is ~tens of GB of state —
checkpointed incrementally."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "last_day DATE, current_run INT, best_run INT"
OUTPUT_SCHEMA = (
    "user_email STRING, habit STRING, current_streak INT, longest_streak INT"
)


def _update_streaks(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's (day, done) rows into the streak state.

    Rules (match the batch gaps-and-islands semantics for in-order data):
    consecutive 'done' days extend the run; a gap or a not-done day resets
    it. Out-of-order days older than last_day can't retroactively extend a
    closed run without reprocessing — they restart counting from their own
    day (documented divergence of the O(1)-state form; the batch operator
    is the exact one)."""
    if state.exists:
        last_day, current_run, best_run = state.get
    else:
        last_day, current_run, best_run = None, 0, 0

    days = set()
    for pdf in pdfs:
        for _, row in pdf.iterrows():
            if row["value"] is not None and row["value"] >= 1:
                days.add(row["day"])

    for day in sorted(days):
        if last_day is not None and (day - last_day).days == 1:
            current_run += 1
        elif last_day is not None and (day - last_day).days == 0:
            pass  # same-day duplicate
        else:
            current_run = 1
        last_day = day
        best_run = max(best_run, current_run)

    state.update((last_day, current_run, best_run))
    user_email, habit = key
    yield pd.DataFrame(
        {
            "user_email": [user_email],
            "habit": [habit],
            "current_streak": [current_run],
            "longest_streak": [best_run],
        }
    )


def streaks_stream(events_stream):
    """events_stream: streaming DF with (ts, user_email, habit, value).
    Returns the streaming DF of per-key streak updates."""
    from pyspark.sql import functions as F

    keyed = events_stream.select(
        "user_email",
        "habit",
        F.date_trunc("DAY", F.col("ts")).cast("date").alias("day"),
        "value",
    ).groupBy("user_email", "habit")
    return keyed.applyInPandasWithState(
        _update_streaks,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
