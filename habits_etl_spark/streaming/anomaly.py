"""Custom stateful streaming operator: per-key z-score anomaly detection
with Welford running moments (``applyInPandasWithState``).

The metrics-monitoring primitive a serving pipeline runs next to the
rollups: for every (user, value) event, score it against the user's OWN
history — z = (x - mean) / std of all previously-seen values — and emit
the rows whose |z| exceeds a threshold. Welford's online algorithm keeps
the running (n, mean, M2) exactly, so state per key is three scalars:
bounded regardless of stream length, incremental, and mergeable with the
checkpoint/RocksDB state store like the other stateful ops here
(streaming/heavy_hitters.py, funnel.py, retention.py).

Ordering contract: within a micro-batch each group's rows are processed
in event-time order (the update function sorts its batch); across
batches, arrival order IS processing order — the standard stateful-
streaming semantics (a watermark upstream bounds how out-of-order the
feed can be). Each value is scored against state BEFORE it updates the
state, so a level shift is flagged on its first row, not absorbed first.

Scale: state is hash-partitioned by key across executors; each update
touches one group; output mode append emits only anomalies, so the sink
sees the exception stream, not the firehose.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n LONG, mean DOUBLE, m2 DOUBLE"
OUTPUT_SCHEMA = (
    "user_id LONG, event_id LONG, ts TIMESTAMP, value DOUBLE, "
    "z DOUBLE, n_history LONG"
)

_DEFAULT_THRESHOLD = 3.0
_DEFAULT_MIN_N = 5  # score only once the key has this much history


def _make_update(threshold: float, min_n: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        (user_id,) = key
        out: list[tuple] = []
        # A large group arrives as MULTIPLE Arrow chunks; sorting each
        # chunk alone would only be piecewise-ordered, so concatenate
        # first — the docstring's "event-time order within the batch" is
        # a whole-batch contract (the group's rows are already
        # materialized in state-store memory at this point, so the
        # concat does not change the operator's memory bound).
        whole = pd.concat(list(pdfs), ignore_index=True)
        for pdf in (whole.sort_values(["ts", "event_id"]),):
            for ev, ts, x in zip(pdf["event_id"], pdf["ts"], pdf["value"]):
                if x is None or (isinstance(x, float) and math.isnan(x)):
                    continue
                # score against history BEFORE updating with this value
                if n >= min_n:
                    var = m2 / (n - 1)
                    if var > 0:
                        z = (x - mean) / math.sqrt(var)
                        if abs(z) > threshold:
                            out.append(
                                (int(user_id), int(ev), ts, float(x), float(z), int(n))
                            )
                # Welford update
                n += 1
                delta = x - mean
                mean += delta / n
                m2 += delta * (x - mean)
        state.update((int(n), float(mean), float(m2)))
        yield pd.DataFrame(
            out, columns=["user_id", "event_id", "ts", "value", "z", "n_history"]
        )

    return update


def zscore_anomaly_stream(
    events_stream,
    key_col: str = "user_id",
    value_col: str = "value",
    threshold: float = _DEFAULT_THRESHOLD,
    min_n: int = _DEFAULT_MIN_N,
):
    """events_stream: streaming DF with (user_id, event_id, ts, value).
    Returns the append-mode stream of anomalous rows with their z-score
    and the history size the score was computed against."""
    return (
        events_stream.select(
            F.col(key_col).cast("long").alias("user_id"),
            F.col("event_id").cast("long"),
            F.col("ts"),
            F.col(value_col).cast("double").alias("value"),
        )
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update(threshold, min_n),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
