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

_Z_SCALE = 1e12  # 12-dp emission grid, stated in pure double arithmetic


def quantize_z(z: float) -> float:
    """Fold a z-score onto a 1e-12 grid using ONLY IEEE double ops that
    both engines state identically: ``round(z * 1e12) / 1e12`` with
    round = C ``std::round`` (half away from zero on the double
    product, sign-preserving) — exactly DuckDB's
    ``round(z * 1000000000000.0) / 1000000000000.0``.

    Why the emitted score is quantized at all: the Welford fold state
    (n, mean, m2) is bit-identical between this operator and the
    recursive-CTE oracle replay, but the final scoring expression
    ``(x - mean) / sqrt(m2 / (n - 1))`` may differ by 1 ulp between
    engines on identical inputs (r11 Hypothesis counterexample
    ``xs=[0.0, 0.0, 1.0, 180.86111876312918]``: Python z
    ``312.6832965422988`` vs DuckDB ``...989`` — the failure class the
    tests/test_pagerank.py decimal-cast comment documents, caught live).

    Why DOUBLE arithmetic and not a DECIMAL cast: DuckDB's
    ``CAST(double AS DECIMAL(28,12))`` switches conversion strategies
    with magnitude (exact half-even near 0, double-product rounding in
    the mid range, inexact scaling above ~1e16), so no single Python
    decimal rule reproduces it everywhere. ``z * 1e12``, ``std::round``
    and ``/ 1e12`` are each single correctly-rounded IEEE ops, so the
    composite is bit-identical across engines for EVERY double —
    verified over 7k adversarial values across 36 orders of magnitude
    including product-level ties and signed zeros
    (tests/test_stream_oracle_parity.py). Both sides quantize, so any
    sub-grid engine divergence in raw z collapses unless raw z straddles
    a grid midpoint by less than 1 ulp of the PRODUCT — and because
    both sides round the identical product double, even that case
    agrees."""
    p = z * _Z_SCALE
    if math.isinf(p):
        return p / _Z_SCALE
    a = abs(p)
    f = float(math.floor(a))
    if a - f >= 0.5:
        f += 1.0
    return math.copysign(f, p) / _Z_SCALE


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
                        z = quantize_z((x - mean) / math.sqrt(var))
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
